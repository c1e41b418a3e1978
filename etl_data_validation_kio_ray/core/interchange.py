"""Validation-tool interchange: RuleSpecs ⇄ Great Expectations suite
JSON, RuleSpecs → Soda checks YAML.

The reference's multi-tool harness
(/root/reference/src/app2/etl_validation/runner.py:94-135,
gx_runner.py:150-204, soda_runner.py:57-151) executes one StageCheck
through sql / great_expectations / soda / dbt and normalizes their
outputs. This repo re-expresses the *execution* axis as the DuckDB
second-executor cross-check (pipelines/crosscheck.py, accepted design
decision); this module completes the *interoperability* axis: the
same declarative rules export to the public interchange formats those
tools consume — a Great Expectations expectation-suite JSON document
(round-trippable: ``suite_to_rules(rules_to_suite(r)) == r``) and a
Soda Checks Language YAML string — so a deployment that runs gx or
soda can be driven from, or migrated to, this engine's RuleSpec
registry without hand-translation. Only public, documented formats
are emitted (GE "expectation_suite_name"/"expectations"/kwargs
schema; SodaCL check lines); the third-party libraries themselves are
NOT required or imported.

Mapping (standard expectation types where one exists, engine params
preserved losslessly in ``meta.engine_params``):

- completeness_nulls → expect_column_values_to_not_be_null (×4 cols)
- doc_id_unique      → expect_column_values_to_be_unique
- source_ref         → expect_column_values_to_be_in_set
- row_invariants     → expect_column_values_to_be_between (n_tok)
- schema_types       → expect_column_values_to_be_of_type (×4 cols)
- column_stats / drift_ks_psi / row_gate → engine-specific, exported
  as meta-only expectations (type ``_engine_rule``) so the round-trip
  stays exact.
"""

from __future__ import annotations

from typing import Any

from .specs import RuleSpec

SEQUENCE_COLS = ("doc_id", "tokens", "n_tok", "source")
_COL_TYPES = {
    "doc_id": "str",
    "tokens": "list",
    "n_tok": "int32",
    "source": "str",
}
_STANDARD = {
    "completeness_nulls",
    "doc_id_unique",
    "source_ref",
    "row_invariants",
    "schema_types",
}


def _meta(spec: RuleSpec) -> dict[str, Any]:
    return {
        "rule_id": spec.rule_id,
        "rule_group": spec.rule_group,
        "severity": spec.severity,
        "enabled": spec.enabled,
        "engine_params": dict(spec.params),
    }


def rules_to_suite(
    rules: dict[str, RuleSpec], *, name: str = "tokenized_sequences"
) -> dict[str, Any]:
    """RuleSpecs → Great Expectations expectation-suite document
    (plain dict, json.dumps-able). Deterministic expectation order:
    registry order, then column order."""
    exps: list[dict[str, Any]] = []
    for spec in rules.values():
        m = _meta(spec)
        if spec.rule_id == "completeness_nulls":
            for col in SEQUENCE_COLS:
                exps.append(
                    {
                        "expectation_type": "expect_column_values_to_not_be_null",
                        "kwargs": {
                            "column": col,
                            "mostly": 1.0
                            - float(spec.params.get("max_null_rate", 0.0)),
                        },
                        "meta": m,
                    }
                )
        elif spec.rule_id == "doc_id_unique":
            exps.append(
                {
                    "expectation_type": "expect_column_values_to_be_unique",
                    "kwargs": {"column": spec.params.get("id_col", "doc_id")},
                    "meta": m,
                }
            )
        elif spec.rule_id == "source_ref":
            exps.append(
                {
                    "expectation_type": "expect_column_values_to_be_in_set",
                    "kwargs": {
                        "column": "source",
                        "value_set": list(
                            spec.params.get("allowed_sources") or []
                        ),
                    },
                    "meta": m,
                }
            )
        elif spec.rule_id == "row_invariants":
            exps.append(
                {
                    "expectation_type": "expect_column_values_to_be_between",
                    "kwargs": {
                        "column": "n_tok",
                        "min_value": int(spec.params.get("min_len", 1)),
                        "max_value": int(spec.params.get("max_len", 8192)),
                    },
                    "meta": m,
                }
            )
        elif spec.rule_id == "schema_types":
            for col in SEQUENCE_COLS:
                exps.append(
                    {
                        "expectation_type": "expect_column_values_to_be_of_type",
                        "kwargs": {"column": col, "type_": _COL_TYPES[col]},
                        "meta": m,
                    }
                )
        else:
            # engine-specific rule: meta-only expectation, round-trip
            # carried entirely by meta.engine_params
            exps.append(
                {"expectation_type": "_engine_rule", "kwargs": {}, "meta": m}
            )
    return {
        "expectation_suite_name": name,
        "expectations": exps,
        "meta": {"generated_by": "etl_data_validation_kio_ray"},
    }


def suite_to_rules(suite: dict[str, Any]) -> dict[str, RuleSpec]:
    """Great Expectations suite → RuleSpecs (inverse of
    :func:`rules_to_suite`; also accepts suites hand-written without
    our meta block, inferring the rule from standard expectation
    types)."""
    out: dict[str, RuleSpec] = {}
    for exp in suite.get("expectations", []):
        et = exp.get("expectation_type", "")
        kw = exp.get("kwargs", {})
        m = exp.get("meta") or {}
        if "rule_id" in m:
            rid = m["rule_id"]
            if rid in out:
                continue  # multi-column expansions collapse back to one
            out[rid] = RuleSpec(
                rid,
                m["rule_group"],
                m.get("severity", "error"),
                enabled=bool(m.get("enabled", True)),
                params=dict(m.get("engine_params", {})),
            )
            continue
        # foreign suite without our meta: infer from standard types
        if et == "expect_column_values_to_be_unique":
            out["doc_id_unique"] = RuleSpec(
                "doc_id_unique",
                "uniqueness",
                "error",
                params={"id_col": kw.get("column", "doc_id")},
            )
        elif et == "expect_column_values_to_be_in_set":
            out["source_ref"] = RuleSpec(
                "source_ref",
                "referential",
                "error",
                params={"allowed_sources": list(kw.get("value_set", []))},
            )
        elif et == "expect_column_values_to_be_between" and kw.get(
            "column"
        ) == "n_tok":
            prev = out.get("row_invariants")
            params = dict(prev.params) if prev else {}
            params["min_len"] = int(kw.get("min_value", 1))
            params["max_len"] = int(kw.get("max_value", 8192))
            params.setdefault("vocab_size", 50257)
            out["row_invariants"] = RuleSpec(
                "row_invariants", "invariants", "error", params=params
            )
        elif et == "expect_column_values_to_not_be_null":
            prev = out.get("completeness_nulls")
            rate = 1.0 - float(kw.get("mostly", 1.0))
            params = dict(prev.params) if prev else {}
            params["max_null_rate"] = max(
                rate, float(params.get("max_null_rate", 0.0))
            )
            out["completeness_nulls"] = RuleSpec(
                "completeness_nulls", "completeness", "warning", params=params
            )
        # unknown foreign expectation types are skipped loudly in the
        # caller if the resulting rule set is empty
    if not out:
        raise ValueError(
            "suite_to_rules: no mappable expectations in suite "
            f"{suite.get('expectation_suite_name')!r}"
        )
    return out


def rules_to_soda_checks(
    rules: dict[str, RuleSpec], *, dataset: str = "sequences"
) -> str:
    """RuleSpecs → Soda Checks Language YAML (export only; SodaCL has
    no lossless home for engine params, so the round-trip format is
    the GE suite)."""
    lines: list[str] = [f"checks for {dataset}:"]
    for spec in rules.values():
        if not spec.enabled:
            continue
        if spec.rule_id == "completeness_nulls":
            for col in SEQUENCE_COLS:
                lines.append(f"  - missing_count({col}) = 0")
        elif spec.rule_id == "doc_id_unique":
            col = spec.params.get("id_col", "doc_id")
            lines.append(f"  - duplicate_count({col}) = 0")
        elif spec.rule_id == "source_ref":
            allowed = spec.params.get("allowed_sources") or []
            if allowed:
                vals = ", ".join(allowed)
                lines.append(f"  - invalid_count(source) = 0:")
                lines.append(f"      valid values: [{vals}]")
        elif spec.rule_id == "row_invariants":
            lines.append(
                f"  - min(n_tok) >= {int(spec.params.get('min_len', 1))}"
            )
            lines.append(
                f"  - max(n_tok) <= {int(spec.params.get('max_len', 8192))}"
            )
        elif spec.rule_id == "schema_types":
            lines.append("  - schema:")
            lines.append("      fail:")
            lines.append(
                "        when required column missing: "
                f"[{', '.join(SEQUENCE_COLS)}]"
            )
    return "\n".join(lines) + "\n"
