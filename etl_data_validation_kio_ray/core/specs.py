"""Declarative rule specs.

Mirrors the reference's ``StageCheck`` declarative spec
(/root/reference/src/app2/etl_validation/specs.py:6-14 — name, stage,
rule_group, severity, count_sql, fail_sql) and the YAML enable/disable +
severity override surface
(/root/reference/src/app2/validators/configs/stg_validation.yml:1-205,
loader /root/reference/src/app2/validators/__init__.py:6-27).

Here a rule is a pure description; the kernels live in
``stages.rule_engine``. ``count_sql`` becomes a vectorized violation
mask (its sum is ``rows_failed``); ``fail_sql`` becomes the projected
violation rows ``(rule_id, doc_id, partition, reason)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

SEVERITIES = ("error", "warning", "info")

# Rule groups, mirroring the reference's suites:
#   schema        <- schema_suite/*          (JSON Schema Draft-7 checks)
#   completeness  <- completeness_suite/*    (non-empty, count-vs-len)
#   invariants    <- consistency_suite/* + out-of-range specs.py:72-109
#   stats         <- count_sql scalars + mart aggregates (+ our sketches)
#   uniqueness    <- uniqueness_suite/* + specs.py:110-169 (dup ids)
#   referential   <- dds/referential_suite/* (FK anti-joins)
#   drift         <- experiments/report.py:546-706 (baseline snapshot diff)
GROUPS = (
    "schema",
    "completeness",
    "invariants",
    "stats",
    "uniqueness",
    "referential",
    "drift",
)


@dataclass(frozen=True)
class RuleSpec:
    """One declarative check. ``params`` feed the compiled kernel."""

    rule_id: str
    rule_group: str
    severity: str = "error"
    enabled: bool = True
    params: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.severity not in SEVERITIES:
            raise ValueError(f"severity {self.severity!r} not in {SEVERITIES}")
        if self.rule_group not in GROUPS:
            raise ValueError(f"rule_group {self.rule_group!r} not in {GROUPS}")


def default_rules(
    *,
    min_len: int = 1,
    max_len: int = 8192,
    vocab_size: int = 50257,
    allowed_sources: list[str] | None = None,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.15,
) -> dict[str, RuleSpec]:
    """The standard rule set over the tokenized-sequence table."""
    rules = [
        RuleSpec(
            "row_gate",
            "invariants",
            "warning",
            enabled=False,  # opt-in via YAML/config: set predicates + enabled
            params={"predicates": []},
        ),
        RuleSpec(
            "schema_types",
            "schema",
            "error",
            params={"id_col": "doc_id", "token_col": "tokens"},
        ),
        RuleSpec(
            "completeness_nulls",
            "completeness",
            "warning",
            params={"max_null_rate": 0.0},
        ),
        RuleSpec(
            "row_invariants",
            "invariants",
            "error",
            params={
                "min_len": min_len,
                "max_len": max_len,
                "vocab_size": vocab_size,
            },
        ),
        RuleSpec("column_stats", "stats", "info", params={}),
        RuleSpec("doc_id_unique", "uniqueness", "error", params={"id_col": "doc_id"}),
        RuleSpec(
            "source_ref",
            "referential",
            "error",
            params={"allowed_sources": allowed_sources},
        ),
        RuleSpec(
            "drift_ks_psi",
            "drift",
            "warning",
            params={"psi_threshold": psi_threshold, "ks_threshold": ks_threshold},
        ),
    ]
    return {r.rule_id: r for r in rules}


def load_rules(config: dict[str, Any] | str, base: dict[str, RuleSpec] | None = None) -> dict[str, RuleSpec]:
    """Apply a config mapping (or YAML file path) of per-rule overrides.

    Config shape (mirrors the reference's YAML suites):
        rules:
          row_invariants: {enabled: true, severity: error, params: {max_len: 4096}}
    """
    if isinstance(config, str):
        import yaml

        with open(config) as f:
            config = yaml.safe_load(f) or {}
    base = dict(base if base is not None else default_rules())
    for rule_id, over in (config.get("rules") or {}).items():
        if rule_id not in base:
            raise KeyError(f"unknown rule_id {rule_id!r}")
        spec = base[rule_id]
        params = {**spec.params, **(over.get("params") or {})}
        base[rule_id] = replace(
            spec,
            enabled=over.get("enabled", spec.enabled),
            severity=over.get("severity", spec.severity),
            params=params,
        )
    return base
