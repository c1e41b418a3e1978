"""JSON document source.

The reference ingests per-payload JSON files
(/root/reference/scripts/run_manual_experiments.py:124-131,142-225 →
stg.raw_football_api rows). Our engine's primary input is Parquet
(BASELINE.json input_hint), but the same pipelines accept JSON/JSONL
corpora through this reader: ``ray.data.read_json`` (newline-delimited
or array files) plus a normalizing batch map that enforces the token
table schema so every downstream rule sees identical Arrow types.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("partition", pa.string()),
    ]
)

# reader-recorded per-row schema findings; surfaced by the engine's
# schema_types rule, excluded from completeness (leading "__")
SCHEMA_ERROR_COL = "__schema_error"

def nested_type_errors(
    actual: pa.DataType, declared: pa.DataType, path: str = ""
) -> list[str]:
    """Declarative NESTED Arrow-schema check — the analog of the
    reference's Draft-7 nested validators
    (/root/reference/src/app2/validators/stg/schema_suite/matches_schema.py:9-56,
    standings_schema.py:9-58: required keys, item types, nesting depth):
    recursively compare an actual Arrow type against the declared one.
    Integer-to-integer differences (JSON numerics always parse int64;
    per-VALUE overflow is caught by the safe cast) and large_list/list
    spelling differences are accepted; everything else produces a
    precise path-qualified error string
    (['tokens[]: string != declared int32', ...])."""
    where = path or "$"
    if actual.equals(declared):
        return []
    if pa.types.is_integer(declared) and pa.types.is_integer(actual):
        return []
    a_list = pa.types.is_list(actual) or pa.types.is_large_list(actual)
    d_list = pa.types.is_list(declared) or pa.types.is_large_list(declared)
    if d_list:
        if not a_list:
            return [f"{where}: {actual} != declared {declared}"]
        return nested_type_errors(
            actual.value_type, declared.value_type, f"{path}[]"
        )
    if pa.types.is_struct(declared):
        if not pa.types.is_struct(actual):
            return [f"{where}: {actual} != declared struct"]
        errs = []
        actual_names = {actual.field(i).name: actual.field(i) for i in range(actual.num_fields)}
        for i in range(declared.num_fields):
            f = declared.field(i)
            sub = actual_names.get(f.name)
            child = f"{path}.{f.name}" if path else f.name
            if sub is None:
                errs.append(f"{child}: required field missing")
            else:
                errs.extend(nested_type_errors(sub.type, f.type, child))
        return errs
    return [f"{where}: {actual} != declared {declared}"]


def _coerce_column(
    arr, declared: pa.DataType, col: str, errors: list[str]
):
    """Cast ``arr`` to ``declared``; on structural mismatch or cast
    failure, RECORD a precise reason (no silent nulling) and null the
    column so downstream rules see a consistent schema."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    errs = nested_type_errors(arr.type, declared, col)
    if not errs:
        try:
            return pc.cast(arr, declared) if arr.type != declared else arr
        except pa.ArrowInvalid as e:  # overflow etc. despite shape match
            errors.append(f"column '{col}': cast to {declared} failed: {e}")
            return pa.nulls(len(arr), declared)
    # shape mismatch: try a safe element cast anyway (e.g. list<string>
    # of numeric strings) — success downgrades the finding, failure
    # records it
    try:
        out = pc.cast(arr, declared)
        errors.append(
            f"column '{col}': declared {declared}, got {arr.type} "
            "(values castable — accepted with warning)"
        )
        return out
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        errors.extend(f"column '{col}': {e}" for e in errs)
        return pa.nulls(len(arr), declared)


def _normalize(
    batch: pa.Table, partition: str | None, extra_schema: pa.Schema | None = None
) -> pa.Table:
    cols = {}
    names = set(batch.column_names)
    n = batch.num_rows
    errors: list[str] = []
    if "doc_id" in names:
        cols["doc_id"] = _coerce_column(batch["doc_id"], pa.string(), "doc_id", errors)
    else:
        errors.append("column 'doc_id': required column missing")
        cols["doc_id"] = pa.nulls(n, pa.string())
    if "tokens" in names:
        cols["tokens"] = _coerce_column(
            batch["tokens"], pa.list_(pa.int32()), "tokens", errors
        )
    else:
        errors.append("column 'tokens': required column missing")
        cols["tokens"] = pa.nulls(n, pa.list_(pa.int32()))
    derived = pc.cast(
        pc.fill_null(pc.list_value_length(cols["tokens"]), 0), pa.int32()
    )
    if "n_tok" in names:
        # rows missing the field in the JSON arrive as nulls — derive
        # those from the token list, keep declared values as-is (a
        # mismatch is the row_invariants rule's finding, not ours)
        declared = _coerce_column(batch["n_tok"], pa.int32(), "n_tok", errors)
        cols["n_tok"] = pc.if_else(pc.is_valid(declared), declared, derived)
    else:
        cols["n_tok"] = derived
    cols["source"] = (
        _coerce_column(batch["source"], pa.string(), "source", errors)
        if "source" in names
        else pa.array(["unknown"] * n, pa.string())
    )
    if "partition" in names:
        cols["partition"] = pc.cast(batch["partition"], pa.string())
    else:
        cols["partition"] = pa.array([partition or "json"] * n, pa.string())
    out_schema = TOKEN_SCHEMA
    if extra_schema is not None:
        # declared NESTED passthrough columns (lists of structs etc.) —
        # validated recursively, the reference's standings/matches
        # nested-schema shape
        fields = list(TOKEN_SCHEMA)
        for f in extra_schema:
            if f.name in names:
                cols[f.name] = _coerce_column(batch[f.name], f.type, f.name, errors)
            else:
                errors.append(f"column '{f.name}': required column missing")
                cols[f.name] = pa.nulls(n, f.type)
            fields.append(f)
        out_schema = pa.schema(fields)
    if errors:
        msg = "; ".join(sorted(set(errors)))
        cols[SCHEMA_ERROR_COL] = pa.array([msg] * n, pa.string())
        out_schema = pa.schema([*out_schema, (SCHEMA_ERROR_COL, pa.string())])
    return pa.table(cols, schema=out_schema)


def read_token_json(
    paths, *, partition: str | None = None, extra_schema: pa.Schema | None = None
):
    """JSON/JSONL files -> Dataset with the canonical token-table
    schema. Columns are validated against their DECLARED (possibly
    nested) Arrow types — a shape mismatch is recorded per row in the
    ``__schema_error`` column (which the engine's schema_types rule
    turns into violations), never silently nulled; missing columns are
    nulled AND recorded. ``extra_schema`` declares additional nested
    passthrough columns (struct / list-of-struct) to validate
    recursively. n_tok is derived from tokens when absent."""
    import ray.data as rd

    ds = rd.read_json(paths)
    return ds.map_batches(
        lambda t: _normalize(t, partition, extra_schema), batch_format="pyarrow"
    )


def extract_json_int_field(arr, key: str) -> pa.Array:
    """Vectorized integer field extraction from a scalar-JSON string
    column (e.g. an event-properties payload ``{"k": 87}``) — the
    reference pulls typed fields out of raw JSON payload columns during
    staging (/root/reference/src/app2/experiments/report.py:131-178
    reads response_json fields back out of stg rows). Runs entirely in
    Arrow's RE2 kernel — no per-row json.loads in the hot path; a
    missing key, a non-integer value or a null row all yield null, so
    downstream aggregates can count coverage explicitly.

    This is the fast path for flat scalar payloads; nested/structural
    JSON goes through :func:`read_token_json`'s declared-schema
    normalization instead."""
    import re as _re

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # RE2 (Arrow's engine) has no lookahead; consume the JSON value
    # terminator instead so a float like 1.5 is rejected, not truncated
    pat = '"' + _re.escape(key) + r'"\s*:\s*(?P<v>-?\d+)\s*[,}]'
    hit = pc.extract_regex(arr, pattern=pat)
    return pc.cast(pc.struct_field(hit, "v"), pa.int64())


def read_token_csv(paths, *, partition: str | None = None):
    """CSV corpora -> canonical token-table Dataset. The ``tokens``
    column is a JSON-style int list in text form (CSV cannot carry
    nested types natively); parsed vectorized via Arrow split+cast.
    Same normalization contract as :func:`read_token_json`."""
    import ray.data as rd

    ds = rd.read_csv(paths)

    def parse(t: pa.Table) -> pa.Table:
        if "tokens" in t.column_names and pa.types.is_string(t["tokens"].type):
            s = t["tokens"]
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            stripped = pc.utf8_trim(s, " []")
            empty = pc.equal(stripped, "")
            parts = pc.split_pattern(
                pc.if_else(empty, pa.nulls(len(s), pa.string()), stripped), ","
            )
            toks = pc.cast(
                pc.utf8_trim_whitespace(pc.list_flatten(parts)), pa.int32()
            )
            if isinstance(parts, pa.ChunkedArray):
                parts = parts.combine_chunks()
            lists = pa.ListArray.from_arrays(parts.offsets, toks)
            # empty-string rows -> empty lists (not null)
            t = t.set_column(
                t.column_names.index("tokens"),
                "tokens",
                pc.if_else(
                    pc.is_valid(s),
                    lists,
                    pa.nulls(len(s), pa.list_(pa.int32())),
                ),
            )
        return _normalize(t, partition)

    return ds.map_batches(parse, batch_format="pyarrow")
