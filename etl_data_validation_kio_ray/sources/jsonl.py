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


def _normalize(batch: pa.Table, partition: str | None) -> pa.Table:
    cols = {}
    names = set(batch.column_names)
    n = batch.num_rows
    cols["doc_id"] = (
        pc.cast(batch["doc_id"], pa.string())
        if "doc_id" in names
        else pa.nulls(n, pa.string())
    )
    if "tokens" in names:
        toks = batch["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        cols["tokens"] = pc.cast(toks, pa.list_(pa.int32()))
    else:
        cols["tokens"] = pa.nulls(n, pa.list_(pa.int32()))
    derived = pc.cast(
        pc.fill_null(pc.list_value_length(cols["tokens"]), 0), pa.int32()
    )
    if "n_tok" in names:
        # rows missing the field in the JSON arrive as nulls — derive
        # those from the token list, keep declared values as-is (a
        # mismatch is the row_invariants rule's finding, not ours)
        declared = pc.cast(batch["n_tok"], pa.int32())
        cols["n_tok"] = pc.if_else(pc.is_valid(declared), declared, derived)
    else:
        cols["n_tok"] = derived
    cols["source"] = (
        pc.cast(batch["source"], pa.string())
        if "source" in names
        else pa.array(["unknown"] * n, pa.string())
    )
    if "partition" in names:
        cols["partition"] = pc.cast(batch["partition"], pa.string())
    else:
        cols["partition"] = pa.array([partition or "json"] * n, pa.string())
    return pa.table(cols, schema=TOKEN_SCHEMA)


def read_token_json(paths, *, partition: str | None = None):
    """JSON/JSONL files -> Dataset with the canonical token-table
    schema. Missing columns are nulled (the schema rule reports them);
    n_tok is derived from tokens when absent."""
    import ray.data as rd

    ds = rd.read_json(paths)
    return ds.map_batches(
        lambda t: _normalize(t, partition), batch_format="pyarrow"
    )


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
