"""Exact deduplication: hash-partition by content key, keep first.

Generalizes the reference's load-time dedup — ``SELECT DISTINCT`` +
``ON CONFLICT DO NOTHING`` on the natural key
(/root/reference/src/app2/dds/load_dds.py:20,32) — to arbitrary content
columns at scale: a vectorized content-hash column added in
``map_batches`` (cheap, narrow), then ONE hash shuffle on that key and
a per-group deterministic "keep min id" (block order never decides the
winner — exactness under distribution, SURVEY.md §7.4)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64


def _with_content_hash(ds, content_cols: list[str], out_col: str = "__chash"):
    def add_hash(batch: pa.Table) -> pa.Table:
        import numpy as np

        acc = None
        for c in content_cols:
            arr = batch[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            h = stable_hash64(arr.to_pylist())
            acc = h if acc is None else (acc * np.uint64(0x100000001B3)) ^ h
        return batch.append_column(out_col, pa.array(acc.astype("int64")))

    return ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)


def dedup_exact(ds, content_cols: list[str], id_col: str = "doc_id"):
    """Keep, per distinct content, the row with the MIN id. Returns the
    deduplicated Dataset (hash-shuffle on the content hash)."""
    hashed = _with_content_hash(ds, content_cols)

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col, kind="mergesort").head(1)

    out = hashed.groupby("__chash").map_groups(keep_min, batch_format="pandas")
    return out.drop_columns(["__chash"])


def exact_dup_groups(ds, content_cols: list[str], id_col: str = "doc_id"):
    """Duplicate-group report: one row per duplicated content value with
    (keep_id, dup_count). Mirrors the GROUP BY HAVING COUNT>1 shape."""
    hashed = _with_content_hash(ds, content_cols)

    def report(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return group.head(0)[[id_col]].assign(dup_count=pd.Series(dtype="int64"))
        keep = group[id_col].min()
        return pd.DataFrame({id_col: [keep], "dup_count": [len(group)]})

    return hashed.groupby("__chash").map_groups(report, batch_format="pandas")
