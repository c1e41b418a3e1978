"""Exact deduplication: content-hash candidates + broadcast resolve.

Generalizes the reference's load-time dedup — ``SELECT DISTINCT`` +
``ON CONFLICT DO NOTHING`` on the natural key
(/root/reference/src/app2/dds/load_dds.py:20,32) — to arbitrary content
columns at scale:

  1. a vectorized 64-bit content-hash column in ``map_batches``;
  2. duplicated hashes found by the same map-side-bucketed int64
     exchange the uniqueness rule uses (8 bytes/row shuffled — the
     full rows NEVER move);
  3. the (rare) rows carrying a duplicated hash are gathered, the
     winner per distinct content is chosen deterministically (min id;
     block order never decides — SURVEY.md §7.4), and the winner set
     is broadcast into one vectorized final filter.

The partitioning assumption: duplicates are a small fraction of the
corpus (the gather is capped; a corpus that is mostly duplicates fails
loudly rather than silently collapsing)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_string_array, stable_hash64

MAX_DUP_ROWS_COLLECTED = 2_000_000  # driver-side safety valve

CHASH = "__chash"


def content_hash_table(
    batch: pa.Table, content_cols: list[str], out_col: str = CHASH
) -> pa.Table:
    """Append a vectorized 64-bit content-hash column over
    ``content_cols`` (the shared fingerprint of dedup_exact and the
    incremental DedupIndex — identical inputs hash identically across
    both operators and across runs)."""
    acc = None
    for c in content_cols:
        arr = batch[c]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        typ = arr.type
        if (
            pa.types.is_string(typ)
            or pa.types.is_large_string(typ)
            or pa.types.is_binary(typ)
            or pa.types.is_large_binary(typ)
        ):
            # straight from the Arrow char buffer — no per-row
            # Python objects for the (typically dominant) text cols
            h = hash_string_array(arr)
        else:
            h = stable_hash64(arr.to_numpy(zero_copy_only=False))
        acc = h if acc is None else (acc * np.uint64(0x100000001B3)) ^ h
    return batch.append_column(out_col, pa.array(acc.astype("int64")))


def _with_content_hash(ds, content_cols: list[str], out_col: str = CHASH):
    return ds.map_batches(
        lambda t: content_hash_table(t, content_cols, out_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _dup_content_hashes(hashed, *, num_buckets: int = 256) -> pa.Table:
    """int64 content hashes seen more than once (exact; the exchange
    carries only the hash column, bucketed map-side) — the shared
    distributed dup scan of stages/uniqueness.dup_int64_column."""
    from ..stages.uniqueness import dup_int64_column

    return dup_int64_column(hashed, CHASH, num_buckets=num_buckets)


def _collect_dup_rows(hashed, dup_hashes: pa.Table) -> pa.Table:
    """Gather the full rows whose content hash is duplicated (small)."""
    import ray

    ref = ray.put(dup_hashes["h"].combine_chunks())

    def probe(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[CHASH], value_set=ray.get(ref)))

    out = hashed.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in out.iter_batches(batch_format="pyarrow", batch_size=2**20)
    ]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return None
    t = pa.concat_tables(tables).combine_chunks()
    if t.num_rows > MAX_DUP_ROWS_COLLECTED:
        raise RuntimeError(
            f"{t.num_rows} duplicated rows exceeds driver collect cap "
            f"{MAX_DUP_ROWS_COLLECTED}; corpus looks pathologically duplicated"
        )
    return t


def dedup_exact(
    ds, content_cols: list[str], id_col: str = "doc_id", *, materialize: bool = True
):
    """Keep, per distinct content, the row with the MIN id. Returns the
    deduplicated Dataset. Exact under 64-bit hash collisions: winners
    are resolved on the ACTUAL content values of the gathered rows, so
    two different documents sharing a hash both survive.

    The hashed dataset is scanned three times (dup scan, candidate
    gather, final filter). ``materialize=True`` (default) pins it in
    the object store — one read of the input, but full-width rows
    occupy (and at very large scale spill from) the object store.
    ``materialize=False`` re-executes the upstream read + hash per
    scan — three reads, near-zero object-store footprint; prefer it
    when the corpus dwarfs cluster memory and the input is a
    deterministic source like parquet (results with nondeterministic
    upstreams are undefined across re-scans)."""
    import ray
    import ray.data as rd

    if materialize:
        mat = _with_content_hash(ds, content_cols).materialize()

        def hashed():
            return mat

    else:

        def hashed():
            return _with_content_hash(ds, content_cols)

    dup = _dup_content_hashes(hashed())
    if dup.num_rows == 0:
        return hashed().drop_columns([CHASH])
    dup_rows = _collect_dup_rows(hashed(), dup)
    if dup_rows is None:
        return hashed().drop_columns([CHASH])
    # one winner per distinct CONTENT (not per hash): deterministic
    # min id; hash-colliding distinct contents each keep their row
    win = (
        dup_rows.to_pandas()
        .sort_values([id_col], kind="mergesort")
        .drop_duplicates(subset=content_cols, keep="first")
    )
    winners = pa.Table.from_pandas(
        win.drop(columns=[CHASH]), preserve_index=False
    )
    dup_ref = ray.put(dup["h"].combine_chunks())

    def drop_dups(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t[CHASH], value_set=ray.get(dup_ref)))
        return t.filter(mask).drop_columns([CHASH])

    survivors = hashed().map_batches(
        drop_dups, batch_format="pyarrow", zero_copy_batch=True
    )
    return survivors.union(rd.from_arrow(winners.select(survivors.schema().names)))


def exact_dup_groups(ds, content_cols: list[str], id_col: str = "doc_id"):
    """Duplicate-group report: one row per duplicated content value with
    (keep_id, dup_count). Mirrors the GROUP BY HAVING COUNT>1 shape.
    Grouped on actual content values, so hash-colliding distinct
    contents are never reported as duplicates."""
    hashed = _with_content_hash(ds, content_cols).materialize()
    dup = _dup_content_hashes(hashed)
    empty = pd.DataFrame(
        {id_col: pd.Series(dtype=object), "dup_count": pd.Series(dtype="int64")}
    )
    if dup.num_rows == 0:
        return empty
    rows = _collect_dup_rows(hashed, dup)
    if rows is None:
        return empty
    df = rows.select([*content_cols, id_col]).to_pandas()
    g = (
        df.sort_values([id_col], kind="mergesort")
        .groupby(content_cols, sort=False)[id_col]
        .agg(keep="first", dup_count="size")
        .reset_index(drop=True)
        .rename(columns={"keep": id_col})
    )
    g = g[g["dup_count"] > 1]
    return g.astype({"dup_count": "int64"}).sort_values(id_col).reset_index(drop=True)
