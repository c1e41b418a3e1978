"""Shared LSH candidate-scan scaffolding (MinHash + embedding LSH).

The common two-pass layout: a lazily recomputed narrow (id, key)
dataset feeds (A) the map-side-bucketed int64 duplicate scan to find
multi-member bucket keys and (B) a broadcast-probe gather of ONLY the
members of those buckets. Nothing proportional to the exploded row
count reaches the driver or is pinned in the object store; the gather
is capped loudly.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MAX_CANDIDATE_ROWS = 2_000_000  # driver-side gather cap (loud, not silent)


def gather_candidate_rows(
    make_ds,
    key_fn,
    id_col: str,
    *,
    num_buckets: int = 256,
    max_rows: int = MAX_CANDIDATE_ROWS,
    what: str = "lsh",
    remedy: str = "strengthen the LSH or dedup exactly first",
) -> pd.DataFrame:
    """Two-pass candidate scan. ``make_ds()`` builds the (lazily
    recomputed) exploded dataset; ``key_fn(table) -> pa.Array[int64]``
    derives the well-mixed bucket key per row. Returns a DataFrame
    ("bk", id_col) of all members of multi-member buckets — empty when
    no bucket repeats. Raises loudly past ``max_rows``."""
    import ray

    from ..stages.uniqueness import dup_int64_column

    cand_keys = dup_int64_column(
        make_ds().map_batches(
            lambda t: pa.table({"h": key_fn(t)}), batch_format="pyarrow"
        ),
        "h",
        num_buckets=num_buckets,
    )
    if cand_keys.num_rows == 0:
        return pd.DataFrame({"bk": pd.Series(dtype="int64"), id_col: []})

    keys_ref = ray.put(cand_keys["h"].combine_chunks())

    def keep_cand(t: pa.Table) -> pa.Table:
        key = key_fn(t)
        mask = pc.is_in(key, value_set=ray.get(keys_ref))
        return pa.table({"bk": key, id_col: t[id_col]}).filter(mask)

    gathered = make_ds().map_batches(keep_cand, batch_format="pyarrow").to_pandas()
    if len(gathered) > max_rows:
        raise RuntimeError(
            f"{len(gathered)} candidate bucket rows exceeds driver gather cap "
            f"{max_rows} in the {what} scan; the corpus looks pathologically "
            f"self-similar — {remedy}"
        )
    return gathered


def gather_rows_by_id(ds, ids, columns: list[str], id_col: str) -> pd.DataFrame:
    """Broadcast-probe gather of ``columns`` for the given ids only
    (the verify-stage fetch shared by the MinHash text gather and the
    embedding vector gather)."""
    import ray

    ids_ref = ray.put(pa.array(list(ids)))

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=ray.get(ids_ref))
        return t.select(columns).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow").to_pandas()
