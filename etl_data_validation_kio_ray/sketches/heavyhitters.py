"""Two-pass EXACT heavy hitters: Misra-Gries candidate generation,
then an exact confirm pass restricted to the candidate set.

The reference computes frequency checks as full SQL GROUP BYs (e.g.
the grouped duplicate / balance checks under
/root/reference/src/app1/dds/load_suite/); at 100 TB a GROUP BY on an
unbounded-cardinality key is an all-to-all shuffle of every row. The
scale path here never shuffles a row:

  pass 1  ``map_batches`` emits a bounded Misra-Gries summary per
          batch (``k`` counters, vectorized sort+``reduceat``
          counting, offline-MG decrement). Summaries are tiny
          (k rows each) and are merged driver-side with the classic
          MG merge (sum by key, subtract the (k+1)-th largest, keep
          positive). Guarantee: any key with true count
          > n/(k+1) survives — NO false negatives for thresholds
          above that bound (checked at runtime, loud failure).
  pass 2  candidates are broadcast (``ray.put``); ``map_batches``
          counts ONLY candidate keys per batch; the per-batch
          partials (≤ |candidates| rows) are summed driver-side and
          filtered by the exact threshold.

Output is exact (identical to the full GROUP BY ... HAVING), with
traffic O(k × n_batches) instead of O(n_rows).

Keys must be numpy-comparable (int/float/bytes); hash string columns
first (``functions.hashing.hash_string_array``) when the raw strings
are long — the confirm pass works on whatever key it is given.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from etl_data_validation_kio_ray.functions.grouping import group_reduce as _group_counts


def mg_summary(keys: np.ndarray, k: int, weights: np.ndarray | None = None):
    """Misra-Gries summary of a weighted key stream: ≤ k counters whose
    per-key undercount is ≤ total_weight/(k+1)."""
    ks, cnt = _group_counts(keys, weights)
    if len(ks) > k:
        cut = np.partition(cnt, len(cnt) - k - 1)[len(cnt) - k - 1]
        cnt = cnt - cut
        keep = cnt > 0
        ks, cnt = ks[keep], cnt[keep]
    return ks, cnt


def heavy_hitters(
    ds,
    col: str,
    *,
    support: float | None = None,
    threshold_count: int | None = None,
    k: int | None = None,
    list_col: bool = False,
) -> pd.DataFrame:
    """Exact keys of ``col`` with count ≥ threshold, two-pass.

    ``support``: threshold as a fraction of total count (threshold =
    ceil(support·n), computed from the observed n). ``threshold_count``:
    absolute threshold instead. ``k``: MG counter budget; defaults to
    ceil(4/support) (4× the guarantee bound) or 256. ``list_col``:
    flatten a list-typed column per batch before counting.

    Returns a DataFrame (key, count) sorted by key. Raises if the MG
    guarantee cannot cover the requested threshold (k too small) —
    loud, never a silent coverage cap.
    """
    import ray

    if (support is None) == (threshold_count is None):
        raise ValueError("heavy_hitters: pass exactly one of support / threshold_count")
    if k is None:
        k = int(np.ceil(4.0 / support)) if support is not None else 256

    def _values(t: pa.Table) -> np.ndarray:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if list_col:
            c = c.flatten()
        return c.to_numpy(zero_copy_only=False)

    def pass1(t: pa.Table) -> pa.Table:
        v = _values(t)
        ks, cnt = mg_summary(v, k)
        total = np.zeros(len(ks), dtype=np.int64)
        if len(total):
            total[0] = len(v)
        elif len(v):  # k=0 degenerate: still record the mass
            return pa.table(
                {
                    "key": pa.array(v[:1]),
                    "cnt": pa.array(np.zeros(1, dtype=np.int64)),
                    "total": pa.array(np.array([len(v)], dtype=np.int64)),
                }
            )
        return pa.table(
            {"key": pa.array(ks), "cnt": pa.array(cnt), "total": pa.array(total)}
        )

    partials = ds.map_batches(pass1, batch_format="pyarrow").to_pandas()
    n = int(partials["total"].sum())
    if n == 0:
        return pd.DataFrame({"key": pd.Series(dtype="object"), "count": pd.Series(dtype="int64")})
    thresh = (
        int(threshold_count)
        if threshold_count is not None
        else max(1, int(np.ceil(support * n)))
    )
    # MG no-false-negative bound: every key with count > n/(k+1) is a
    # candidate. The threshold must sit above that bound or the result
    # could silently miss keys — refuse instead.
    if thresh <= n // (k + 1):
        raise ValueError(
            f"heavy_hitters: threshold {thresh} is within the MG error bound "
            f"n/(k+1)={n // (k + 1)}; raise k (have {k}) or the threshold"
        )
    cand, _ = mg_summary(
        partials["key"].to_numpy(), k, partials["cnt"].to_numpy()
    )
    if len(cand) == 0:
        return pd.DataFrame({"key": pd.Series(dtype="object"), "count": pd.Series(dtype="int64")})
    cand_ref = ray.put(np.sort(cand))

    def pass2(t: pa.Table) -> pa.Table:
        c = np.asarray(ray.get(cand_ref))
        v = _values(t)
        v = v[np.isin(v, c)]
        ks, cnt = _group_counts(v)
        return pa.table({"key": pa.array(ks), "cnt": pa.array(cnt)})

    exact = ds.map_batches(pass2, batch_format="pyarrow").to_pandas()
    if exact.empty:
        return pd.DataFrame({"key": pd.Series(dtype="object"), "count": pd.Series(dtype="int64")})
    out = exact.groupby("key", sort=True)["cnt"].sum().reset_index()
    out = out[out["cnt"] >= thresh].rename(columns={"cnt": "count"})
    return out.sort_values("key").reset_index(drop=True)
