"""Shared sorted-run grouping kernels.

One home for the "stable argsort + run-start detection + reduceat"
pattern that grouped counting/summing over a numpy key column needs.
``np.unique(return_counts=True)`` is pathologically slow on this host
for large int64 keys (10-37 s at 16M rows vs 0.5 s for sort + adjacent
equality — see stages/uniqueness.dup_values), so every per-batch
grouped aggregation routes through these instead.

Reference analog: the per-group COUNT/SUM shapes in the reference's
round-robin balance and summary SQL
(/root/reference/src/app2/dds/balance_suite/round_robin.py:14-40).
"""

from __future__ import annotations

import numpy as np

__all__ = ["run_starts", "group_reduce"]


def run_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Indices where each run of equal adjacent values begins.

    ``sorted_keys`` must already be grouped (sorted, or at least with
    equal keys adjacent). Returns int64 start offsets; empty input ->
    empty result. Run lengths are ``np.diff(np.r_[starts, n])``.
    """
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    return np.flatnonzero(np.r_[True, sorted_keys[1:] != sorted_keys[:-1]])


def group_reduce(
    keys: np.ndarray,
    weights: np.ndarray | None = None,
    *,
    return_counts: bool = False,
):
    """(sorted distinct keys, per-key total[, per-key count]) for an
    UNSORTED key array.

    ``weights is None`` counts occurrences; otherwise sums the weights
    (cast to int64) per key. ``return_counts=True`` appends the
    occurrence count as a third result (one sort either way). Stable
    argsort keeps the kernel O(n log n) with no hashing and no Python
    loop.
    """
    if len(keys) == 0:
        zero = np.zeros(0, dtype=np.int64)
        return (keys, zero, zero) if return_counts else (keys, zero)
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    starts = run_starts(ks)
    counts = np.diff(np.r_[starts, len(ks)]).astype(np.int64)
    if weights is None:
        agg = counts
    else:
        agg = np.add.reduceat(weights[order].astype(np.int64), starts)
    if return_counts:
        return ks[starts], agg, counts
    return ks[starts], agg
