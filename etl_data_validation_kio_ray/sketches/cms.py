"""Count-min sketch: mergeable frequency estimates with a one-sided
error guarantee (Cormode & Muthukrishnan 2005).

``d`` independent rows of ``w`` counters; row ``j`` hashes a key with
the splitmix64 stream seeded at the key and advanced ``j`` steps
(h_j(u) = splitmix64(u + j * GOLDEN) % w — the same golden-gamma
constant the engine uses everywhere, so a SQL twin can recompute every
counter bit-exactly with the UHUGEINT chain already proven for
train_shards). Estimates NEVER undercount: est(u) = min_j row_j[h_j(u)]
>= true(u), and exceeds it by more than e*N/w per row only with
probability (1/2)^d.

Scale shape: each batch folds into a fixed-size (d x w) int64 partial;
partials merge by elementwise SUM (order-independent), so the driver
gathers #batches x d*w*8 bytes — never per-key state.

Reference analog: the count-based verdict scalars
(/root/reference/src/app2/etl_validation/sql_runner.py:64-105), here as
a sublinear sketch instead of an exact GROUP BY.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import _splitmix64

GOLDEN = 0x9E3779B97F4A7C15  # splitmix64 gamma — shared with the SQL twin

CMS_DEPTH = 4
CMS_WIDTH = 2048


def cms_buckets(keys: np.ndarray, j: int, width: int = CMS_WIDTH) -> np.ndarray:
    """Row-j bucket index for int64 keys (uint64 wrap-around add, so
    the SQL twin's `% 2^64` UHUGEINT arithmetic matches bit-for-bit)."""
    # Python-int precompute of the wrapped step (a numpy scalar multiply
    # would warn on the intentional mod-2^64 overflow)
    u = keys.astype(np.uint64) + np.uint64((j * GOLDEN) % (1 << 64))
    return (_splitmix64(u) % np.uint64(width)).astype(np.int64)


def cms_partial(
    keys: np.ndarray, *, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> np.ndarray:
    """(depth x width) int64 counter partial for one batch of keys."""
    cms = np.zeros((depth, width), dtype=np.int64)
    for j in range(depth):
        np.add.at(cms[j], cms_buckets(keys, j, width), 1)
    return cms


def cms_partial_table(
    t: pa.Table, key_col: str, *, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> pa.Table:
    """map_batches adapter: one binary row per batch holding the packed
    (depth x width) int64 partial."""
    keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    cms = cms_partial(keys, depth=depth, width=width)
    return pa.table({"cms": pa.array([cms.tobytes()], pa.binary())})


def cms_merge(rows, *, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> np.ndarray:
    """Sum-merge packed partials (iterable of {'cms': bytes} rows)."""
    acc = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        acc += np.frombuffer(r["cms"], dtype=np.int64).reshape(depth, width)
    return acc


def cms_estimate(
    cms: np.ndarray, keys: np.ndarray, *, width: int = CMS_WIDTH
) -> np.ndarray:
    """min-over-rows point estimates for int64 keys."""
    depth = cms.shape[0]
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        est = np.minimum(est, cms[j, cms_buckets(keys, j, width)])
    return est
