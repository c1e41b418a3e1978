"""Distributed Bloom filter over an int64 key column.

The scale role (ray_guide "broadcast the small side"): a broadcast
EXACT key set costs O(#keys) worker memory, which stops working when
the build side has hundreds of millions of keys; a Bloom bitmap costs
a FIXED m/8 bytes (128 KiB at the default 2^20 bits) regardless of key
count, at the price of a tunable false-positive rate — so it serves as
a cheap prefilter in front of the exact bucketed semi-join exchange,
shrinking the rows that pay the shuffle. No false negatives by
construction (build and probe use the same double-hash family), so
`prefilter -> exact verify` is lossless.

Hash family: double hashing idx_i = (h1 + i*h2) mod m with h1/h2 two
independent splitmix64 finalizations of the key (Kirsch-Mitzenmacher:
two hashes generate k indices with no loss in asymptotic fp rate).

Reference analog: the FK existence probes
(/root/reference/src/app2/validators/dds/rules_suite/fk_orders.py) are
broadcast exact sets; this is their bounded-memory scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import _splitmix64

_H2_SALT = np.uint64(0x9E3779B97F4A7C15)


def _indices(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) array of bit indices for each key."""
    v = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(v)
    h2 = _splitmix64(v ^ _H2_SALT) | np.uint64(1)  # odd => full period
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def batch_bitmap(keys: np.ndarray, *, m_bits: int, k: int) -> np.ndarray:
    """uint64 word array (m_bits/64 long) with this batch's bits set."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(keys):
        idx = _indices(keys, m_bits, k).ravel()
        np.bitwise_or.at(words, idx >> 6, np.uint64(1) << (idx & np.uint64(63)))
    return words


def build_bloom(ds, col: str, *, m_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """OR-fold per-block bitmaps of ``ds[col]`` into one bitmap.

    Each block collapses to ONE fixed-size (m_bits/8-byte) binary row,
    so the driver fold is O(blocks * m/8) — 128 KiB per block at the
    default size, never row data. Past ~10k blocks, insert a tree
    level (map_batches over unions of the partial rows) before the
    driver; the fold is associative/commutative so any shape works.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")

    def partial(t: pa.Table) -> pa.Table:
        keys = t[col].to_numpy(zero_copy_only=False)
        words = batch_bitmap(keys, m_bits=m_bits, k=k)
        return pa.table({"bm": pa.array([words.tobytes()], pa.binary())})

    out = np.zeros(m_bits // 64, dtype=np.uint64)
    for row in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_rows():
        out |= np.frombuffer(row["bm"], dtype=np.uint64)
    return out


def probe_bloom(
    keys: np.ndarray, words: np.ndarray, *, m_bits: int, k: int
) -> np.ndarray:
    """Boolean membership mask (true = POSSIBLY present; false = surely
    absent). Vectorized: k gathers + bit tests, no Python loop over rows."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    idx = _indices(keys, m_bits, k)
    bits = (words[(idx >> 6).ravel()] >> (idx.ravel() & np.uint64(63))) & np.uint64(1)
    return bits.reshape(idx.shape).all(axis=1)
