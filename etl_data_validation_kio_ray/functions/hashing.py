"""Deterministic vectorized hashing primitives.

All hashes are process-independent (no PYTHONHASHSEED dependence):
string hashing goes through pandas' siphash (`pd.util.hash_array`),
numeric mixing uses fixed multipliers. These feed dedup (MinHash /
SimHash), the HLL sketch, and salting/bucketing columns.

The reference has no hashing at all (exact SQL sets); these are the
scale-path additions the north star requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MERSENNE31 = (1 << 31) - 1
FP_MOD = 1_000_000_007
FP_BASE = 31


def stable_hash64(values) -> np.ndarray:
    """64-bit deterministic hash of strings/bytes/ints (vectorized)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S", "O"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr, categorize=False)


def polynomial_fingerprint(
    flat_tokens: np.ndarray, offsets: np.ndarray, *, base: int = FP_BASE, mod: int = FP_MOD
) -> np.ndarray:
    """Per-row rolling polynomial hash of a flattened list column:
    H = fold(H*base + t) mod `mod`, H0=0 — segmented-vectorized via a
    per-position power table (no Python loop over rows).

    SQL mirror (DuckDB):
      list_reduce(list_prepend(CAST(0 AS BIGINT), tokens),
                  (a, b) -> (a*31 + b) % 1000000007)
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n_rows = len(offsets) - 1
    lens = np.diff(offsets)
    total = int(offsets[-1])
    if total == 0:
        return np.zeros(n_rows, dtype=np.int64)
    max_len = int(lens.max())
    pow_table = np.empty(max_len, dtype=np.int64)
    p = 1
    for i in range(max_len):  # max_len-bounded (<= 8192), not row-bounded
        pow_table[i] = p
        p = (p * base) % mod
    # position from the END of each row for every flat element
    idx = np.arange(total, dtype=np.int64)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    pos_from_end = (offsets[row_of + 1] - 1) - idx
    term = (np.asarray(flat_tokens, dtype=np.int64) % mod) * pow_table[pos_from_end] % mod
    sums = np.add.reduceat(term, offsets[:-1][lens > 0])
    out = np.zeros(n_rows, dtype=np.int64)
    out[lens > 0] = sums % mod
    return out


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0x5EED]))
    a = rng.integers(1, MERSENNE31, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE31, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signatures(
    flat_hashes: np.ndarray,
    offsets: np.ndarray,
    *,
    num_perm: int = 128,
    seed: int = 1,
) -> np.ndarray:
    """(n_rows, num_perm) int64 MinHash signature from per-row hashed
    shingle sets (flattened + offsets). Permutations are the standard
    universal-hash family (a*h + b) mod 2^31-1 over 31-bit-folded
    hashes; rows with zero shingles get MERSENNE31 sentinels."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n_rows = len(offsets) - 1
    lens = np.diff(offsets)
    h31 = (np.asarray(flat_hashes, dtype=np.uint64) % np.uint64(MERSENNE31)).astype(
        np.int64
    )
    a, b = _perm_params(num_perm, seed)
    sig = np.full((n_rows, num_perm), MERSENNE31, dtype=np.int64)
    nz = lens > 0
    starts = offsets[:-1][nz]
    for j in range(num_perm):  # num_perm-bounded loop; inner ops vectorized
        pv = (a[j] * h31 + b[j]) % MERSENNE31
        sig[nz, j] = np.minimum.reduceat(pv, starts)
    return sig


def band_keys(sig: np.ndarray, *, bands: int, seed: int = 2) -> np.ndarray:
    """(n_rows, bands) int64 LSH band keys: each band's rows of the
    signature mixed into one 63-bit value."""
    n_rows, num_perm = sig.shape
    assert num_perm % bands == 0, (num_perm, bands)
    r = num_perm // bands
    mix = np.uint64(0x9E3779B97F4A7C15)
    s = sig.astype(np.uint64).reshape(n_rows, bands, r)
    acc = np.zeros((n_rows, bands), dtype=np.uint64)
    for k in range(r):  # r-bounded
        acc = (acc ^ s[:, :, k]) * mix
    return (acc >> np.uint64(1)).astype(np.int64)  # keep positive


def simhash64(
    flat_hashes: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    """Per-row 64-bit SimHash of hashed features (Charikar 2002):
    bit b of the output is 1 iff the sum over features of (+1 if bit b
    set else -1) is positive. Fully vectorized via unpackbits +
    segmented sums."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n_rows = len(offsets) - 1
    lens = np.diff(offsets)
    h = np.asarray(flat_hashes, dtype=np.uint64)
    if len(h) == 0:
        return np.zeros(n_rows, dtype=np.uint64)
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    contrib = bits.astype(np.int32) * 2 - 1  # (n_feat, 64) of ±1
    nz = lens > 0
    starts = offsets[:-1][nz]
    sums = np.add.reduceat(contrib, starts, axis=0)  # (nz_rows, 64)
    out_bits = (sums > 0).astype(np.uint8)
    packed = np.packbits(out_bits, axis=1, bitorder="little")
    vals = packed.copy().view(np.uint64).ravel()
    out = np.zeros(n_rows, dtype=np.uint64)
    out[nz] = vals
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between uint64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    # popcount via bytes
    by = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(by, axis=1).sum(axis=1)
