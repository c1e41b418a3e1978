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
import pyarrow as pa

MERSENNE31 = (1 << 31) - 1
FP_MOD = 1_000_000_007
FP_BASE = 31
_BYTE_PATH_MAX = 32  # strings up to this length hash per-byte
_BLOCK_CAP = 512  # positional-loop bound (8-byte blocks = 4 KiB)


def _byte_horner(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray, base: np.uint64
) -> np.ndarray:
    """h = fold(h*base + byte) over each row's bytes; rows sorted by
    length so each byte position processes a shrinking suffix."""
    n = len(starts)
    order = np.argsort(lens, kind="stable")
    lens_s = lens[order]
    starts_s = starts[order]
    h = np.zeros(n, dtype=np.uint64)
    for j in range(int(lens_s[-1]) if n else 0):
        s = int(np.searchsorted(lens_s, j, side="right"))
        h[s:] = h[s:] * base + data[starts_s[s:] + j]
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def _block_horner(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray, base: np.uint64
) -> np.ndarray:
    """h = fold(h*base + block) over each row's 8-byte little-endian
    blocks (tail block zero-masked past the string end). Unaligned
    uint64 loads come from eight shifted views of a once-padded copy of
    the char buffer; a row's block offsets all share one residue class,
    so each residue group runs its own suffix-Horner."""
    padded = np.empty(len(data) + 8, dtype=np.uint8)
    padded[: len(data)] = data
    padded[len(data) :] = 0
    views = [
        np.frombuffer(padded, dtype=np.uint64, offset=r, count=(len(padded) - r) // 8)
        for r in range(8)
    ]
    n = len(starts)
    out = np.empty(n, dtype=np.uint64)
    nblocks = -(-lens // 8)
    res = starts % 8
    full_mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    for r in range(8):
        rows = np.flatnonzero(res == r)
        if not len(rows):
            continue
        dv = views[r]
        order = rows[np.argsort(nblocks[rows], kind="stable")]
        nb_s = nblocks[order]
        starts_s = starts[order]
        lens_s = lens[order]
        m = len(order)
        h = np.zeros(m, dtype=np.uint64)
        for j in range(min(int(nb_s[-1]), _BLOCK_CAP)):
            s = int(np.searchsorted(nb_s, j, side="right"))
            v = dv[(starts_s[s:] + 8 * j) >> 3]
            # rows whose LAST block is j sit at the front of the active
            # suffix: zero-mask their bytes past the string end
            e = int(np.searchsorted(nb_s, j + 1, side="right"))
            if e > s:
                rem = (lens_s[s:e] % 8).astype(np.uint64)
                mask = np.where(
                    rem == 0,
                    full_mask,
                    (np.uint64(1) << (np.uint64(8) * rem)) - np.uint64(1),
                )
                v = v.copy()
                v[: e - s] &= mask
            h[s:] = h[s:] * base + v
        # rare tail: rows longer than the block cap finish with a
        # per-row vectorized polynomial over their remaining blocks
        for i in np.flatnonzero(nb_s > _BLOCK_CAP):
            bs = int(starts_s[i])
            nb = int(nb_s[i])
            v = dv[(bs + 8 * _BLOCK_CAP) >> 3 : (bs + 8 * nb) >> 3].copy()
            v = v.astype(np.uint64)
            rem = int(lens_s[i] % 8)
            if rem:
                v[-1] &= (np.uint64(1) << np.uint64(8 * rem)) - np.uint64(1)
            k = len(v)
            pw = np.empty(k, dtype=np.uint64)
            pw[0] = 1
            if k > 1:
                np.cumprod(np.full(k - 1, base, np.uint64), out=pw[1:])
            with np.errstate(over="ignore"):
                h[i] = h[i] * (pw[-1] * base) + np.sum(v * pw[::-1])
        out[order] = h
    return out


def stable_hash64(values) -> np.ndarray:
    """64-bit deterministic hash of strings/bytes/ints (vectorized)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S", "O"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr, categorize=False)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants):
    avalanches a weakly-mixed uint64 so low bits are usable for
    bucketing (h % num_buckets)."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_string_array(arr, *, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of an Arrow string/binary array,
    computed DIRECTLY from the Arrow char buffer + offsets — no
    ``to_pylist()``, no per-row Python objects (the object-array path
    materializes every string on the heap before hashing; this one is
    two numpy passes over the raw bytes).

    Scheme: per-row polynomial hash over the UTF-8 bytes in the
    natural mod-2^64 ring (byte[i] * base^(len-1-i), summed with
    wraparound), length-mixed and finished with a splitmix64 avalanche.
    Not cryptographic — callers that need exactness confirm candidates
    against real values (stages/uniqueness.py pattern). Null rows hash
    to a fixed sentinel distinct from the empty string."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    typ = arr.type
    off_dtype = (
        np.int64
        if (pa.types.is_large_string(typ) or pa.types.is_large_binary(typ))
        else np.int32
    )
    offs_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    offs = np.frombuffer(offs_buf, dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    start, end = int(offs[0]), int(offs[-1])
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)[start:end]
        if data_buf is not None and end > start
        else np.empty(0, np.uint8)
    )
    offs = offs - start
    lens = np.diff(offs)
    base = np.uint64(0x100000001B3 ^ (seed * 2 + 1))  # odd => invertible mod 2^64
    out = np.zeros(n, dtype=np.uint64)
    total = int(offs[-1])
    if total:
        starts = offs[:-1]
        # Per-STRING scheme selection (so the hash of a given string is
        # independent of which batch it arrives in): short strings use
        # a per-byte Horner, long strings a per-8-byte-block Horner.
        # Both are vectorized ACROSS rows and loop over POSITIONS with
        # the active rows as a suffix of a length-sorted order —
        # touching only O(row-count)-sized reused buffers per step (the
        # flat per-byte formulation allocates several bytes-sized int64
        # temporaries, which this sandbox's page-fault behavior makes
        # pathologically slow; see __init__._tune_allocator).
        short = lens <= _BYTE_PATH_MAX
        if short.any():
            idx = np.flatnonzero(short)
            out[idx] = _byte_horner(data, starts[idx], lens[idx], base)
        if not short.all():
            idx = np.flatnonzero(~short)
            out[idx] = _block_horner(data, starts[idx], lens[idx], base)
    seed_mix = np.uint64((seed * 2 + 1) * 0xD1B54A32D192ED03 % (1 << 64))
    out ^= lens.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    out ^= seed_mix  # seed perturbs every row, incl. empty strings
    out = _splitmix64(out)
    if arr.null_count:
        import pyarrow.compute as pc

        nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
        # 1-element array form: numpy SCALAR uint64 ops emit overflow
        # RuntimeWarnings while array ops wrap silently
        sentinel = np.array(
            [np.uint64(0x6E756C6C5F726F77) ^ seed_mix], dtype=np.uint64
        )
        out[nulls] = _splitmix64(sentinel)[0]
    return out


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


def grouped_content_digest(ds, *, text_col: str, group_col: str):
    """Order-independent per-group table digest: the wrapping mod-2^64
    SUM of each row's 64-bit content hash (``hash_string_array``) —
    the cheap cross-run / cross-engine data-equality check a validation
    engine runs before and after a migration or rewrite. Commutative
    and mergeable by construction (addition), so the digest is
    identical under any block layout, arrival order or cluster size;
    duplicate rows count with multiplicity (a dropped-or-doubled row
    changes the digest).

    Scale shape: ONE streaming pass; each batch collapses to at most
    |groups| (group, partial-sum, count) rows via a vectorized
    ``np.add.at`` over dictionary codes (uint64 wraparound IS the ring
    arithmetic); the driver folds the bounded partials with exact
    Python ints. Output: (group, n_rows, digest_hi, digest_lo) — the
    digest split into two int64-safe 32-bit halves so both engines can
    emit it without unsigned-overflow games.

    Reference analog: the reference's per-run count/sum reconciliation
    checks (/root/reference/src/app2/validators/dds rules) strengthened
    to full-content identity.
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        h = hash_string_array(t[text_col])
        dct = g.dictionary_encode()
        cats = dct.dictionary
        codes = dct.indices.to_numpy(zero_copy_only=False)
        acc = np.zeros(len(cats), dtype=np.uint64)
        np.add.at(acc, codes, h)  # wraps mod 2^64: the digest ring
        cnt = np.bincount(codes, minlength=len(cats)).astype(np.int64)
        return pa.table(
            {
                group_col: cats,
                "part": pa.array(acc.view(np.int64)),
                "n": pa.array(cnt),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # bounded: <= batches x |groups| rows
    m = 1 << 64
    rows = []
    for grp, sub in parts.groupby(group_col, sort=True):
        dg = 0
        for v in sub["part"].to_numpy(np.int64):
            dg = (dg + (int(v) & (m - 1))) % m
        rows.append(
            {
                group_col: grp,
                "n_rows": int(sub["n"].sum()),
                "digest_hi": dg >> 32,
                "digest_lo": dg & 0xFFFFFFFF,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("n_rows", "digest_hi", "digest_lo"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)
