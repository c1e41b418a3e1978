"""HyperLogLog cardinality sketch (Flajolet et al. 2007, with the
standard small-range linear-counting correction).

Used for doc_id cardinality in ``column_stats``: per-batch partial
registers, merged by elementwise max — merge-order independent, fixed
seed via pandas' deterministic 64-bit siphash (``pd.util.hash_array``),
so estimates are reproducible across runs and processes regardless of
PYTHONHASHSEED.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def hash64(values) -> np.ndarray:
    """Deterministic 64-bit hash of an array-like of strings/bytes/ints."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S", "O"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr, categorize=False)


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def update_hashed(self, h: np.ndarray) -> "HyperLogLog":
        if not len(h):
            return self
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = #leading zeros of `rest` + 1, capped at 64-p+1
        lz = np.full(len(h), 64 - self.p, dtype=np.int64)
        nonzero = rest != 0
        if nonzero.any():
            # position of highest set bit via float log2 is unsafe at 64 bits;
            # use bit-length trick on uint64 through successive shifts
            r = rest[nonzero]
            bits = np.zeros(len(r), dtype=np.int64)
            for shift in (32, 16, 8, 4, 2, 1):
                mask = r >= (np.uint64(1) << np.uint64(shift))
                bits[mask] += shift
                r = np.where(mask, r >> np.uint64(shift), r)
            lz_nonzero = 63 - bits
            lz[nonzero] = lz_nonzero
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def update(self, values) -> "HyperLogLog":
        return self.update_hashed(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_state(self) -> dict:
        return {"p": self.p, "registers": self.registers}

    @classmethod
    def from_state(cls, s: dict) -> "HyperLogLog":
        return cls(s["p"], np.array(s["registers"], dtype=np.uint8, copy=True))


def grouped_hll(ds, key: str, value_col: str, *, p: int = 12):
    """Approximate COUNT(DISTINCT value) per key — the sketch path for
    when the exact pair-dedup exchange
    (pipelines.relational.grouped_count_distinct) is too expensive:
    per-batch per-group HLL registers (2^p bytes each) are the ONLY
    exchange, merged by elementwise max on the driver (order
    independent). Works for low-cardinality keys (registers x keys x
    batches must be cheap); the exact operator remains the tool for
    high-cardinality keys.

    Returns {key_value: HyperLogLog} merged across all batches.
    """
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        k = t[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if k.null_count:
            # pd.factorize assigns code -1 to nulls, which the group
            # loop below would silently DROP — a NULL group must either
            # be modeled by the caller or rejected loudly, never lost
            raise ValueError(
                f"grouped_hll: key column {key!r} contains "
                f"{k.null_count} null(s); fill or filter them first "
                "(a silent drop would under-count the NULL group)"
            )
        codes, uniq = pd.factorize(pd.Series(k.to_numpy(zero_copy_only=False)))
        vals = v.to_numpy(zero_copy_only=False)
        keys_out, regs_out = [], []
        for c, u in enumerate(uniq):  # low-cardinality key: tiny loop
            h = HyperLogLog(p).update(vals[codes == c])
            keys_out.append(u)
            regs_out.append(h.registers.tobytes())
        return pa.table(
            {key: pa.array(keys_out), "regs": pa.array(regs_out, pa.binary())}
        )

    merged: dict = {}
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for kk, blob in zip(
            b[key].to_pylist(), b["regs"].to_pylist()
        ):  # rows = keys x batches: tiny
            regs = np.frombuffer(blob, dtype=np.uint8)
            if kk in merged:
                merged[kk].registers = np.maximum(merged[kk].registers, regs)
            else:
                merged[kk] = HyperLogLog(p, registers=regs.copy())
    return merged
