"""Mergeable histograms.

The reference keeps only exact SQL counts (SURVEY.md §2.5); at 10^12-row
scale per-column distributions must instead be mergeable per-batch
partials (mergeable-summary pattern — see "An Experimental Analysis of
Quantile Sketches over Data Streams", EDBT 2023). Two shapes:

- ``CountingHist``: one bucket per integer value over a bounded domain
  (n_tok in [1, 8192]). EXACT — quantiles from it match a SQL
  ``quantile_disc`` oracle bit-for-bit, while still being a fixed-size
  mergeable partial.
- ``FixedHistogram``: fixed-bin float/int histogram for drift scoring
  (KS / PSI need comparable binned distributions, not exact values).

Both merge by elementwise addition, so merge order never matters
(deterministic under any Ray task scheduling).
"""

from __future__ import annotations

import numpy as np


class CountingHist:
    """Exact counts per integer value in [lo, hi]. Out-of-range values
    are clipped into the edge buckets (they are separately flagged by the
    row_invariants rule, so clipping never hides a violation)."""

    __slots__ = ("lo", "hi", "counts")

    def __init__(self, lo: int, hi: int, counts: np.ndarray | None = None):
        self.lo = int(lo)
        self.hi = int(hi)
        n = self.hi - self.lo + 1
        self.counts = (
            counts if counts is not None else np.zeros(n, dtype=np.int64)
        )
        assert self.counts.shape == (n,)

    def update(self, values: np.ndarray) -> "CountingHist":
        if len(values):
            v = np.clip(values.astype(np.int64), self.lo, self.hi) - self.lo
            self.counts += np.bincount(v, minlength=len(self.counts))
        return self

    def merge(self, other: "CountingHist") -> "CountingHist":
        assert (self.lo, self.hi) == (other.lo, other.hi)
        self.counts += other.counts
        return self

    @property
    def n(self) -> int:
        return int(self.counts.sum())

    def min(self) -> int | None:
        nz = np.flatnonzero(self.counts)
        return int(nz[0] + self.lo) if len(nz) else None

    def max(self) -> int | None:
        nz = np.flatnonzero(self.counts)
        return int(nz[-1] + self.lo) if len(nz) else None

    def sum(self) -> int:
        vals = np.arange(self.lo, self.hi + 1, dtype=np.int64)
        return int((vals * self.counts).sum())

    def quantile(self, q: float) -> int | None:
        """Discrete quantile matching DuckDB ``quantile_disc``: the
        smallest value whose cumulative count reaches ceil(q * n)
        (verified empirically against DuckDB 1.0)."""
        n = self.n
        if n == 0:
            return None
        target = max(1, int(np.ceil(q * n)))
        cum = np.cumsum(self.counts)
        idx = int(np.searchsorted(cum, target))
        return idx + self.lo

    def to_state(self) -> dict:
        return {"lo": self.lo, "hi": self.hi, "counts": self.counts}

    @classmethod
    def from_state(cls, s: dict) -> "CountingHist":
        return cls(s["lo"], s["hi"], np.array(s["counts"], dtype=np.int64, copy=True))


class FixedHistogram:
    """Fixed-width-bin histogram over [lo, hi) with ``nbins`` bins.
    Values outside the range land in the edge bins."""

    __slots__ = ("lo", "hi", "nbins", "counts")

    def __init__(self, lo: float, hi: float, nbins: int, counts: np.ndarray | None = None):
        self.lo = float(lo)
        self.hi = float(hi)
        self.nbins = int(nbins)
        self.counts = (
            counts if counts is not None else np.zeros(self.nbins, dtype=np.int64)
        )

    def bin_of(self, values: np.ndarray) -> np.ndarray:
        width = (self.hi - self.lo) / self.nbins
        b = np.floor((values.astype(np.float64) - self.lo) / width).astype(np.int64)
        return np.clip(b, 0, self.nbins - 1)

    def update(self, values: np.ndarray) -> "FixedHistogram":
        if len(values):
            self.counts += np.bincount(self.bin_of(values), minlength=self.nbins)
        return self

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        assert (self.lo, self.hi, self.nbins) == (other.lo, other.hi, other.nbins)
        self.counts += other.counts
        return self

    @property
    def n(self) -> int:
        return int(self.counts.sum())

    def pdf(self, eps: float = 1e-6) -> np.ndarray:
        p = self.counts.astype(np.float64) + eps
        return p / p.sum()

    def to_state(self) -> dict:
        return {"lo": self.lo, "hi": self.hi, "nbins": self.nbins, "counts": self.counts}

    @classmethod
    def from_state(cls, s: dict) -> "FixedHistogram":
        return cls(s["lo"], s["hi"], s["nbins"], np.array(s["counts"], dtype=np.int64, copy=True))


def psi(base: FixedHistogram, cur: FixedHistogram, eps: float = 1e-6) -> float:
    """Population Stability Index between two same-shape histograms."""
    p, q = base.pdf(eps), cur.pdf(eps)
    return float(np.sum((q - p) * np.log(q / p)))


def ks_stat(base: FixedHistogram, cur: FixedHistogram) -> float:
    """Two-sample KS statistic approximated on the shared binning:
    max |CDF_base - CDF_cur|."""
    if base.n == 0 or cur.n == 0:
        return 0.0
    cb = np.cumsum(base.counts) / base.n
    cc = np.cumsum(cur.counts) / cur.n
    return float(np.abs(cb - cc).max())
