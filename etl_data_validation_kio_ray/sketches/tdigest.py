"""A compact merging t-digest (Dunning & Ertl) for quantiles of
unbounded float columns.

For the bounded-int ``n_tok`` column the engine prefers the EXACT
``CountingHist`` (hist.py); the t-digest is the general-domain path
(e.g. quality scores, event values). Fixed compression; per-batch
construction sorts its input, so a digest of a given multiset is
deterministic. Cross-batch merge order can perturb quantiles within
the documented tolerance (SURVEY.md §7.4) — tests use rtol=0.02.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("compression", "means", "weights", "_min", "_max")

    def __init__(self, compression: int = 200):
        self.compression = int(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._min = np.inf
        self._max = -np.inf

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def update(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if not len(values):
            return self
        self._min = min(self._min, float(values.min()))
        self._max = max(self._max, float(values.max()))
        means = np.concatenate([self.means, values])
        weights = np.concatenate([self.weights, np.ones(len(values))])
        self.means, self.weights = _compress(means, weights, self.compression)
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.n == 0:
            return self
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        self.means, self.weights = _compress(means, weights, self.compression)
        return self

    def quantile(self, q: float) -> float | None:
        if len(self.means) == 0:
            return None
        if len(self.means) == 1:
            return float(self.means[0])
        n = self.n
        target = q * n
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return self._min if np.isfinite(self._min) else float(self.means[0])
        if target >= cum[-1]:
            return self._max if np.isfinite(self._max) else float(self.means[-1])
        i = int(np.searchsorted(cum, target))
        x0, x1 = cum[i - 1], cum[i]
        m0, m1 = self.means[i - 1], self.means[i]
        frac = (target - x0) / (x1 - x0) if x1 > x0 else 0.0
        return float(m0 + frac * (m1 - m0))

    def to_state(self) -> dict:
        return {
            "compression": self.compression,
            "means": self.means,
            "weights": self.weights,
            "min": self._min,
            "max": self._max,
        }

    @classmethod
    def from_state(cls, s: dict) -> "TDigest":
        d = cls(s["compression"])
        d.means = np.asarray(s["means"], dtype=np.float64)
        d.weights = np.asarray(s["weights"], dtype=np.float64)
        d._min = float(s["min"])
        d._max = float(s["max"])
        return d


def _compress(means: np.ndarray, weights: np.ndarray, compression: int):
    """Cluster sorted centroids by their position on the k1 (arcsine)
    scale function — fully vectorized (no Python loop over values):
    each item is assigned to cluster floor(k(q_mid)); items sharing a
    cluster are merged by weighted mean. k spans [0, compression/2], so
    the digest holds at most ~compression/2 + 1 centroids."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    cum = np.cumsum(weights)
    q_mid = np.clip((cum - weights / 2.0) / total, 0.0, 1.0)
    k = compression / (2.0 * np.pi) * (
        np.arcsin(2.0 * q_mid - 1.0) + np.pi / 2.0
    )
    group = np.floor(k).astype(np.int64)
    ng = int(group[-1]) + 1
    w = np.bincount(group, weights=weights, minlength=ng)
    m = np.bincount(group, weights=weights * means, minlength=ng)
    nz = w > 0
    return m[nz] / w[nz], w[nz]
