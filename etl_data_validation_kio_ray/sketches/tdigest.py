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
    """Sort centroids and greedily merge neighbours under the k1
    (arcsine) scale-function size bound."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_means: list[float] = []
    out_weights: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    cum = 0.0  # weight fully to the left of the current centroid
    for m, w in zip(means[1:], weights[1:]):
        q0 = cum / total
        q1 = (cum + cur_w + w) / total
        # k1 size bound: merge while the combined centroid spans less
        # than one unit of k-space
        dk = compression / (2.0 * np.pi) * (
            np.arcsin(2.0 * min(1.0, q1) - 1.0) - np.arcsin(2.0 * q0 - 1.0)
        )
        if dk <= 1.0:
            new_w = cur_w + w
            cur_m += (m - cur_m) * (w / new_w)
            cur_w = new_w
        else:
            out_means.append(cur_m)
            out_weights.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m), float(w)
    out_means.append(cur_m)
    out_weights.append(cur_w)
    return np.asarray(out_means), np.asarray(out_weights)
