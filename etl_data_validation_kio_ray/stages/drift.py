"""Distribution-drift rule: KS / PSI against a baseline snapshot.

Analog of the reference's baseline-vs-iteration mart snapshot diff
(/root/reference/src/app2/experiments/run.py:490-501 captures the
baseline once; /root/reference/src/app2/experiments/report.py:546-706
diffs every iteration against it). Their diff is exact row matching on
200-row snapshots; at 10^12 rows the comparable artifact is a binned
distribution snapshot (FIXTURES.md F3): global + per-partition n_tok
histograms (64 bins) and per-source token-value histograms (256 bins).

The snapshot is produced by the same RuleEngine stats pass (its
``column_stats`` partials), merged and persisted; scoring compares the
current run's merged histograms against it. Unlike the reference —
which silently skips views that error during snapshotting
(report.py:687-693) — a snapshot/schema mismatch here FAILS the drift
check loudly (SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

from ..sketches import FixedHistogram
from ..sketches.hist import ks_stat, psi

SNAPSHOT_VERSION = 1


def build_baseline_snapshot(
    merged_stats: dict[str, dict],
    out_dir: str,
    *,
    meta: dict | None = None,
) -> str:
    """Persist merged column_stats (per partition + '__global__') as the
    versioned drift baseline. ``merged_stats[partition]`` holds keys
    ``n_tok_fixed`` and ``token_hists`` (see RuleEngine._rule_stats)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "version": SNAPSHOT_VERSION,
        "stats": merged_stats,
        "meta": meta or {},
    }
    tmp = os.path.join(out_dir, "snapshot.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, os.path.join(out_dir, "snapshot.pkl"))
    manifest = {
        "version": SNAPSHOT_VERSION,
        "partitions": sorted(k for k in merged_stats if k != "__global__"),
        **(meta or {}),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


def load_baseline_snapshot(snapshot_dir: str) -> dict:
    path = os.path.join(snapshot_dir, "snapshot.pkl")
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("version") != SNAPSHOT_VERSION:
        raise ValueError(
            f"baseline snapshot version {payload.get('version')} != {SNAPSHOT_VERSION}"
        )
    return payload


def score_drift(
    current: dict[str, dict],
    baseline: dict,
    *,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.15,
) -> dict[str, dict]:
    """Per-partition (and global) KS on n_tok + max per-source PSI on
    token-value histograms. Returns {partition: {ks_n_tok, psi_tokens,
    drifted, detail}}; raises on baseline shape mismatch."""
    base_stats = baseline["stats"]
    out: dict[str, dict] = {}
    for part, cur in current.items():
        base = base_stats.get(part) or base_stats.get("__global__")
        if base is None:
            raise ValueError(f"baseline snapshot has no stats for partition {part!r}")
        res: dict = {"ks_n_tok": 0.0, "psi_tokens": 0.0, "per_source_psi": {}}
        if "n_tok_fixed" in cur and "n_tok_fixed" in base:
            ch = FixedHistogram.from_state(cur["n_tok_fixed"])
            bh = FixedHistogram.from_state(base["n_tok_fixed"])
            res["ks_n_tok"] = ks_stat(bh, ch)
        cur_th = cur.get("token_hists") or {}
        base_th = base.get("token_hists") or {}
        worst = 0.0
        for src, state in cur_th.items():
            if src not in base_th:
                # unseen source: referential rule flags it; drift treats
                # it as maximal shift
                res["per_source_psi"][src] = float("inf")
                worst = float("inf")
                continue
            v = psi(
                FixedHistogram.from_state(base_th[src]),
                FixedHistogram.from_state(state),
            )
            res["per_source_psi"][src] = v
            worst = max(worst, v)
        res["psi_tokens"] = worst
        res["drifted"] = bool(
            res["ks_n_tok"] > ks_threshold or res["psi_tokens"] > psi_threshold
        )
        out[part] = res
    return out
