"""Unit tests for the bench-side host instrumentation (no Ray needed).

bench.py records busy/steal core-seconds per timed window and
tools/hw_probe.py measures the host's 1-vs-N per-core envelope; both
feed the scaling report's physics evidence (see BASELINE.md round 4).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_read_proc_stat_monotonic_and_shaped():
    import bench

    a = bench._read_proc_stat()
    assert set(a) == {"busy", "steal"}
    assert a["busy"] > 0 and a["steal"] >= 0
    x = 0
    for i in range(2_000_000):  # burn a little CPU between reads
        x += i
    b = bench._read_proc_stat()
    assert b["busy"] >= a["busy"]
    assert b["steal"] >= a["steal"]


def test_hw_probe_shape(monkeypatch):
    import hw_probe

    monkeypatch.setattr(hw_probe, "SPIN_ITERS", 200_000)
    monkeypatch.setattr(hw_probe, "STREAM_MB", 8)
    monkeypatch.setattr(hw_probe, "STREAM_REPEATS", 1)
    out = hw_probe.probe(2)
    assert out["n_hi"] == 2
    for kind in ("spin", "stream"):
        assert out[f"{kind}_1proc"] > 0
        assert out[f"{kind}_per_core_at_2"] > 0
        assert out[f"{kind}_ratio"] > 0
    # mixes interpolate between the two ratios
    assert out["ceiling_mix_100cpu"] == out["spin_ratio"]
    lo, hi = sorted((out["spin_ratio"], out["stream_ratio"]))
    assert lo - 1e-9 <= out["ceiling_mix_50cpu"] <= hi + 1e-9
