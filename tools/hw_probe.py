"""Hardware-envelope probe: what scaling can this host deliver RIGHT NOW?

Measures, independently of any pipeline code, the per-core speed the
host gives a 1-process job vs an N-process job (default N=4):

  * spin  — a pure-CPU integer-hash loop (zero memory traffic, fits in
    registers/L1). Per-core slowdown at N procs == frequency effect
    (single-core turbo vs all-core clocks); there is nothing else it
    can be.
  * stream — a numpy big-array triad (memory-bandwidth bound). Per-core
    slowdown at N procs == shared-bus bandwidth contention.

The product of work-mix-weighted ratios is the HARDWARE ceiling on the
scaling efficiency any perfectly-parallel job can measure on this VM at
1-vs-N CPUs. A pipeline measuring at or above this ceiling is scaling
as well as the hardware allows; the north rule's >=0.8 presumes nodes
that bring their own clocks and buses (a real cluster), which a
single-bus VM with turbo does not.

Usage: python tools/hw_probe.py [N]      (default 4)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

SPIN_ITERS = 20_000_000
STREAM_MB = 256
STREAM_REPEATS = 3


def _spin(iters: int = SPIN_ITERS) -> float:
    """Pure-register integer loop; returns iterations/sec."""
    x = 1
    t0 = time.perf_counter()
    for _ in range(iters):
        x = (x * 2862933555777941757 + 3037000493) & 0xFFFFFFFFFFFFFFFF
    return iters / (time.perf_counter() - t0)


def _stream(mb: int = STREAM_MB, repeats: int = STREAM_REPEATS) -> float:
    """Memory-bandwidth triad a[:] = b + s*c over arrays far larger than
    LLC; returns effective GB/s moved (3 arrays touched per pass)."""
    import numpy as np

    n = mb * 1024 * 1024 // 8
    b = np.ones(n)
    c = np.ones(n)
    a = np.empty(n)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
        dt = time.perf_counter() - t0
        best = max(best, 3 * n * 8 / dt / 1e9)
    return best


def _run_level(kind: str, nprocs: int) -> list[float]:
    fn = _spin if kind == "spin" else _stream
    if nprocs == 1:
        return [fn()]
    with mp.get_context("spawn").Pool(nprocs) as pool:
        # one task per worker, all started together
        return pool.starmap(fn, [()] * nprocs)


def probe(n_hi: int = 4) -> dict:
    out: dict = {"n_hi": n_hi}
    for kind in ("spin", "stream"):
        one = _run_level(kind, 1)[0]
        many = _run_level(kind, n_hi)
        per_core_ratio = (sum(many) / len(many)) / one
        out[f"{kind}_1proc"] = round(one, 1)
        out[f"{kind}_per_core_at_{n_hi}"] = round(sum(many) / len(many), 1)
        out[f"{kind}_ratio"] = round(per_core_ratio, 3)
    # ceiling for a job that is `w_cpu` compute-bound and the rest
    # bandwidth-bound (the validation narrow pass is mostly compute
    # with Arrow decode traffic; report a few mixes)
    for w_cpu in (1.0, 0.7, 0.5):
        ceil = w_cpu * out["spin_ratio"] + (1 - w_cpu) * out["stream_ratio"]
        out[f"ceiling_mix_{int(w_cpu * 100)}cpu"] = round(ceil, 3)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(json.dumps(probe(n)))
