"""Actor-pool sizing guard.

An actor pool that claims EVERY cluster CPU starves the operators
feeding it: observed wedge on a 4-CPU session where
``map_batches(Cls, concurrency=4)`` held all cores while the upstream
``Repartition`` waited for one, and the actors waited for its output.
Clamp requested pool size to leave headroom for non-actor operators —
a no-op on real clusters, a deadlock guard on small sessions.
"""

from __future__ import annotations


def clamp_actor_concurrency(requested: int) -> int:
    """min(requested, total_cpus - 1), floored at 1. Returns
    ``requested`` untouched when Ray is not initialised (the pool will
    size itself after auto-init)."""
    try:
        import ray

        if not ray.is_initialized():
            return max(1, requested)
        total = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        return max(1, requested)
    if total <= 1:
        return 1
    return max(1, min(requested, total - 1))
