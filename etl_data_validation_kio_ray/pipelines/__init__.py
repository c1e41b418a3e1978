from .validate import ValidationPipeline, RunResult
from .crosscheck import cross_check_run
from .relational import (
    asof_join,
    broadcast_anti_join,
    broadcast_lookup_join,
    broadcast_semi_join,
    grouped_agg,
    hash_join,
    hash_partitioned_anti_keys,
    interval_join,
    key_set_reconcile,
    latest_per_key,
    session_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "ValidationPipeline",
    "RunResult",
    "cross_check_run",
    "asof_join",
    "broadcast_anti_join",
    "broadcast_semi_join",
    "broadcast_lookup_join",
    "grouped_agg",
    "hash_join",
    "hash_partitioned_anti_keys",
    "interval_join",
    "key_set_reconcile",
    "latest_per_key",
    "session_window_agg",
    "tumbling_window_agg",
]
