from .checkpoint import PartitionManifest, RunState

__all__ = ["PartitionManifest", "RunState"]
