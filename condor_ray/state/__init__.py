from .store import PartitionStateStore

__all__ = ["PartitionStateStore"]
