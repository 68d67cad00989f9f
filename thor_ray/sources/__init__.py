from .binlog import max_lsn, read_ddl_events, read_epoch, safe_frontier, shard_frontiers
from .lake import merge_state_frames, read_lake, read_lineage, read_partition_state

__all__ = [
    "max_lsn", "read_ddl_events", "read_epoch", "safe_frontier",
    "shard_frontiers", "merge_state_frames", "read_lake", "read_lineage",
    "read_partition_state",
]
