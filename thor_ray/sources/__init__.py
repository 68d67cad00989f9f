from .binlog import max_lsn, read_ddl_events, read_epoch
from .lake import read_lake, read_partition_state

__all__ = ["max_lsn", "read_ddl_events", "read_epoch", "read_lake", "read_partition_state"]
