from .sharded import ShardedCounterConfig, ShardedKmerCounter, make_mesh  # noqa: F401
from .sharded_sort import ShardedSortConfig, ShardedSortCounter  # noqa: F401
