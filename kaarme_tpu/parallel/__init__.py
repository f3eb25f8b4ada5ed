from .sharded import ShardedCounterConfig, ShardedKmerCounter, make_mesh  # noqa: F401
