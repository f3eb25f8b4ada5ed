from .counter import CounterConfig, KmerCounter  # noqa: F401
