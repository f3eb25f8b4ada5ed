from .counter import CounterConfig, KmerCounter  # noqa: F401
from .sort_counter import SortCounterConfig, SortKmerCounter  # noqa: F401
