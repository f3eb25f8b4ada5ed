from . import hashing, windows, table, bloom  # noqa: F401
