from . import hashing, windows, table, bloom, sortcount, skm  # noqa: F401
