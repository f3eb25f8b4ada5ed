from . import hashing, windows, table, bloom, sortcount, pallas_windows  # noqa: F401
