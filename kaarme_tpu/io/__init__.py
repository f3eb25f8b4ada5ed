from .reader import CodeChunkReader, sniff_format  # noqa: F401
