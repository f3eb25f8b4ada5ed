from . import codec, mathutils  # noqa: F401
