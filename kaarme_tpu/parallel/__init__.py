"""Device-mesh and multi-host parallelism.

Lazy re-exports (PEP 562): the submodules build jnp constants at import
time, which initializes the XLA backend — that must NOT happen before
``jax.distributed.initialize`` in multi-host launchers
(``python -m kaarme_tpu.parallel.multihost``).
"""

_EXPORTS = {
    "ShardedCounterConfig": "sharded",
    "ShardedKmerCounter": "sharded",
    "make_mesh": "sharded",
    "ShardedSortConfig": "sharded_sort",
    "ShardedSortCounter": "sharded_sort",
    "MultiHostSortCounter": "multihost",
    "HostSpanReader": "multihost",
    "init_distributed": "multihost",
    "global_mesh": "multihost",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(f".{_EXPORTS[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
