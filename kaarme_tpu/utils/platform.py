"""Platform pinning shared by every entry point.

The axon TPU plugin's sitecustomize force-sets
``jax_platforms="axon,cpu"`` in EVERY python process, overriding the
``JAX_PLATFORMS`` environment variable.  A CPU-pinned run (tests, the
CLI under ``JAX_PLATFORMS=cpu``, the driver's multichip dry run,
multi-host CPU workers, profiling scripts) would then still initialize
the TPU backend on first device use — and hang whenever the TPU tunnel
is unreachable.  Call :func:`pin_platform_from_env` before the first
backend initialization to restore the env var's intent.
"""

from __future__ import annotations

import os


def pin_platform_from_env(default: str | None = None) -> str:
    """Force ``jax_platforms`` back to the ``JAX_PLATFORMS`` env value
    (or ``default`` when the env var is unset/empty).  Returns the
    applied value ("" when nothing was pinned).  Safe to call multiple
    times and before/after ``import jax``; never raises."""
    value = os.environ.get("JAX_PLATFORMS", "").strip() or (default or "")
    if not value:
        return ""
    try:
        import jax

        jax.config.update("jax_platforms", value)
    except Exception:
        return ""
    return value
