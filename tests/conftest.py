"""Test config: force CPU with 8 virtual devices for sharding tests.

Must run before any jax import (hence module-top env mutation here).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin registers itself even under JAX_PLATFORMS=cpu and
# its register() force-sets jax_platforms="axon,cpu" from sitecustomize —
# so the first jax.devices() call would initialize (and, when the TPU
# tunnel is down, hang on) the axon backend.  Force the platform list
# back to cpu BEFORE any backend initialization.
import jax  # noqa: E402

from kaarme_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env(default="cpu")
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
