"""Pallas window-keys kernel vs the XLA reference (interpreter mode on CPU)."""

import numpy as np
import pytest

from kaarme_tpu.ops import sortcount
from kaarme_tpu.ops.pallas_windows import BR, window_keys_pallas


@pytest.mark.parametrize("k", [13, 16, 31, 32, 51, 63])
def test_pallas_matches_xla(k):
    import jax.numpy as jnp

    rng = np.random.default_rng(k)
    n = BR * 128
    codes = rng.integers(0, 4, size=n + k - 1).astype(np.uint8)
    codes[rng.random(n + k - 1) < 0.02] = 4
    p, m = sortcount.pack_stream_np(codes)
    pj, mj = jnp.asarray(p), jnp.asarray(m)
    ref = sortcount.window_keys(pj, mj, k, n, 1 << 7)
    got = window_keys_pallas(pj, mj, k=k, n=n)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_rejects_bad_n():
    import jax.numpy as jnp

    with pytest.raises(ValueError):
        window_keys_pallas(jnp.zeros(8, jnp.uint32), jnp.zeros(4, jnp.uint32),
                           k=13, n=100)
