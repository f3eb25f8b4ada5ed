import numpy as np
import pytest

import jax.numpy as jnp

from kaarme_tpu.ops import windows
from kaarme_tpu.utils import codec


def _random_codes(n, seed, p_invalid=0.0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    if p_invalid:
        bad = rng.random(n) < p_invalid
        codes[bad] = 4
    return codes


@pytest.mark.parametrize("k", [3, 15, 16, 17, 31, 32, 33, 51, 63])
def test_windows_match_golden(k):
    codes = _random_codes(400, seed=k, p_invalid=0.03)
    keys, valid = windows.canonical_windows(jnp.asarray(codes), k)
    keys = np.stack([np.asarray(kw) for kw in keys], axis=1)
    valid = np.asarray(valid)

    s = codec.decode_codes(codes)
    p = len(codes) - k + 1
    assert valid.shape[0] == p
    for t in range(p):
        window = s[t : t + k]
        if "N" in window:
            assert not valid[t]
        else:
            assert valid[t]
            expect = codec.canonical(window)
            got = codec.unpack_kmer(keys[t], k)
            assert got == expect, f"pos {t}: {got} != {expect}"


def test_windows_2d_tiles():
    k = 5
    codes = _random_codes(2 * 36, seed=1).reshape(2, 36)
    keys, valid = windows.canonical_windows(jnp.asarray(codes), k)
    assert keys[0].shape == (2, 32)
    assert valid.shape == (2, 32)
    # each row independently equals the 1d result
    for r in range(2):
        keys1, valid1 = windows.canonical_windows(jnp.asarray(codes[r]), k)
        np.testing.assert_array_equal(np.asarray(keys[0][r]), np.asarray(keys1[0]))
        np.testing.assert_array_equal(np.asarray(valid[r]), np.asarray(valid1))


def test_revcomp_invariance():
    """count(seq) must equal count(revcomp(seq)) canonical-wise."""
    k = 9
    codes = _random_codes(200, seed=42)
    s = codec.decode_codes(codes)
    rc = codec.revcomp(s)
    rc_codes = codec.encode_plain(rc.encode())

    keys_f, _ = windows.canonical_windows(jnp.asarray(codes), k)
    keys_r, _ = windows.canonical_windows(jnp.asarray(rc_codes), k)
    f = sorted(map(tuple, np.stack([np.asarray(x) for x in keys_f], 1).tolist()))
    r = sorted(map(tuple, np.stack([np.asarray(x) for x in keys_r], 1).tolist()))
    assert f == r


def test_hash_is_deterministic_and_mixes():
    k = 31
    codes = _random_codes(3000, seed=3)
    keys, valid, h = windows.windows_with_hash(jnp.asarray(codes), k)
    h = np.asarray(h)[np.asarray(valid)]
    # low bits should be close to uniform
    frac_odd = float((h & 1).mean())
    assert 0.45 < frac_odd < 0.55
