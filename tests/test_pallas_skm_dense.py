"""Dense (global-cursor) skm segmentation kernel — interpreter-mode
pins vs the NumPy mirror and the slotted kernel, plus the driver's
capacity overflow-replay contract.  The COMPILED kernel is pinned
on-chip by bench --verify (golden_equality_skm rows run the dense
path by default on TPU)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from kaarme_tpu.ops import pallas_skm, skm, sortcount
from kaarme_tpu.utils import codec
from kaarme_tpu.models.skm_counter import SkmCounter, SkmCounterConfig
from bench import make_reads


def _codes_in(codes_u8):
    inv = (codes_u8 >= 4).astype(np.uint32)
    return jnp.asarray((codes_u8 & 3).astype(np.uint32) | (inv << 2))


def _live_dict(cols):
    arr = np.stack([np.asarray(c) for c in cols], axis=1)
    live = arr[:, -1] != 0xFFFFFFFF
    got = {}
    for r in arr[live]:
        key = tuple(int(x) for x in r[:-1]) \
            + (int(r[-1]) & ~((1 << 26) - 1),)
        got[key] = got.get(key, 0) + (int(r[-1]) & ((1 << 26) - 1))
    return got, live


@pytest.mark.parametrize("k,n", [(31, 1 << 15), (51, 1 << 15)])
def test_dense_rows_match_numpy_mirror(k, n):
    rng = np.random.default_rng(11)
    codes_u8 = rng.integers(0, 4, n + k - 1).astype(np.uint8)
    codes_u8[::151] = 4          # read separators
    codes_u8[1000:1003] = 5      # an N patch
    mirror = skm.run_rows_np(codes_u8, k, n)
    cap = sortcount.next_store_size(n // 8)
    cols, ndv = pallas_skm.run_rows_dense_pallas(
        _codes_in(codes_u8), k=k, n=n, cap=cap, interpret=True)
    rows_exact, rows_used = int(ndv[0]), int(ndv[1])
    got, live = _live_dict(cols)
    assert rows_used <= cap
    assert live.sum() == rows_exact
    assert not live[rows_used:].any()
    assert got == mirror


def test_dense_multiblock_and_residual_carry():
    """4 sequential blocks; live counts not a multiple of 128 exercise
    the cross-block residual row."""
    k, n = 31, 1 << 17
    rng = np.random.default_rng(3)
    codes_u8 = rng.integers(0, 4, n + k - 1).astype(np.uint8)
    codes_u8[::151] = 4
    mirror = skm.run_rows_np(codes_u8, k, n)
    cap = sortcount.next_store_size(n // 8)
    cols, ndv = pallas_skm.run_rows_dense_pallas(
        _codes_in(codes_u8), k=k, n=n, cap=cap, interpret=True)
    got, live = _live_dict(cols)
    assert got == mirror
    assert int(ndv[0]) % 128 != 0          # residual actually exercised
    # dense layout: every row below rows_exact's full-row floor is live
    assert live[: (int(ndv[0]) // 128) * 128].all()


def test_dense_equals_slotted_live_rows():
    from collections import Counter

    k, n = 51, 1 << 15
    rng = np.random.default_rng(7)
    codes_u8 = rng.integers(0, 4, n + k - 1).astype(np.uint8)
    codes_u8[::97] = 4
    ci = _codes_in(codes_u8)
    cap = sortcount.next_store_size(n // 4)
    dcols, _ = pallas_skm.run_rows_dense_pallas(
        ci, k=k, n=n, cap=cap, interpret=True)
    scols, _ = pallas_skm.run_rows_slotted_pallas(
        ci, k=k, n=n, S=96, interpret=True)
    da = np.stack([np.asarray(c) for c in dcols], axis=1)
    sa = np.stack([np.asarray(c) for c in scols], axis=1)
    a = Counter(map(tuple, da[da[:, -1] != 0xFFFFFFFF].tolist()))
    b = Counter(map(tuple, sa[sa[:, -1] != 0xFFFFFFFF].tolist()))
    assert a == b


def test_dense_overflow_reported():
    k, n = 31, 1 << 17
    rng = np.random.default_rng(3)
    codes_u8 = rng.integers(0, 4, n + k - 1).astype(np.uint8)
    codes_u8[::151] = 4
    cols, ndv = pallas_skm.run_rows_dense_pallas(
        _codes_in(codes_u8), k=k, n=n, cap=1024, interpret=True)
    assert int(ndv[1]) > 1024          # caller must replay


def test_counter_dense_interpret_golden():
    codes = make_reads(0.12, 6, 150, seed=9)
    golden = codec.golden_count(codes, 31)
    cfg = SkmCounterConfig(
        k=31, batch_windows=1 << 14, rows=1 << 9, superbatch_batches=2,
        prefix_cap=1 << 15, min_abundance=1, segpack="dense_interpret",
        compactor="interpret")
    c = SkmCounter(cfg).count_codes(codes)
    assert c.as_dict() == golden


def test_counter_dense_overflow_replay_golden():
    """An absurdly small capacity fraction forces the rows_used > eff
    replay; output equality must survive it."""
    codes = make_reads(0.12, 6, 150, seed=9)
    golden = codec.golden_count(codes, 31)
    cfg = SkmCounterConfig(
        k=31, batch_windows=1 << 16, rows=1 << 9, superbatch_batches=2,
        prefix_cap=1 << 15, min_abundance=1, segpack="dense_interpret",
        compactor="interpret", skm_cap_frac=4096)
    c = SkmCounter(cfg).count_codes(codes)
    assert c.as_dict() == golden
    assert c.stats["slot_grow_events"] >= 1
