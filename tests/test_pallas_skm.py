"""Fused segmentation + slot-pack kernel (ops/pallas_skm.py):
interpreter-mode bit-equality against the XLA run_rows + pack_slots
formulation (the compiled path is pinned on-chip by bench --verify)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kaarme_tpu.ops import pallas_skm, skm, sortcount

BLK = 128 * 128   # small block for fast interpreter runs


def _stream(rng, n, k, p_sep=0.01, glen=600, read_len=120):
    """Coverage-shaped code stream (duplicated loci => real run dedup)."""
    genome = rng.integers(0, 4, size=glen).astype(np.uint8)
    parts, tot = [], 0
    while tot < n + k:
        s = int(rng.integers(0, glen - read_len))
        r = genome[s: s + read_len].copy()
        bad = rng.random(read_len) < p_sep
        r[bad] = 4
        parts.append(r)
        parts.append(np.full(1, 4, np.uint8))
        tot += read_len + 1
    return np.concatenate(parts)[: n + k - 1]


def _xla_slotted(codes, k, n, S):
    packed, maskw = sortcount.pack_stream_np(codes)
    Wc = skm.content_words(k)
    need_words = (n + 16 * (Wc - 1)) // 16 + 2
    pk = jnp.concatenate([
        jnp.asarray(packed),
        jnp.zeros((max(0, need_words - packed.shape[0]),), jnp.uint32)])
    inval = sortcount.invalid_from_dense(jnp.asarray(maskw), n + k - 1)
    b, cols = skm.run_rows(pk, inval, k, n)
    return skm.pack_slots(b, cols, n, S, k)


def _kernel_slotted(codes, k, n, S, block_rows=128):
    packed, maskw = sortcount.pack_stream_np(codes)
    cod = sortcount.unpack_codes(jnp.asarray(packed), jnp.asarray(maskw),
                                 n + k - 1)
    return pallas_skm.run_rows_slotted_pallas(
        cod, k=k, n=n, S=S, block_rows=block_rows, interpret=True)


@pytest.mark.parametrize("k", [16, 31, 51])
def test_kernel_matches_xla_bitwise(k):
    n, S = 2 * BLK, 16
    rng = np.random.default_rng(k)
    codes = _stream(rng, n, k)
    xs, xmax = _xla_slotted(codes, k, n, S)
    ks, kmax = _kernel_slotted(codes, k, n, S)
    assert int(xmax) == int(kmax)
    for a, b in zip(xs, ks):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernel_slot_overflow_parity():
    """Random stream (minimizer churn) with a tiny S: dropped rows and
    the max-runs report must match the XLA packer exactly."""
    k, n, S = 17, BLK, 4
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=n + k - 1).astype(np.uint8)
    xs, xmax = _xla_slotted(codes, k, n, S)
    ks, kmax = _kernel_slotted(codes, k, n, S)
    assert int(xmax) == int(kmax) and int(xmax) > S
    for a, b in zip(xs, ks):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernel_long_runs_cross_blocks():
    """Low-complexity input: runs span block boundaries, exercising the
    SMEM carries (prev minv/valid, last true start) and the LMAX force
    cascade."""
    k, n, S = 31, 2 * BLK, 96
    base = np.zeros(n + k - 1, np.uint8)           # poly-A
    base[n // 2] = 4                               # one separator
    xs, xmax = _xla_slotted(base, k, n, S)
    ks, kmax = _kernel_slotted(base, k, n, S)
    assert int(xmax) == int(kmax)
    for a, b in zip(xs, ks):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_superstep_segpack_interpret_golden():
    """Full superstep with segpack=pallas_interpret: golden equality
    through the counter against the XLA segpack."""
    from kaarme_tpu.models.skm_counter import SkmCounter, SkmCounterConfig
    from kaarme_tpu.utils import codec

    k = 31
    rng = np.random.default_rng(9)
    codes = _stream(rng, 40000, k, glen=900, read_len=100)
    golden = codec.golden_count(codes, k)
    cfg = SkmCounterConfig(
        k=k, batch_windows=BLK, rows=1 << 7, superbatch_batches=1,
        prefix_cap=1 << 13, min_abundance=1, segpack="pallas_interpret",
        compactor="xla")
    got = SkmCounter(cfg).count_codes(codes).as_dict()
    assert got == golden


def test_kernel_sparse_late_tiles():
    """Coverage-1 reads (unique content, separator every 151 bases):
    tiles whose few starts sit LATE, followed by tiles with early
    starts — the single-stage compaction's non-monotone distance
    regime (dropped rows on first on-chip run; two-stage fix)."""
    from bench import make_reads

    k, n, S = 51, 2 * BLK, 96
    codes = make_reads(n / 1e6 / 0.66, 1, 150)[: n + k - 1]
    codes = np.concatenate(
        [codes, np.full(max(0, n + k - 1 - codes.shape[0]), 4, np.uint8)])
    xs, xmax = _xla_slotted(codes, k, n, S)
    ks, kmax = _kernel_slotted(codes, k, n, S)
    assert int(xmax) == int(kmax)
    for a, b in zip(xs, ks):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
