"""Sharded super-k-mer counter (kaarme_tpu/parallel/sharded_skm.py):
golden equality over the 8-virtual-device mesh, expand-then-exchange
finalize, slot/capacity growth replays, checkpoint roundtrip."""

import numpy as np
import pytest

from kaarme_tpu.parallel.sharded import make_mesh
from kaarme_tpu.parallel.sharded_skm import ShardedSkmConfig, ShardedSkmCounter
from kaarme_tpu.utils import codec


def _counter(k, ndev=8, **kw):
    kw.setdefault("batch_windows", 1 << 10)
    kw.setdefault("rows", 1 << 5)
    kw.setdefault("prefix_cap", 1 << 12)
    kw.setdefault("min_abundance", 1)
    return ShardedSkmCounter(ShardedSkmConfig(k=k, **kw), make_mesh(ndev))


def _coverage_stream(rng, glen, n_reads, read_len):
    genome = rng.integers(0, 4, size=glen).astype(np.uint8)
    parts = []
    for _ in range(n_reads):
        s = int(rng.integers(0, glen - read_len))
        parts.append(genome[s: s + read_len])
        parts.append(np.full(1, 4, np.uint8))
    return np.concatenate(parts)


@pytest.mark.parametrize("k", [17, 31, 51])
def test_sharded_skm_golden_equality(k):
    rng = np.random.default_rng(k)
    codes = _coverage_stream(rng, 900, 250, 100)
    c = _counter(k).count_codes(codes)
    assert c.as_dict() == codec.golden_count(codes, k)


def test_sharded_skm_matches_single_device_skm():
    from kaarme_tpu.models.skm_counter import SkmCounter, SkmCounterConfig

    k = 31
    rng = np.random.default_rng(5)
    codes = _coverage_stream(rng, 1200, 300, 90)
    sharded = _counter(k).count_codes(codes).as_dict()
    single = SkmCounter(SkmCounterConfig(
        k=k, batch_windows=1 << 12, rows=1 << 6, prefix_cap=1 << 13,
        min_abundance=1)).count_codes(codes).as_dict()
    assert sharded == single


def test_sharded_skm_multi_round_and_find(tmp_path):
    k = 21
    rng = np.random.default_rng(7)
    codes = _coverage_stream(rng, 700, 400, 80)   # several rounds at 2^10
    c = _counter(k)
    # stream in two pieces (cross-call buffering)
    cut = len(codes) // 2
    c.add_codes(codes[:cut])
    c.add_codes(codes[cut:])
    c.finish()
    golden = codec.golden_count(codes, k)
    assert c.as_dict() == golden
    some = list(golden)[:5]
    assert c.find(some) == [golden[s] for s in some]
    out = tmp_path / "skm_sharded.out"
    n = c.write_output(str(out))
    got = {ln.split()[0]: int(ln.split()[1])
           for ln in out.read_text().splitlines()}
    assert n == len(golden) and got == golden


def test_sharded_skm_slot_growth_replay():
    """Adversarial minimizer churn (alternating random blocks) forces
    tiles with more run starts than a tiny S — the ladder must grow and
    replay to exactness."""
    k = 17
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=20000).astype(np.uint8)
    c = _counter(k, skm_slots=8)
    c.count_codes(codes)
    assert c.stats["slot_grow_events"] >= 1
    assert c.as_dict() == codec.golden_count(codes, k)


def test_sharded_skm_store_growth_replay():
    k = 17
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=30000).astype(np.uint8)
    c = _counter(k, prefix_cap=1 << 8)   # force capacity growth
    c.count_codes(codes)
    assert c.stats["grow_events"] >= 1
    assert c.as_dict() == codec.golden_count(codes, k)


def test_sharded_skm_checkpoint_roundtrip(tmp_path):
    k = 31
    rng = np.random.default_rng(13)
    codes = _coverage_stream(rng, 800, 200, 90)
    c = _counter(k)
    cut = np.flatnonzero(codes >= 4)
    cutpos = int(cut[len(cut) // 2]) + 1
    c.count_codes(codes[:cutpos])
    p = str(tmp_path / "skm_sharded.npz")
    c.save(p)
    c2 = ShardedSkmCounter.load(
        p, ShardedSkmConfig(k=k, batch_windows=1 << 10, rows=1 << 5,
                            prefix_cap=1 << 12, min_abundance=1),
        make_mesh(4))   # resume on a DIFFERENT mesh size
    c2.count_codes(codes[cutpos:])
    assert c2.as_dict() == codec.golden_count(codes, k)
