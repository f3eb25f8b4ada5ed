import numpy as np
import pytest

import jax

from kaarme_tpu.models.counter import CounterConfig, KmerCounter
from kaarme_tpu.parallel.sharded import (
    ShardedCounterConfig,
    ShardedKmerCounter,
    make_mesh,
)
from kaarme_tpu.utils import codec


@pytest.fixture(scope="module")
def mesh8():
    try:
        return make_mesh(8)
    except ValueError:
        pytest.skip("needs 8 (virtual) devices")


def _codes(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    codes[rng.random(n) < 0.005] = 4
    return codes


def test_sharded_matches_single_device(mesh8):
    k = 13
    codes = _codes()
    scfg = ShardedCounterConfig(k=k, min_slots=1 << 13, tile=128, batch_tiles=8,
                                min_abundance=1)
    sc = ShardedKmerCounter(scfg, mesh8).count_codes(codes)
    golden = codec.golden_count(codes, k)
    assert sc.as_dict() == golden

    cfg = CounterConfig(k=k, min_slots=1 << 13, tile=128, batch_tiles=8,
                        min_abundance=1)
    single = KmerCounter(cfg).count_codes(codes)
    assert sc.as_dict() == single.as_dict()


def test_sharded_multiword_keys(mesh8):
    k = 51
    codes = _codes(4000, seed=1)
    scfg = ShardedCounterConfig(k=k, min_slots=1 << 13, tile=128, batch_tiles=8,
                                min_abundance=1)
    sc = ShardedKmerCounter(scfg, mesh8).count_codes(codes)
    assert sc.as_dict() == codec.golden_count(codes, k)


def test_sharded_find(mesh8):
    k = 9
    codes = codec.encode_plain(b"ACGTACGTACGTACGT")
    scfg = ShardedCounterConfig(k=k, min_slots=1 << 12, tile=64, batch_tiles=8,
                                min_abundance=1)
    sc = ShardedKmerCounter(scfg, mesh8).count_codes(codes)
    golden = codec.golden_count(codes, k)
    for s, n in golden.items():
        assert sc.find(s) == [n]
        assert sc.find(codec.revcomp(s)) == [n]
    assert sc.find("A" * k) == [0]
    assert sc.find("A" * (k - 1)) == [-1]


def test_sharded_skewed_input_no_drops(mesh8):
    # all windows identical: worst-case routing skew (everything to one owner)
    k = 9
    codes = codec.encode_plain(b"A" * 2000)
    scfg = ShardedCounterConfig(k=k, min_slots=1 << 12, tile=64, batch_tiles=8,
                                min_abundance=1)
    sc = ShardedKmerCounter(scfg, mesh8).count_codes(codes)
    assert sc.as_dict() == {"A" * k: 2000 - k + 1}


def test_sharded_table_growth(mesh8):
    """Overflow grows the sharded table and retries instead of raising
    (the reference exits; source/kmer_hash_table.cpp:2553-2556)."""
    k = 9
    codes = _codes(60000, seed=7)
    scfg = ShardedCounterConfig(k=k, min_slots=1 << 9, tile=128, batch_tiles=8,
                                min_abundance=1, max_probes=8)
    sc = ShardedKmerCounter(scfg, mesh8).count_codes(codes)
    assert sc.stats["grow_events"] >= 1
    assert sc.as_dict() == codec.golden_count(codes, k)


def test_sharded_table_checkpoint_roundtrip(mesh8, tmp_path):
    k = 13
    codes = _codes(30000, seed=8)
    half = codes.shape[0] // 2
    path = str(tmp_path / "ck.npz")
    scfg = ShardedCounterConfig(k=k, min_slots=1 << 13, tile=128, batch_tiles=8,
                                min_abundance=1)
    sc = ShardedKmerCounter(scfg, mesh8)
    sc.add_codes(codes[:half])
    sc.save(path)
    sc2 = ShardedKmerCounter.load(
        path,
        ShardedCounterConfig(k=k, min_slots=1 << 13, tile=128, batch_tiles=8,
                             min_abundance=1),
        make_mesh(4))
    sc2.add_codes(codes[half:])
    sc2.finish()
    # the checkpoint carries the unprocessed tail bytes, so the restored
    # counter continues the stream exactly (boundary windows included)
    assert sc2.as_dict() == codec.golden_count(codes, k)

    # the live counter is untouched by save and continues exactly too
    sc.add_codes(codes[half:])
    sc.finish()
    assert sc.as_dict() == codec.golden_count(codes, k)
