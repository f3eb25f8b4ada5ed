import numpy as np
import pytest

import jax.numpy as jnp

from kaarme_tpu.ops import table, windows
from kaarme_tpu.ops.hashing import hash_words
from kaarme_tpu.utils import codec


def _keys_from_strings(kmers, k):
    packed = np.stack([codec.pack_kmer(s) for s in kmers])  # (N, W)
    keys = tuple(jnp.asarray(packed[:, w]) for w in range(packed.shape[1]))
    return keys


def _table_dict(tkeys, counts, k):
    tk = np.asarray(tkeys)
    cn = np.asarray(counts)
    occ = cn > 0
    names = codec.unpack_kmers(tk[occ], k) if occ.any() else []
    return dict(zip(names, cn[occ].tolist()))


def test_insert_and_lookup_roundtrip():
    k = 7
    rng = np.random.default_rng(0)
    kmers = list({codec.canonical("".join("ACGT"[c] for c in rng.integers(0, 4, size=k))) for _ in range(200)})
    keys = _keys_from_strings(kmers, k)
    h = hash_words(keys)
    valid = jnp.ones((len(kmers),), jnp.bool_)

    tkeys, counts = table.make_table(10, codec.words_per_kmer(k))
    tkeys, counts, pending = table.insert(tkeys, counts, keys, valid, h)
    assert int(pending.sum()) == 0

    got = table.lookup(tkeys, counts, keys, h)
    np.testing.assert_array_equal(np.asarray(got), np.ones(len(kmers), np.int32))

    # absent keys return 0
    absent = list({codec.canonical("".join("ACGT"[c] for c in rng.integers(0, 4, size=k))) for _ in range(50)} - set(kmers))
    akeys = _keys_from_strings(absent, k)
    ah = hash_words(akeys)
    got2 = table.lookup(tkeys, counts, akeys, ah)
    np.testing.assert_array_equal(np.asarray(got2), np.zeros(len(absent), np.int32))


def test_duplicates_within_batch_accumulate():
    k = 5
    kmers = ["AACGT", "AACGT", "AACGT", "ACCCC", "AACGT"]
    keys = _keys_from_strings(kmers, k)
    h = hash_words(keys)
    valid = jnp.ones((5,), jnp.bool_)
    tkeys, counts = table.make_table(6, codec.words_per_kmer(k))
    tkeys, counts, pending = table.insert(tkeys, counts, keys, valid, h)
    assert int(pending.sum()) == 0
    d = _table_dict(tkeys, counts, k)
    assert d == {"AACGT": 4, "ACCCC": 1}


def test_heavy_collisions_tiny_table():
    """Force probing: 48 distinct keys into a 64-slot table."""
    k = 6
    rng = np.random.default_rng(1)
    kmers = set()
    while len(kmers) < 48:
        kmers.add(codec.canonical("".join("ACGT"[c] for c in rng.integers(0, 4, size=k))))
    kmers = sorted(kmers)
    reps = rng.integers(1, 5, size=len(kmers))
    batch = [s for s, r in zip(kmers, reps) for _ in range(r)]
    rng.shuffle(batch)

    keys = _keys_from_strings(batch, k)
    h = hash_words(keys)
    valid = jnp.ones((len(batch),), jnp.bool_)
    tkeys, counts = table.make_table(6, codec.words_per_kmer(k))
    tkeys, counts, pending = table.insert(tkeys, counts, keys, valid, h, max_probes=64)
    assert int(pending.sum()) == 0
    d = _table_dict(tkeys, counts, k)
    assert d == {s: int(r) for s, r in zip(kmers, reps)}


def test_overflow_reports_pending():
    k = 6
    rng = np.random.default_rng(2)
    kmers = set()
    while len(kmers) < 30:
        kmers.add(codec.canonical("".join("ACGT"[c] for c in rng.integers(0, 4, size=k))))
    kmers = sorted(kmers)
    keys = _keys_from_strings(kmers, k)
    h = hash_words(keys)
    valid = jnp.ones((len(kmers),), jnp.bool_)
    tkeys, counts = table.make_table(4, codec.words_per_kmer(k))  # 16 slots < 30 keys
    tkeys, counts, pending = table.insert(tkeys, counts, keys, valid, h, max_probes=64)
    n_pending = int(pending.sum())
    assert n_pending == 30 - 16
    assert int((np.asarray(counts) > 0).sum()) == 16
    # retrying only the pending ones into a bigger table completes the set
    tk2, cn2 = table.make_table(8, codec.words_per_kmer(k))
    tk2, cn2, pend2 = table.insert(tk2, cn2, keys, pending, h)
    assert int(pend2.sum()) == 0
    merged = _table_dict(tkeys, counts, k)
    merged.update(_table_dict(tk2, cn2, k))
    assert merged == {s: 1 for s in kmers}


def test_amounts_merge():
    k = 4
    kmers = ["AAAC", "AAAG"]
    keys = _keys_from_strings(kmers, k)
    h = hash_words(keys)
    valid = jnp.ones((2,), jnp.bool_)
    amount = jnp.asarray([7, 3], jnp.int32)
    tkeys, counts = table.make_table(5, 1)
    tkeys, counts, pending = table.insert(tkeys, counts, keys, valid, h, amount=amount)
    assert int(pending.sum()) == 0
    assert _table_dict(tkeys, counts, k) == {"AAAC": 7, "AAAG": 3}


@pytest.mark.parametrize("k", [11, 31, 51])
def test_count_step_matches_golden(k):
    rng = np.random.default_rng(k)
    n = 3000
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    codes[rng.random(n) < 0.01] = 4

    T = 256
    L = T + k - 1
    padded = np.full(((n + T - 1) // T) * T + k - 1, 4, np.uint8)
    padded[: n] = codes
    ntiles = (len(padded) - (k - 1)) // T
    tiles = np.lib.stride_tricks.as_strided(
        padded, shape=(ntiles, L), strides=(T * padded.strides[0], padded.strides[0])
    )

    tkeys, counts = table.make_table(13, codec.words_per_kmer(k))
    tkeys, counts, overflow, _ = table.count_step(tkeys, counts, jnp.asarray(tiles), k)
    assert int(overflow) == 0

    got = _table_dict(tkeys, counts, k)
    expect = codec.golden_count(codes, k)
    assert got == expect
