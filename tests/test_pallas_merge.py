"""Linear-merge superstep (ops/pallas_merge.py, VERDICT item 3).

The merge kernel replaces the full prefix re-sort with a streaming
two-run merge fused with the compaction; these tests pin (a) the raw
kernel on adversarial run shapes and (b) end-to-end golden equality of
the counter with compactor="merge_interpret" — both in Pallas
interpreter mode on CPU (the compiled path is exercised on the real
chip by `bench.py --verify`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kaarme_tpu.models.sort_counter import SortCounterConfig, SortKmerCounter
from kaarme_tpu.ops import pallas_merge as pm
from kaarme_tpu.ops import sortcount
from kaarme_tpu.utils import codec

SENT = 0xFFFFFFFF


def _split(vals, cnts, W, eb):
    cols = []
    for w in range(W - 1):
        cols.append(((vals >> np.uint64(9 * (W - 1 - w)))
                     & np.uint64(0x1FF)).astype(np.uint32))
    cols.append((((vals & np.uint64(0x1FF)) << np.uint64(eb))
                 | cnts).astype(np.uint32))
    return cols


@pytest.mark.parametrize("W,na_real,nb_real,kmax", [
    (2, 300, 1500, 700),        # overlap-heavy
    (3, 50, 4000, 1 << 20),     # mostly-new batch
    (1, 400, 100, 480),         # batch smaller than prefix
    (2, 0, 2000, 1000),         # empty prefix
    (2, 600, 0, 1000),          # empty batch
])
def test_merge_compact_dense_embedded(W, na_real, nb_real, kmax):
    rng = np.random.default_rng(W * 1000 + na_real + nb_real)
    eb, S = 22, 8
    akeys = np.unique(rng.integers(0, kmax, na_real).astype(np.uint64)) \
        if na_real else np.empty(0, np.uint64)
    acnt = rng.integers(1, 1 << 19, akeys.shape[0]).astype(np.uint64)
    Na = ((akeys.shape[0] + 127) // 128) * 128
    bkeys = np.sort(rng.integers(0, kmax, nb_real).astype(np.uint64))
    Nb = ((nb_real + 127) // 128) * 128

    a_cols = _split(akeys, acnt, W, eb)
    a_cols = [np.concatenate([c, np.full(Na - akeys.shape[0], SENT,
                                         np.uint32)]) for c in a_cols]
    b_cols = _split(bkeys, np.ones(nb_real, np.uint64), W, eb)
    b_cols = [np.concatenate([np.full(Nb - nb_real, SENT, np.uint32),
                              c[::-1]]) for c in b_cols]

    exp = {}
    for kk, c in zip(akeys.tolist(), acnt.tolist()):
        exp[kk] = exp.get(kk, 0) + c
    for kk in bkeys.tolist():
        exp[kk] = exp.get(kk, 0) + 1
    big = 1 << 20
    exp_rows = sorted(
        (kk, v if v <= big else big + (v & (big - 1))) for kk, v in exp.items()
    )

    ok, oc, nd, ndu = pm.merge_compact_dense(
        tuple(jnp.asarray(c) for c in a_cols),
        tuple(jnp.asarray(c) for c in b_cols),
        embedded=True, ebits=eb, block_rows=S, interpret=True)
    nd, ndu = int(nd), int(ndu)
    assert nd == len(exp_rows)
    kk = [np.asarray(o[:ndu]) for o in ok]
    cc = np.asarray(oc[:ndu])
    gotk = np.zeros(nd, np.uint64)
    for w in range(W - 1):
        gotk = (gotk << np.uint64(9)) | kk[w][:nd].astype(np.uint64)
    gotk = (gotk << np.uint64(9)) | (kk[W - 1][:nd].astype(np.uint64)
                                     >> np.uint64(eb))
    assert list(zip(gotk.tolist(), cc[:nd].astype(int).tolist())) == exp_rows
    # dense contract: contiguous live rows, clean sentinel tail
    assert (cc[:nd] > 0).all()
    assert all((x[nd:ndu] == SENT).all() for x in kk)
    assert (cc[nd:ndu] == 0).all()


def test_merge_hot_key_spans_blocks_and_clamps():
    eb, S = 22, 8
    hot = np.uint64(77)
    nb_real = S * 128 * 3 + 50
    Nb = ((nb_real + 127) // 128) * 128
    b0 = np.full(Nb, SENT, np.uint32)
    b1 = np.full(Nb, SENT, np.uint32)
    b0[Nb - nb_real:] = np.uint32(hot >> np.uint64(9))
    b1[Nb - nb_real:] = np.uint32(((hot & np.uint64(0x1FF)) << np.uint64(eb)) | 1)
    a0 = np.full(128, SENT, np.uint32)
    a1 = np.full(128, SENT, np.uint32)
    a0[0] = np.uint32(hot >> np.uint64(9))
    a1[0] = np.uint32(((hot & np.uint64(0x1FF)) << np.uint64(eb)) | 900000)
    ok, oc, nd, ndu = pm.merge_compact_dense(
        (jnp.asarray(a0), jnp.asarray(a1)),
        (jnp.asarray(b0), jnp.asarray(b1)),
        embedded=True, ebits=eb, block_rows=S, interpret=True)
    assert int(nd) == 1
    tot = 900000 + nb_real
    big = 1 << 20
    exp = tot if tot <= big else big + (tot & (big - 1))
    assert int(np.asarray(oc[0])) == exp


@pytest.mark.parametrize("k", [31, 51, 63])
def test_superstep_merged_matches_embedded(k):
    """One merged superstep == one embedded superstep, bit for bit
    (same prefix in, same distinct records out)."""
    n, rows = 1 << 12, 1 << 5
    eb = sortcount.embed_bits(k)
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 5, size=n + k - 1).astype(np.uint8)
    packed, _ = sortcount.pack_stream_np(codes)
    seps = np.flatnonzero(codes >= 4).astype(np.uint32)
    sep = np.full(max(n // 32, seps.shape[0]), n + k - 1, np.uint32)
    sep[: seps.shape[0]] = seps
    cap = 1 << 13
    prefix = sortcount.make_store(cap, sortcount.words_per_kmer(k))

    ref, nd_ref = sortcount.superstep_embedded(
        jnp.asarray(packed), jnp.asarray(sep), prefix,
        k=k, n=n, rows=rows, ebits=eb, pallas="off")
    got, nd_got = sortcount.superstep_merged(
        jnp.asarray(packed), jnp.asarray(sep), prefix,
        k=k, n=n, rows=rows, ebits=eb, pallas="merge_interpret")
    nd = int(nd_ref[0])
    assert int(nd_got[0]) == nd
    for a, b in zip(ref, got):
        assert (np.asarray(a[:nd]) == np.asarray(b[:nd])).all()


@pytest.mark.parametrize("k", [31, 32])   # embedded (eb=2) / separate (eb=0)
def test_counter_end_to_end_merge_compactor(k):
    """Full streaming counter on the linear-merge superstep == golden
    oracle (multi-superstep chaining, duplication pressure, invalid
    bases, tail trimming)."""
    rng = np.random.default_rng(4)
    stream = rng.integers(0, 5, size=40000).astype(np.uint8)
    cfg = SortCounterConfig(
        k=k, batch_windows=1 << 10, rows=1 << 5, superbatch_batches=2,
        prefix_cap=1 << 12, min_abundance=1, compactor="merge_interpret")
    c = SortKmerCounter(cfg).count_codes(stream)
    assert c.as_dict() == codec.golden_count(stream, k)


def test_merge_compactor_grow_and_replay():
    """Prefix overflow under the merge superstep grows the store and
    replays — output still golden."""
    rng = np.random.default_rng(9)
    stream = rng.integers(0, 4, size=20000).astype(np.uint8)  # ~all distinct
    cfg = SortCounterConfig(
        k=25, batch_windows=1 << 10, rows=1 << 5, superbatch_batches=2,
        prefix_cap=1 << 12, min_abundance=1, compactor="merge_interpret")
    c = SortKmerCounter(cfg).count_codes(stream)
    assert c.stats["grow_events"] > 0
    assert c.as_dict() == codec.golden_count(stream, 25)


def test_bloom_two_pass_on_merge_compactor():
    """The two-pass Bloom prefilter composes with the linear-merge
    superstep (pass-2 miss masking happens before the batch sort)."""
    from kaarme_tpu.models.bloom_counter import BloomSortCounter

    rng = np.random.default_rng(13)
    # duplication-heavy stream so BF2 keeps most of the mass
    base = rng.integers(0, 4, size=3000).astype(np.uint8)
    stream = np.concatenate([base, base, base[:1500]])
    k = 19
    cfg = SortCounterConfig(
        k=k, batch_windows=1 << 10, rows=1 << 5, superbatch_batches=2,
        prefix_cap=1 << 12, min_abundance=2, compactor="merge_interpret")
    c = BloomSortCounter(cfg, expected_unique=4000, fpr=0.01)
    for _pass in (1, 2):
        c.add_codes(stream)
        if _pass == 1:
            c.start_pass2()
        else:
            c.finish()
    golden = {kk: v for kk, v in codec.golden_count(stream, k).items()
              if min(v, 16383) >= 2}
    assert c.as_dict() == golden


def test_merge_exact_fit_no_input_sentinels():
    """Both runs 100% real records and total an exact block multiple:
    without the forced trailing sentinel block, the lagged compact
    decision would drop the final record."""
    rng = np.random.default_rng(2)
    eb, S = 22, 8
    R = S * 128
    Na = Nb = R

    def cols_of(keys, cnts):
        return [(keys >> np.uint64(10)).astype(np.uint32),
                (((keys & np.uint64(0x3FF)) << np.uint64(eb))
                 | cnts).astype(np.uint32)]

    akeys = np.sort(rng.choice(1 << 19, Na, replace=False).astype(np.uint64))
    acnt = rng.integers(1, 100, Na).astype(np.uint64)
    a_cols = cols_of(akeys, acnt)
    bkeys = np.sort(rng.integers(0, 1 << 19, Nb).astype(np.uint64))
    b_cols = [c[::-1].copy() for c in cols_of(bkeys, np.ones(Nb, np.uint64))]
    exp = {}
    for kk, c in zip(akeys.tolist(), acnt.tolist()):
        exp[kk] = exp.get(kk, 0) + c
    for kk in bkeys.tolist():
        exp[kk] = exp.get(kk, 0) + 1
    ok, oc, nd, ndu = pm.merge_compact_dense(
        tuple(jnp.asarray(c) for c in a_cols),
        tuple(jnp.asarray(c) for c in b_cols),
        embedded=True, ebits=eb, block_rows=S, interpret=True)
    nd = int(nd)
    gotk = ((np.asarray(ok[0][:nd]).astype(np.uint64) << np.uint64(10))
            | (np.asarray(ok[1][:nd]).astype(np.uint64) >> np.uint64(eb)))
    got = list(zip(gotk.tolist(), np.asarray(oc[:nd]).astype(int).tolist()))
    assert got == sorted(exp.items())
