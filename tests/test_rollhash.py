"""Parity oracles: dual rolling hash model, math utils, checkpoint, query CLI."""

import io

import numpy as np
import pytest

from kaarme_tpu.utils import codec, mathutils, rollhash


# -- rolling hash golden model ----------------------------------------------

@pytest.mark.parametrize("q", [mathutils.next_prime3mod4(10007), rollhash.BF_MOD])
def test_rolling_matches_direct(q):
    rng = np.random.default_rng(0)
    m = 21
    codes = rng.integers(0, 4, size=200).tolist()
    h = rollhash.RollingHasherDual(q, m)
    h.load(codes[:m])
    for t in range(1, len(codes) - m + 1):
        h.update(codes[t + m - 1], codes[t - 1])
        win = codes[t : t + m]
        assert h.h_fwd == rollhash.direct_hash(win, q)
        rc = [3 - c for c in reversed(win)]
        assert h.h_bwd == rollhash.direct_hash(rc, q)


def test_root_hash_revcomp_invariant():
    rng = np.random.default_rng(1)
    m = 31
    win = rng.integers(0, 4, size=m).tolist()
    rc = [3 - c for c in reversed(win)]
    a = rollhash.RollingHasherDual(rollhash.BF_MOD, m)
    b = rollhash.RollingHasherDual(rollhash.BF_MOD, m)
    a.load(win)
    b.load(rc)
    assert a.root() == b.root()
    assert a.h_fwd == b.h_bwd and a.h_bwd == b.h_fwd


# -- math utils --------------------------------------------------------------

def test_next_prime3mod4():
    for n in (10, 100, 8000000):
        p = mathutils.next_prime3mod4(n)
        assert p >= n and p % 4 == 3
        assert mathutils._is_prime(p)


def test_modular_inverse():
    for a, m in ((5, 1 << 54), (5, 10007), (123457, 1 << 31)):
        inv = mathutils.modular_inverse(a, m)
        assert (a * inv) % m == 1
    with pytest.raises(ValueError):
        mathutils.modular_inverse(6, 9)


# -- checkpoint / resume ------------------------------------------------------

def test_checkpoint_resume(tmp_path):
    from kaarme_tpu.models.sort_counter import SortCounterConfig, SortKmerCounter

    k = 13
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=20000).astype(np.uint8)
    cfg = dict(batch_windows=1 << 12, rows=1 << 6, prefix_cap=1 << 13,
               min_abundance=1)
    # full run
    full = SortKmerCounter(SortCounterConfig(k=k, **cfg)).count_codes(codes)
    # half run -> save -> load -> second half
    c1 = SortKmerCounter(SortCounterConfig(k=k, **cfg))
    c1.add_codes(codes[:10000])
    c1.finish()
    ckpt = str(tmp_path / "snap.npz")
    c1.save(ckpt)
    c2 = SortKmerCounter.load(ckpt, SortCounterConfig(k=k, **cfg))
    # windows spanning the cut are intentionally re-fed via overlap
    c2.add_codes(codes[10000 - (k - 1):])
    c2.finish()
    assert c2.as_dict() == full.as_dict()


def test_checkpoint_midstream_preserves_boundary_windows(tmp_path):
    """save() WITHOUT finish(): the buffered tail is checkpointed
    verbatim, so windows spanning the save boundary survive resume with
    no manual overlap re-feed — and the saving counter itself keeps
    counting as if save never happened."""
    from kaarme_tpu.models.sort_counter import SortCounterConfig, SortKmerCounter

    k = 13
    rng = np.random.default_rng(8)
    codes = rng.integers(0, 4, size=20000).astype(np.uint8)
    cfg = dict(batch_windows=1 << 12, rows=1 << 6, prefix_cap=1 << 13,
               min_abundance=1)
    full = SortKmerCounter(SortCounterConfig(k=k, **cfg)).count_codes(codes)

    c1 = SortKmerCounter(SortCounterConfig(k=k, **cfg))
    cut = 9999   # deliberately NOT superbatch-aligned
    c1.add_codes(codes[:cut])
    ckpt = str(tmp_path / "mid.npz")
    c1.save(ckpt)

    c2 = SortKmerCounter.load(ckpt, SortCounterConfig(k=k, **cfg))
    c2.add_codes(codes[cut:])        # no overlap re-feed
    c2.finish()
    assert c2.as_dict() == full.as_dict()

    # the original counter is unperturbed by save()
    c1.add_codes(codes[cut:])
    c1.finish()
    assert c1.as_dict() == full.as_dict()


# -- CLI query loop -----------------------------------------------------------

def test_cli_query(tmp_path, monkeypatch, capsys):
    from kaarme_tpu import cli

    rng = np.random.default_rng(2)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, size=400))
    p = tmp_path / "q.fasta"
    p.write_text(f">r\n{seq}\n")
    golden = codec.golden_count(codec.encode_fasta(p.read_bytes())[0], 9)
    some = list(golden)[:3]
    monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(some + ["XXXXXXXXX"]) + "\n"))
    monkeypatch.chdir(tmp_path)
    rc = cli.main([str(p), "9", "-s", "1024", "-a", "1", "-q", "--query"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert [int(x) for x in out] == [golden[s] for s in some] + [-1]
