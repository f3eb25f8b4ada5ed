import gzip

import numpy as np
import pytest

from kaarme_tpu.io import reader as io_reader
from kaarme_tpu.models.counter import CounterConfig, KmerCounter
from kaarme_tpu.utils import codec, compare


def _random_seq(n, seed, alphabet="ACGT"):
    rng = np.random.default_rng(seed)
    return "".join(alphabet[c] for c in rng.integers(0, len(alphabet), size=n))


def _small_cfg(k, **kw):
    kw.setdefault("min_slots", 1 << 12)
    kw.setdefault("tile", 128)
    kw.setdefault("batch_tiles", 4)
    kw.setdefault("min_abundance", 1)
    return CounterConfig(k=k, **kw)


def test_count_codes_matches_golden_multi_batch():
    k = 11
    seq = _random_seq(5000, seed=0)
    codes = codec.encode_plain(seq.encode())
    c = KmerCounter(_small_cfg(k))
    # feed in uneven pieces to exercise the halo/carry logic
    for piece in np.array_split(codes, 7):
        c.add_codes(piece)
    c.finish()
    assert c.as_dict() == codec.golden_count(codes, k)


def test_count_file_fasta_and_gzip(tmp_path):
    k = 9
    seqs = [_random_seq(300, seed=i) for i in range(3)]
    fasta = "".join(f">read{i} desc\n" + "\n".join(
        s[j:j + 47] for j in range(0, len(s), 47)) + "\n" for i, s in enumerate(seqs))
    p = tmp_path / "in.fasta"
    p.write_text(fasta)
    pgz = tmp_path / "in.fasta.gz"
    pgz.write_bytes(gzip.compress(fasta.encode()))

    codes = io_reader.read_codes(str(p))
    expect = codec.golden_count(codes, k)

    c1 = KmerCounter(_small_cfg(k)).count_file(str(p))
    assert c1.as_dict() == expect
    c2 = KmerCounter(_small_cfg(k)).count_file(str(pgz))
    assert c2.as_dict() == expect


def test_chunked_reader_equals_whole_file(tmp_path):
    k = 9
    seq = _random_seq(4000, seed=5)
    fasta = ">r1\n" + "\n".join(seq[j:j + 61] for j in range(0, len(seq), 61)) + "\n"
    p = tmp_path / "big.fasta"
    p.write_text(fasta)
    # tiny chunks cut headers and lines arbitrarily
    c = KmerCounter(_small_cfg(k)).count_file(str(p), chunk_bytes=97)
    expect = codec.golden_count(io_reader.read_codes(str(p)), k)
    assert c.as_dict() == expect


def test_growth_on_small_initial_table():
    k = 13
    seq = _random_seq(3000, seed=2)
    codes = codec.encode_plain(seq.encode())
    cfg = _small_cfg(k, min_slots=256)  # far fewer slots than ~3k distinct kmers
    c = KmerCounter(cfg).count_codes(codes)
    assert c.stats["grow_events"] > 0
    assert c.as_dict() == codec.golden_count(codes, k)


def test_min_abundance_filter_and_find():
    k = 5
    codes = codec.encode_plain(b"ACGTACGTACGT\nGGGGGTTTTT")
    cfg = _small_cfg(k, min_abundance=2)
    c = KmerCounter(cfg).count_codes(codes)
    golden = codec.golden_count(codes, k)
    expect = {s: n for s, n in golden.items() if n >= 2}
    assert c.as_dict() == expect
    # find returns unclipped-by-threshold counts, canonicalizes queries
    assert c.find("ACGTA") == [golden["ACGTA"]]
    assert c.find([codec.revcomp("ACGTA")]) == [golden["ACGTA"]]
    assert c.find("AATAA") == [0]  # absent
    assert c.find("AXGTA") == [-1]
    assert c.find("ACG") == [-1]


def test_mode_clipping():
    k = 3
    # one kmer repeated 70000 times -> mode2 saturates at 16383,
    # mode0 wraps mod 65536 (70000+..: windows = n-2)
    n = 70002
    codes = codec.encode_plain(b"A" * n)
    for mode, expect in ((2, 16383), (0, 70000 % 65536)):
        cfg = _small_cfg(k, mode=mode, tile=1 << 12, batch_tiles=8)
        c = KmerCounter(cfg).count_codes(codes)
        assert c.as_dict() == {"AAA": expect}


def test_write_output_and_comparator(tmp_path):
    k = 7
    seq = _random_seq(800, seed=3)
    codes = codec.encode_plain(seq.encode())
    c = KmerCounter(_small_cfg(k)).count_codes(codes)
    out = tmp_path / "counts.txt"
    n = c.write_output(str(out))
    golden = codec.golden_count(codes, k)
    gold_file = tmp_path / "golden.txt"
    gold_file.write_text("".join(f"{s} {n}\n" for s, n in sorted(golden.items())))
    eq, diffs = compare.compare_count_files(str(out), str(gold_file))
    assert eq, diffs
    assert n == len(golden)


def test_orient_file(tmp_path):
    # third-party output in arbitrary orientation
    raw = tmp_path / "raw.txt"
    raw.write_text("TTTT 3\nAAAA 2\nGGGG 1\n")
    out = tmp_path / "oriented.txt"
    n = compare.orient_file(str(raw), str(out), min_abundance=2)
    assert out.read_text() == "AAAA 5\n"
    assert n == 1


def test_fastio_native_matches_numpy():
    from kaarme_tpu.io import fastio

    data = b">h1 x\nACGTNacgt\nGG>broken\nTT\n" * 50
    nat, nc = fastio.encode_fasta(data)
    ref, rc = codec.encode_fasta(data)
    np.testing.assert_array_equal(nat, ref)
    assert nc == rc
    np.testing.assert_array_equal(fastio.encode_plain(data), codec.encode_plain(data))
    if fastio.get_lib() is None:
        pytest.skip("native fastio unavailable (g++ missing)")
