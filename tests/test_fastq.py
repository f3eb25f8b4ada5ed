"""FASTQ input support (capability superset — the reference rejects FASTQ)."""

import gzip

import numpy as np
import pytest

from kaarme_tpu.io import fastio, reader
from kaarme_tpu.utils import codec


def _mk_fastq(seqs, qual_char="I", multiline=False):
    parts = []
    for i, s in enumerate(seqs):
        q = qual_char * len(s)
        if multiline and len(s) > 10:
            half = len(s) // 2
            parts.append(f"@read{i} extra info\n{s[:half]}\n{s[half:]}\n+\n{q[:half]}\n{q[half:]}\n")
        else:
            parts.append(f"@read{i}\n{s}\n+read{i}\n{q}\n")
    return "".join(parts).encode()


def _expected_codes(seqs):
    out = []
    for s in seqs:
        out.append(np.array([4], np.uint8))
        out.append(codec.BASE_LUT[np.frombuffer(s.encode(), np.uint8)])
    return np.concatenate(out)


SEQS = ["ACGTACGTGG", "TTTTAAACCGGT", "ACGTNNACGTACGT"]


def test_encode_fastq_python_matches_native():
    buf = _mk_fastq(SEQS)
    py, st_py = codec.encode_fastq(buf)
    nat, st_nat = fastio.encode_fastq(buf)
    np.testing.assert_array_equal(py, nat)
    assert st_py == st_nat


@pytest.mark.parametrize("multiline", [False, True])
def test_encode_fastq_semantics(multiline):
    buf = _mk_fastq(SEQS, multiline=multiline)
    codes, _ = fastio.encode_fastq(buf)
    np.testing.assert_array_equal(codes, _expected_codes(SEQS))


def test_quality_with_at_and_plus():
    # quality lines full of '@' and '+' must not start new records
    buf = _mk_fastq(["ACGTACGT", "GGCCTTAA"], qual_char="@")
    codes, _ = fastio.encode_fastq(buf)
    np.testing.assert_array_equal(codes, _expected_codes(["ACGTACGT", "GGCCTTAA"]))
    buf = _mk_fastq(["ACGTACGT"], qual_char="+")
    codes, _ = fastio.encode_fastq(buf)
    np.testing.assert_array_equal(codes, _expected_codes(["ACGTACGT"]))


def test_chunk_boundary_state_carry():
    buf = _mk_fastq(SEQS, multiline=True)
    want = _expected_codes(SEQS)
    for cut in range(1, len(buf) - 1, 7):
        st = None
        a, st = fastio.encode_fastq(buf[:cut], st)
        b, st = fastio.encode_fastq(buf[cut:], st)
        got = np.concatenate([a, b])
        np.testing.assert_array_equal(got, want, err_msg=f"cut={cut}")


def test_fastq_file_end_to_end(tmp_path):
    from kaarme_tpu.models.sort_counter import SortCounterConfig, SortKmerCounter

    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), size=rng.integers(20, 120)))
            for _ in range(30)]
    p = tmp_path / "reads.fastq"
    p.write_bytes(_mk_fastq(seqs))
    fmt, gz = reader.sniff_format(str(p))
    assert fmt == "fastq" and not gz

    k = 11
    c = SortKmerCounter(SortCounterConfig(
        k=k, batch_windows=1 << 12, rows=1 << 6, prefix_cap=1 << 13,
        min_abundance=1))
    c.count_file(str(p))
    golden: dict = {}
    for s in seqs:
        for i in range(len(s) - k + 1):
            km = codec.canonical(s[i : i + k])
            golden[km] = golden.get(km, 0) + 1
    assert c.as_dict() == golden

    # gzipped variant through the CLI
    pgz = tmp_path / "reads.fastq.gz"
    pgz.write_bytes(gzip.compress(p.read_bytes()))
    from kaarme_tpu import cli
    out = tmp_path / "fq.counts"
    rc = cli.main([str(pgz), str(k), "-s", "8192", "-a", "1", "-q", "-o", str(out)])
    assert rc == 0
    got = {ln.split()[0]: int(ln.split()[1]) for ln in out.read_text().splitlines()}
    assert got == golden
