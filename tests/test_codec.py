import numpy as np
import pytest

from kaarme_tpu.utils import codec


def test_plain_encoding_maps_bases_and_resets():
    codes = codec.encode_plain(b"ACGTacgt\nNxT")
    assert codes.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 4, 3]


def test_fasta_strips_headers_and_newlines():
    buf = b">read1 desc\nACGT\nAC\n>read2\nTT\n"
    codes, carry = codec.encode_fasta(buf)
    # header -> single separator; sequence newlines vanish
    assert codes.tolist() == [4, 0, 1, 2, 3, 0, 1, 4, 3, 3]
    assert carry is False


def test_fasta_broken_header_carry():
    codes1, carry = codec.encode_fasta(b">a\nAC\n>long hea")
    assert carry is True
    assert codes1.tolist() == [4, 0, 1]
    codes2, carry2 = codec.encode_fasta(b"der tail\nGGT", prev_in_header=True)
    assert carry2 is False
    assert codes2.tolist() == [4, 2, 2, 3]


def test_fasta_mid_line_gt_starts_header():
    # the reference treats '>' anywhere as header start
    # (include/parallel_parser.hpp:1402-1417)
    codes, carry = codec.encode_fasta(b">h\nAC>junk\nGT\n")
    assert codes.tolist() == [4, 0, 1, 4, 2, 3]
    assert carry is False


def test_fasta_header_at_eof_without_newline():
    codes, carry = codec.encode_fasta(b">h\nACGT\n>trailing")
    assert codes.tolist() == [4, 0, 1, 2, 3]
    assert carry is True


def test_canonical_tie_prefers_forward():
    # palindrome: revcomp(ACGT) == ACGT
    assert codec.canonical("ACGT") == "ACGT"
    assert codec.canonical("TTTT") == "AAAA"
    assert codec.canonical("GA") == "GA"  # revcomp(GA)=TC > GA


def test_golden_count_basic():
    codes = codec.encode_plain(b"ACGTT")
    counts = codec.golden_count(codes, 3)
    # windows: ACG CGT GTT -> canonical ACG, ACG, AAC
    assert counts == {"ACG": 2, "AAC": 1}


def test_golden_count_resets_on_separator():
    codes = codec.encode_plain(b"ACG\nTTT")
    counts = codec.golden_count(codes, 3)
    assert counts == {"ACG": 1, "AAA": 1}


@pytest.mark.parametrize("k", [3, 16, 17, 31, 32, 33, 51, 63])
def test_pack_unpack_roundtrip(k):
    rng = np.random.default_rng(k)
    s = "".join("ACGT"[c] for c in rng.integers(0, 4, size=k))
    words = codec.pack_kmer(s)
    assert words.shape[0] == codec.words_per_kmer(k)
    assert codec.unpack_kmer(words, k) == s
    assert codec.unpack_kmers(words[None, :], k) == [s]


def test_pack_order_matches_lexicographic():
    rng = np.random.default_rng(7)
    k = 21
    kmers = []
    for _ in range(50):
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, size=k))
        kmers.append(s)
    packed = [tuple(int(x) for x in codec.pack_kmer(s)) for s in kmers]
    order_str = sorted(range(50), key=lambda i: kmers[i])
    order_num = sorted(range(50), key=lambda i: packed[i])
    assert order_str == order_num


def test_prefetching_reader_propagates_errors(tmp_path):
    """Producer-thread exceptions must surface to the consumer."""
    import pytest as _pytest

    from kaarme_tpu.io.reader import PrefetchingReader

    def boom():
        yield __import__("numpy").zeros(4, "uint8")
        raise RuntimeError("producer failed")

    r = PrefetchingReader(boom(), depth=2)
    with _pytest.raises(RuntimeError, match="producer failed"):
        list(r)
