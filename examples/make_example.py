"""Generate a synthetic E. coli-scale example FASTA.

The reference ships ``example/ecoli1x.fasta`` (stripped from its repo —
see .MISSING_LARGE_BLOBS) and demonstrates counting with k=51 and an
8M-slot table (reference: README.md:64-74).  This script synthesizes a
comparable workload: a random 4.6 Mb genome sampled into 150 bp reads
at the requested coverage.

    python examples/make_example.py --out examples/ecoli_like.fasta
    python -m kaarme_tpu.cli examples/ecoli_like.fasta 51 -s 8000000 -a 2
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/ecoli_like.fasta")
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--coverage", type=int, default=1)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    glen = int(args.genome_mb * 1e6)
    genome = rng.integers(0, 4, size=glen, dtype=np.int64).astype(np.uint8)
    lut = np.frombuffer(b"ACGT", np.uint8)
    n_reads = glen * args.coverage // args.read_len
    starts = rng.integers(0, glen - args.read_len, size=n_reads)
    offs = np.arange(args.read_len)
    reads = lut[genome[starts[:, None] + offs[None, :]]]
    with open(args.out, "wb") as f:
        for i in range(n_reads):
            f.write(b">read%d\n" % i)
            f.write(reads[i].tobytes())
            f.write(b"\n")
    print(f"wrote {args.out}: {n_reads} reads x {args.read_len} bp "
          f"({args.coverage}x coverage of a {args.genome_mb} Mb genome)")


if __name__ == "__main__":
    main()
