"""Headline benchmark: canonical k-mers counted per second on one chip.

Replicates the reference's headline workload shape (ecoli-scale genome,
k=51, ~8M-slot table — reference README.md example) with synthetic reads,
and measures the steady-state device pipeline: canonical window
extraction + hashing + batched HBM table insert.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N}
vs_baseline is against the driver target of 1e9 canonical k-mers/s/chip
(BASELINE.md rebuild targets).
"""

import argparse
import json
import sys
import time

import numpy as np


def make_reads(genome_mb: float, coverage: int, read_len: int, seed: int = 0):
    """Synthetic genome + reads sampled at the given coverage, as one
    plain-text code stream (reads separated by resets)."""
    rng = np.random.default_rng(seed)
    glen = int(genome_mb * 1e6)
    genome = rng.integers(0, 4, size=glen, dtype=np.int64).astype(np.uint8)
    n_reads = glen * coverage // read_len
    starts = rng.integers(0, glen - read_len, size=n_reads)
    offs = np.arange(read_len)
    reads = genome[starts[:, None] + offs[None, :]]  # (n_reads, read_len)
    # join with separators (code 4), flattened
    stream = np.full((n_reads, read_len + 1), 4, np.uint8)
    stream[:, :read_len] = reads
    return stream.reshape(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=51)
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--coverage", type=int, default=8)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--cap-log2", type=int, default=23)
    ap.add_argument("--tile", type=int, default=1 << 15)
    ap.add_argument("--batch-tiles", type=int, default=32)
    ap.add_argument("--max-probes", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kaarme_tpu.models.tiling import TileBatcher
    from kaarme_tpu.ops import table as table_ops
    from kaarme_tpu.utils import codec

    k = args.k
    codes = make_reads(args.genome_mb, args.coverage, args.read_len)

    batcher = TileBatcher(k, args.tile, args.batch_tiles)
    batches = list(batcher.add(codes)) + list(batcher.finish())
    dev_batches = [jnp.asarray(b) for b in batches]
    jax.block_until_ready(dev_batches)
    n_windows = sum(b.shape[0] * args.tile for b in batches)

    words = codec.words_per_kmer(k)

    def run_once():
        tkeys, counts = table_ops.make_table(args.cap_log2, words)
        ovf_total = 0
        for b in dev_batches:
            tkeys, counts, ovf, _ = table_ops.count_step(
                tkeys, counts, b, k, args.max_probes
            )
            ovf_total += int(ovf)
        jax.block_until_ready((tkeys, counts))
        return ovf_total, counts

    # warm-up / compile
    ovf, counts = run_once()
    if ovf:
        print(f"warning: {ovf} overflow windows", file=sys.stderr)

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - t0)

    kmers_per_s = n_windows / best
    used = int((np.asarray(counts) > 0).sum())
    print(
        f"# device={jax.devices()[0]} windows={n_windows} "
        f"time={best:.3f}s distinct={used} k={k}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "canonical_kmers_per_sec_per_chip",
        "value": round(kmers_per_s),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / 1e9, 4),
    }))


if __name__ == "__main__":
    main()
