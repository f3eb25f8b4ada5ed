"""Headline benchmark: canonical k-mers counted per second on one chip.

Replicates the reference's headline workload shape (ecoli-scale genome,
k=51, ~8x read coverage — reference README.md example) with synthetic
reads and measures the full single-chip pipeline end to end: host 2-bit
pack -> transfer -> canonical window extraction -> global sort ->
segment-reduce merge into the distinct-kmer store.

Timing is forced-honest: the device queue is drained with real data
fetches before the clock stops (on the axon backend, block_until_ready
returns before execution finishes).

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
    stream = np.full((n_reads, read_len + 1), 4, np.uint8)
    stream[:, :read_len] = reads
    return stream.reshape(-1)


def run_verify(args):
    """On-device correctness artifact (VERIFY_r{N}): golden-oracle
    equality of the full streaming pipeline with every Pallas kernel
    active, plus the compiled Mosaic regression cases that interpret
    mode cannot catch (tests/test_pallas_compact.py documents the bug)."""
    import jax
    import jax.numpy as jnp

    from kaarme_tpu.models.sort_counter import SortCounterConfig, SortKmerCounter
    from kaarme_tpu.ops import pallas_compact as pc
    from kaarme_tpu.utils import codec

    dev = jax.devices()[0]
    results = {"device": str(dev)}

    # 1) compiled compact-kernel regression cases (adjacent low-key-bit
    # segments; the & ~cmask strip miscompiled when fused into roll)
    SENT = 0xFFFFFFFF
    eb = 22
    block = pc.block_elems()
    ok_regress = True
    for vals in ([0x400001, 0x800001],
                 [0x400001, 0x400001, 0x800001],
                 [0x000001, 0x400001],
                 [0x000001] * 22 + [0x400001]):
        rows = np.array(vals + [SENT] * (block - len(vals)),
                        np.uint64).astype(np.uint32)
        ok, oc, nd, ndu = pc.segsum_compact(
            (jnp.asarray(rows),), embedded=True, ebits=eb, interpret=False)
        kk = np.asarray(ok[0][: int(ndu)])
        cc = np.asarray(oc[: int(ndu)])
        live = cc > 0
        got = sorted(zip(kk[live].tolist(), cc[live].tolist()))
        exp = {}
        for v in vals:
            kv = v & ~((1 << eb) - 1)
            exp[kv] = exp.get(kv, 0) + (v & ((1 << eb) - 1))
        if got != sorted(exp.items()):
            ok_regress = False
    results["mosaic_regression"] = "PASS" if ok_regress else "FAIL"

    # 2) end-to-end golden equality, multi-superstep, k=51 and k=31,
    # duplication pressure + invalid bases, Pallas auto (on-chip kernels)
    all_ok = ok_regress
    for k in (51, 31):
        codes = make_reads(0.15, 8, 150, seed=3)
        golden = codec.golden_count(codes, k)
        cfg = SortCounterConfig(
            k=k, batch_windows=1 << 17, rows=1 << 9, superbatch_batches=2,
            prefix_cap=1 << 18, min_abundance=1)
        c = SortKmerCounter(cfg).count_codes(codes)
        got = c.as_dict()
        ok = got == golden
        all_ok = all_ok and ok
        results[f"golden_equality_k{k}"] = (
            f"PASS ({len(golden)} distinct)" if ok else
            f"FAIL (got {len(got)} vs {len(golden)} distinct)")
        print(f"# verify classic k={k}: {results[f'golden_equality_k{k}']}",
              file=sys.stderr, flush=True)

    # 3) the linear-merge superstep compiled on-chip (sort batch only +
    # streaming merge-compact kernel — ops/pallas_merge.py)
    codes = make_reads(0.15, 8, 150, seed=5)
    golden = codec.golden_count(codes, 51)
    cfg = SortCounterConfig(
        k=51, batch_windows=1 << 17, rows=1 << 9, superbatch_batches=2,
        prefix_cap=1 << 18, min_abundance=1, compactor="merge")
    c = SortKmerCounter(cfg).count_codes(codes)
    ok = c.as_dict() == golden
    all_ok = all_ok and ok
    results["golden_equality_merge_kernel"] = (
        f"PASS ({len(golden)} distinct)" if ok else "FAIL")
    print(f"# verify merge kernel: {results['golden_equality_merge_kernel']}",
          file=sys.stderr, flush=True)

    # 4) packed window-key extraction (direct shift-or from the packed
    # words) composed with each superstep family
    for compactor in ("auto", "merge"):
        cfg = SortCounterConfig(
            k=51, batch_windows=1 << 17, rows=1 << 9, superbatch_batches=2,
            prefix_cap=1 << 18, min_abundance=1, compactor=compactor,
            winkeys="packed")
        c = SortKmerCounter(cfg).count_codes(codes)
        ok = c.as_dict() == golden
        all_ok = all_ok and ok
        results[f"golden_equality_packed_{compactor}"] = (
            "PASS" if ok else "FAIL")
        print(f"# verify packed {compactor}: "
              f"{results[f'golden_equality_packed_{compactor}']}",
              file=sys.stderr, flush=True)

    # 5) the super-k-mer (minimizer-run) pipeline compiled on-chip
    # (ops/skm.py): streaming run-store supersteps (Pallas compact at
    # ebits=26) + the compiled finalize expansion.  The XLA-only tail is
    # covered by the CPU suite (tests/test_skm.py) — on-chip budget goes
    # to the compiled path.
    from kaarme_tpu.models.skm_counter import SkmCounter, SkmCounterConfig

    for k in (51, 31):
        codes = make_reads(0.15, 8, 150, seed=3)
        golden = codec.golden_count(codes, k)
        cfg = SkmCounterConfig(
            k=k, batch_windows=1 << 17, rows=1 << 9,
            superbatch_batches=2, prefix_cap=1 << 18, min_abundance=1)
        c = SkmCounter(cfg).count_codes(codes)
        ok = c.as_dict() == golden
        all_ok = all_ok and ok
        results[f"golden_equality_skm_k{k}"] = (
            f"PASS ({len(golden)} distinct)" if ok else
            f"FAIL (got {len(c.as_dict())} vs {len(golden)} distinct)")
        print(f"# verify skm k={k}: {results[f'golden_equality_skm_k{k}']}",
              file=sys.stderr, flush=True)
    results["verdict"] = "PASS" if all_ok else "FAIL"
    print(json.dumps(results))
    return 0 if all_ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=51)
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--coverage", type=int, default=30,
                    help="read coverage depth (30x = standard Illumina "
                         "sequencing depth; also long enough to measure "
                         "the pipeline's steady state instead of the "
                         "first-transfer latency)")
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batch-log2", type=int, default=23)
    ap.add_argument("--rows-log2", type=int, default=12)
    ap.add_argument("--superbatch", type=int, default=4,
                    help="device batches fused per superstep dispatch")
    ap.add_argument("--merge-every", type=int, default=2)
    ap.add_argument("--prefix-log2", type=int, default=23,
                    help="initial distinct-store capacity (log2); 2^23 matches "
                         "the reference README's own -s 8000000 sizing for this "
                         "workload (growth-replay would otherwise double work)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--compactor", default="auto",
                    help="superstep variant (auto/pallas/xla/merge/...)")
    ap.add_argument("--winkeys", default="auto",
                    help="window-key extraction (auto/packed/codes/legacy)")
    ap.add_argument("--pipeline", default="skm",
                    help="counting pipeline: skm (minimizer-run dedup, "
                         "ops/skm.py — the default since it beats classic "
                         "on-chip: BENCHMATRIX_r04) or classic (one sorted "
                         "row per window)")
    ap.add_argument("--verify", action="store_true",
                    help="correctness mode: count a small workload on the "
                         "real device (all Pallas kernels active), diff "
                         "against the golden oracle, and run the compiled "
                         "Mosaic regression cases; prints PASS/FAIL JSON")
    args = ap.parse_args()

    import jax

    from kaarme_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kaarme_tpu.models.sort_counter import SortCounterConfig, SortKmerCounter

    if args.verify:
        return run_verify(args)

    k = args.k
    codes = make_reads(args.genome_mb, args.coverage, args.read_len)
    n_windows = int((codes.shape[0] // (args.read_len + 1))
                    * (args.read_len - k + 1))

    def drain(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf[:1])

    common = dict(
        k=k, batch_windows=1 << args.batch_log2, rows=1 << args.rows_log2,
        merge_every=args.merge_every, superbatch_batches=args.superbatch,
        prefix_cap=1 << args.prefix_log2, min_abundance=2,
    )
    if args.pipeline == "skm":
        from kaarme_tpu.models.skm_counter import SkmCounter, SkmCounterConfig

        def make_counter():
            return SkmCounter(SkmCounterConfig(**common))
    else:
        def make_counter():
            return SortKmerCounter(SortCounterConfig(
                compactor=args.compactor, winkeys=args.winkeys, **common))

    def run_once():
        c = make_counter()
        t0 = time.perf_counter()
        c.count_codes(codes)
        if args.pipeline == "skm":
            # include the finalize expansion (device-side, like the
            # classic pipeline's end state: a device-resident sorted
            # k-mer store; host OUTPUT transfer is excluded for both)
            store, _nd = c.finalize_device()
            drain(store)
        drain(c.prefix)
        dt = time.perf_counter() - t0
        return dt, c

    # warm-up / compile
    _, counter = run_once()

    best = float("inf")
    for _ in range(args.repeats):
        dt, counter = run_once()
        best = min(best, dt)

    kmers_per_s = n_windows / best
    print(
        f"# device={jax.devices()[0]} windows={n_windows} time={best:.3f}s "
        f"distinct={counter.n_distinct} k={k} batches={counter.stats['batches']} "
        f"merges={counter.stats['compactions']}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "canonical_kmers_per_sec_per_chip",
        "value": round(kmers_per_s),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / 1e9, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
