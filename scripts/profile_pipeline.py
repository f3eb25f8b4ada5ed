"""Pipeline wall-time breakdown on the bench workload (real chip).

Instruments the SortKmerCounter driver to find where end-to-end time
hides relative to device compute: host pack (worker thread), transfer
(device_put in _take_group), dispatch, drain (verification sync), and
everything else (gaps).  Run after any pipeline-ordering change.

    python scripts/profile_pipeline.py [--genome-mb 4.6 --coverage 30]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=51)
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batch-log2", type=int, default=23)
    ap.add_argument("--superbatch", type=int, default=4)
    ap.add_argument("--transfer-group", type=int, default=4)
    ap.add_argument("--prefix-log2", type=int, default=23)
    ap.add_argument("--compactor", default="auto")
    args = ap.parse_args()

    import jax

    from kaarme_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from bench import make_reads
    from kaarme_tpu.models import sort_counter as sc

    codes = make_reads(args.genome_mb, args.coverage, args.read_len)
    n_windows = int((codes.shape[0] // (args.read_len + 1))
                    * (args.read_len - args.k + 1))

    times = {"prepare": 0.0, "transfer": 0.0, "dispatch": 0.0,
             "drain": 0.0}

    class Probe(sc.SortKmerCounter):
        def _prepare(self, stream, n):
            t0 = time.perf_counter()
            out = super()._prepare(stream, n)
            times["prepare"] += time.perf_counter() - t0
            return out

        def _take_group(self, final):
            t0 = time.perf_counter()
            out = super()._take_group(final)
            times["transfer"] += time.perf_counter() - t0
            return out

        def _dispatch(self, *a, **kw):
            t0 = time.perf_counter()
            out = super()._dispatch(*a, **kw)
            times["dispatch"] += time.perf_counter() - t0
            return out

        def _drain(self, keep=0):
            t0 = time.perf_counter()
            out = super()._drain(keep)
            times["drain"] += time.perf_counter() - t0
            return out

    def run():
        cfg = sc.SortCounterConfig(
            k=args.k, batch_windows=1 << args.batch_log2,
            rows=1 << (args.batch_log2 // 2),
            superbatch_batches=args.superbatch,
            transfer_group=args.transfer_group,
            prefix_cap=1 << args.prefix_log2, min_abundance=2,
            compactor=args.compactor)
        c = Probe(cfg)
        for k_ in times:
            times[k_] = 0.0
        t0 = time.perf_counter()
        c.count_codes(codes)
        for leaf in jax.tree_util.tree_leaves(c.prefix):
            np.asarray(leaf[:1])
        wall = time.perf_counter() - t0
        return wall, c

    wall, c = run()       # warm-up/compile
    wall, c = run()
    other = wall - times["transfer"] - times["dispatch"] - times["drain"]
    print(f"device={jax.devices()[0]} windows={n_windows} "
          f"wall={wall:.2f}s -> {n_windows/wall/1e6:.1f}M w/s")
    print(f"  prepare (worker thread, overlapped): {times['prepare']:.2f}s")
    print(f"  transfer (_take_group incl. device_put): {times['transfer']:.2f}s")
    print(f"  dispatch: {times['dispatch']:.2f}s")
    print(f"  drain (verify sync): {times['drain']:.2f}s")
    print(f"  other/gaps: {other:.2f}s")
    print(f"  batches={c.stats['batches']} compactions={c.stats['compactions']} "
          f"grow={c.stats['grow_events']} build_s={c.stats['build_seconds']:.2f}")


if __name__ == "__main__":
    main()
