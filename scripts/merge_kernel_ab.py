"""Settle ops/pallas_merge.py (VERDICT r3 item 8 / r4 weak 7): the one
experiment the kernel's O(P + n) claim rides on — a LARGE live prefix
with a SMALL batch, where re-sorting the prefix every superstep
(O((P+n) log)) should lose to the linear merge.

Classic pipeline, k=51.  A/B at growing prefix/batch ratios:
  sort superstep:   lax.sort(prefix + batch) + Pallas compact
  merge superstep:  sort(batch) only + streaming merge-path kernel

Writes MERGEAB_r05.json with per-ratio times; the decision rule is in
the output: keep the kernel if it wins anywhere real, else demote.

    python scripts/merge_kernel_ab.py [--out MERGEAB_r05.json]
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")

from bench import make_reads
from kaarme_tpu.ops import sortcount


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1])


def timed(f, *args, reps=3):
    out = f(*args)
    drain(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        drain(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MERGEAB_r05.json")
    ap.add_argument("--k", type=int, default=51)
    ap.add_argument("--n-log2", type=int, default=22,
                    help="batch windows per superstep (small, so the "
                         "prefix dominates)")
    ap.add_argument("--prefix-log2", type=int, nargs="+",
                    default=[23, 24, 25])
    args = ap.parse_args()
    k = args.k
    n = 1 << args.n_log2
    eb = sortcount.embed_bits(k)

    out = {"device": str(jax.devices()[0]), "k": k, "batch_windows": n}

    # realistic batch input
    codes = make_reads(n / 1e6 / 0.66, 1, 150)
    need = n + k - 1
    sl = codes[:need]
    if sl.shape[0] < need:
        sl = np.concatenate([sl, np.full(need - sl.shape[0], 4, np.uint8)])
    packed, _ = sortcount.pack_stream_np(sl)
    seps = np.flatnonzero(sl >= 4).astype(np.uint32)
    sep = np.full(max(n // 128, 32), need, np.uint32)
    sep[: seps.shape[0]] = seps
    packed_d = jax.device_put(jnp.asarray(packed))
    sep_d = jax.device_put(jnp.asarray(sep))
    drain((packed_d, sep_d))

    rows = 1 << 11
    for plog in args.prefix_log2:
        P = sortcount.next_store_size(1 << plog)
        # build a REALISTIC full prefix: distinct sorted keys at ~90%
        # fill (random keys, sorted, unit counts embedded)
        rng = np.random.default_rng(7)
        fill = int(P * 0.9)
        from kaarme_tpu.utils.codec import words_per_kmer
        W = words_per_kmer(k)
        cols = []
        for w in range(W):
            c = np.full(P, 0xFFFFFFFF, np.uint32)
            c[:fill] = rng.integers(0, 1 << 32, fill, dtype=np.int64)\
                .astype(np.uint32)
            cols.append(c)
        # sort rows lexicographically (numpy): sort by tuple of columns
        order = np.lexsort(tuple(c[:fill] for c in reversed(cols)))
        for c in cols:
            c[:fill] = c[:fill][order]
        # embed count 1 in the trailing word's low ebits (left-aligned keys)
        cols[-1][:fill] = (cols[-1][:fill] & ~np.uint32((1 << eb) - 1)) | 1
        cnt = np.zeros(P, np.int32)
        cnt[:fill] = 1
        prefix = tuple(jnp.asarray(c) for c in cols) + (jnp.asarray(cnt),)
        drain(prefix)

        t_sort, _ = timed(lambda: sortcount.superstep_embedded(
            packed_d, sep_d, prefix, k=k, n=n, rows=rows, ebits=eb,
            pallas="on"))
        t_merge, _ = timed(lambda: sortcount.superstep_merged(
            packed_d, sep_d, prefix, k=k, n=n, rows=rows, ebits=eb,
            pallas="merge"))
        ratio = P / n
        out[f"P{P}"] = {
            "prefix_rows": P, "ratio_P_over_n": round(ratio, 1),
            "sort_superstep_ms": round(t_sort * 1e3, 1),
            "merge_superstep_ms": round(t_merge * 1e3, 1),
            "merge_wins": bool(t_merge < t_sort),
        }
        print(f"P={P} (P/n={ratio:.0f}x): sort {t_sort*1e3:.0f}ms "
              f"merge {t_merge*1e3:.0f}ms -> "
              f"{'MERGE' if t_merge < t_sort else 'SORT'} wins",
              flush=True)
        json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
