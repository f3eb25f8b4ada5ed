"""On-chip profile of the super-k-mer pipeline: compile time + run time
of the skm superstep at growing n, phase isolation (segmentation, pack,
sort+merge), and finalize expansion.

    python scripts/profile_skm.py [--n-log2 22 23 24] [--k 51]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")

from bench import make_reads
from kaarme_tpu.ops import skm, sortcount


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1])


def timeit(f, *args, reps=2):
    t0 = time.perf_counter()
    out = f(*args)
    drain(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        drain(out)
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-log2", type=int, nargs="+", default=[22, 23, 24])
    ap.add_argument("--k", type=int, default=51)
    ap.add_argument("--s-slots", type=int, default=96)
    args = ap.parse_args()
    k = args.k

    for nl in args.n_log2:
        n = 1 << nl
        codes_u8 = make_reads(n / 1e6 / 0.66, 1, 150)[: n + k - 1]
        packed, maskw = sortcount.pack_stream_np(
            np.concatenate([codes_u8,
                            np.full(max(0, n + k - 1 - codes_u8.shape[0]),
                                    4, np.uint8)]))
        packed_d = jax.device_put(jnp.asarray(packed))
        maskw_d = jax.device_put(jnp.asarray(maskw))
        drain((packed_d, maskw_d))

        L = n + k - 1
        Wc = skm.content_words(k)
        need_words = (n + 16 * (Wc - 1)) // 16 + 2

        def views(p, m):
            pk = jnp.concatenate([
                p, jnp.zeros((max(0, need_words - p.shape[0]),), jnp.uint32)])
            return pk, sortcount.invalid_from_dense(m, L)

        # phase 1: segmentation + run rows
        @jax.jit
        def seg(p, m):
            pk, inval = views(p, m)
            return skm.run_rows(pk, inval, k, n)

        t, c = timeit(seg, packed_d, maskw_d)
        print(f"n={n>>20}M k={k}  segmentation+rows: {t*1e3:6.0f}ms "
              f"({n/t/1e6:.0f} M w/s)  [compile+first {c:.1f}s]", flush=True)

        # phase 2: + slot pack
        @jax.jit
        def seg_pack(p, m):
            pk, inval = views(p, m)
            b, cols = skm.run_rows(pk, inval, k, n)
            return skm.pack_slots(b, cols, n, args.s_slots, k)

        t, c = timeit(seg_pack, packed_d, maskw_d)
        print(f"          + slot pack:        {t*1e3:6.0f}ms "
              f"({n/t/1e6:.0f} M w/s)  [compile+first {c:.1f}s]", flush=True)

        # phase 3: full superstep (sort + merge into empty prefix)
        cap = sortcount.next_store_size(max(n // 4, 1 << 13))
        prefix = sortcount.make_store(cap, skm.store_words(k))
        drain(prefix)

        for pmode in ("on", "off"):
            def step(p, m, pref, pmode=pmode):
                return skm.skm_superstep(p, m, pref, k=k, n=n,
                                         S=args.s_slots, dense=True,
                                         pallas=pmode)

            t, c = timeit(step, packed_d, maskw_d, prefix)
            (store, ndv) = step(packed_d, maskw_d, prefix)
            nd, ndu, mx = (int(x) for x in np.asarray(ndv))
            print(f"          superstep[{pmode:3s}]:     {t*1e3:6.0f}ms "
                  f"({n/t/1e6:.0f} M w/s)  [compile+first {c:.1f}s] "
                  f"runs={nd} used={ndu} maxtile={mx}", flush=True)

        # finalize at this store size (twice: compile+first vs warm).
        # NB: per-column extraction, NOT np.stack — stacking uint32 key
        # columns with the int32 count column promotes to int64 and the
        # round-trip back through jnp.asarray yields SIGNED key words
        # (breaks sort order/sentinels; finalize_counts now also coerces)
        cols_np = [np.asarray(col[:ndu]) for col in store]
        cnts = cols_np[-1].astype(np.int64)
        live = cnts > 0
        run_np = tuple(np.ascontiguousarray(c[live]) for c in cols_np[:-1]) \
            + (cnts[live].astype(np.int32),)
        for tag in ("first", "warm"):
            t0 = time.perf_counter()
            keys, cnt = skm.finalize_counts(run_np, k)
            tf = time.perf_counter() - t0
            print(f"          finalize[{tag}]({int(live.sum())} runs -> "
                  f"{keys.shape[0]} kmers): {tf*1e3:6.0f}ms", flush=True)

        # finalize phase isolation on the DEVICE-resident store (the
        # production dump() path): expansion alone, then + compact
        m = min(sortcount.next_store_size(max(ndu, 1)), store[0].shape[0])
        run_dev = tuple(col[:m] for col in store)

        @jax.jit
        def expand_only(rc):
            return skm.expand_chunk(rc, k=k)

        t, c = timeit(expand_only, run_dev)
        print(f"          expand_chunk[{m} rows]:  {t*1e3:6.0f}ms "
              f"[compile+first {c:.1f}s]", flush=True)
        for clamped in (False, True):
            @jax.jit
            def expand_compact(rc, clamped=clamped):
                return sortcount.compact(skm.expand_chunk(rc, k=k),
                                         clamped=clamped)

            t, c = timeit(expand_compact, run_dev)
            print(f"          + compact(clamped={clamped}): {t*1e3:6.0f}ms "
                  f"[compile+first {c:.1f}s]", flush=True)
        t0 = time.perf_counter()
        keys, cnt = skm.finalize_counts(run_dev, k)
        tf = time.perf_counter() - t0
        print(f"          finalize[device store]({m} rows -> "
              f"{keys.shape[0]} kmers): {tf*1e3:6.0f}ms", flush=True)


if __name__ == "__main__":
    main()
