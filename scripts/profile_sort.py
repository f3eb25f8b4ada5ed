"""On-chip A/B of batch-sort strategies — the sort is the superstep's
dominant cost (~60% with the Pallas compactor), so this measures every
plausible way to make XLA's TPU sort cheaper at bench shapes before any
deeper kernel work:

  1. arity/width scaling: 1..5 uint32 columns, keys vs payload split;
  2. row-blocked sort: lax.sort of (G, n/G) sorts G independent runs in
     one dispatch at log(n/G) depth — the feeder for a G-way merge;
  3. descending-by-NOT vs ascending (merge superstep orientation);
  4. uint64 key packing (2 u32 -> 1 u64 column);
  5. presorted / random / low-entropy inputs (XLA sort sensitivity).

Run: python scripts/profile_sort.py [--n-log2 25]
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


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1])


def timeit(f, *args, reps=3):
    out = f(*args)
    drain(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        drain(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-log2", type=int, default=25)
    args = ap.parse_args()
    n = 1 << args.n_log2
    rng = np.random.default_rng(0)
    cols = [jax.device_put(jnp.asarray(rng.integers(0, 1 << 32, size=n,
                                                    dtype=np.uint64)
                                       .astype(np.uint32)))
            for _ in range(5)]
    drain(cols)
    mrec = n / 1e6

    print(f"== lax.sort arity/width scaling, n={n>>20}M rows ==")
    for ncols in (1, 2, 3, 4, 5):
        for nkeys in {1, ncols}:
            f = jax.jit(lambda *c, nk=nkeys: jax.lax.sort(c, num_keys=nk),
                        static_argnames=())
            t = timeit(f, *cols[:ncols])
            print(f"  sort {ncols} cols num_keys={nkeys}: {t*1e3:7.0f}ms "
                  f"-> {mrec/t:.0f} M rec/s")

    print("== row-blocked sort (G independent runs, one dispatch) ==")
    for g_log2 in (0, 2, 4, 6):
        G = 1 << g_log2
        shaped = [c.reshape(G, -1) for c in cols[:4]]
        f = jax.jit(lambda *c: jax.lax.sort(c, num_keys=4, dimension=1))
        t = timeit(f, *shaped)
        print(f"  sort (G={G:3d}, {n//G>>20 or (n//G>>10)/1024}M) 4 cols: "
              f"{t*1e3:7.0f}ms -> {mrec/t:.0f} M rec/s")

    print("== descending via bitwise NOT (merge superstep orientation) ==")
    f = jax.jit(lambda *c: jax.lax.sort(tuple(~x for x in c), num_keys=4))
    t = timeit(f, *cols[:4])
    print(f"  NOT+sort 4 cols: {t*1e3:7.0f}ms -> {mrec/t:.0f} M rec/s")

    print("== uint64 packing (2 u32 -> 1 u64) ==")
    try:
        jax.config.update("jax_enable_x64", True)
        a64 = (cols[0].astype(jnp.uint64) << jnp.uint64(32)) | cols[1].astype(jnp.uint64)
        b64 = (cols[2].astype(jnp.uint64) << jnp.uint64(32)) | cols[3].astype(jnp.uint64)
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
        t = timeit(f, a64, b64)
        print(f"  sort 2 u64 cols: {t*1e3:7.0f}ms -> {mrec/t:.0f} M rec/s")
    except Exception as e:  # pragma: no cover - x64 may be unsupported
        print(f"  u64 sort unavailable: {e}")
    finally:
        jax.config.update("jax_enable_x64", False)

    print("== input-order sensitivity (4 cols) ==")
    f = jax.jit(lambda *c: jax.lax.sort(c, num_keys=4))
    pre = jax.jit(lambda *c: jax.lax.sort(c, num_keys=4))(*cols[:4])
    drain(pre)
    t = timeit(f, *pre)
    print(f"  presorted: {t*1e3:7.0f}ms -> {mrec/t:.0f} M rec/s")
    lowent = [jax.device_put(jnp.asarray(
        rng.integers(0, 16, size=n, dtype=np.uint64).astype(np.uint32)))
        for _ in range(4)]
    drain(lowent)
    t = timeit(f, *lowent)
    print(f"  low-entropy (16 values): {t*1e3:7.0f}ms -> {mrec/t:.0f} M rec/s")


if __name__ == "__main__":
    main()
