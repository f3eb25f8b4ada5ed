"""On-chip probe: global lax.cummax/cummin vs 2-level tiled scans vs
log-shift sliding-window formulations, at segmentation-relevant shapes.

The skm segmentation (ops/skm.py:segment_runs) spends most of its
~210ms/16M in three scan-shaped passes:
  (a) sentinel mask: next-invalid-within-k  -> window-OR over k
  (b) ell: distance to next run start, capped at LMAX=16 -> window-min 16
  (c) pos1: distance since last TRUE start (global cummax, mod-16 used)

    python scripts/probe_scans.py [--n-log2 24]
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


def bench(f, *args, reps=3):
    out = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[:1]), out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[:1]), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-log2", type=int, default=24)
    args = ap.parse_args()
    n = 1 << args.n_log2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))

    @jax.jit
    def global_cummax(v):
        return jax.lax.cummax(v)

    @jax.jit
    def global_cummin_rev(v):
        return jax.lax.cummin(v, reverse=True)

    def two_level(g):
        @jax.jit
        def f(v):
            v2 = v.reshape(g, n // g)
            local = jax.lax.cummax(v2, axis=1)
            rowmax = local[:, -1]
            carry = jax.lax.cummax(rowmax)
            carry = jnp.concatenate(
                [jnp.full((1,), -(1 << 30), jnp.int32), carry[:-1]])
            return jnp.maximum(local, carry[:, None]).reshape(-1)
        return f

    def sliding_max(w):
        @jax.jit
        def f(v):
            y, s = v, 1
            while s < w:
                step = min(s, w - s)
                m = y.shape[0]
                y = jnp.maximum(jax.lax.slice(y, (0,), (m - step,)),
                                jax.lax.slice(y, (step,), (m,)))
                s += step
            return y
        return f

    t = bench(global_cummax, x)
    print(f"n=2^{args.n_log2}  global cummax:        {t*1e3:7.1f}ms")
    t = bench(global_cummin_rev, x)
    print(f"          global cummin(rev):    {t*1e3:7.1f}ms")
    for g in (1 << 10, 1 << 12, 1 << 13):
        f = two_level(g)
        ok = np.array_equal(np.asarray(f(x)), np.asarray(global_cummax(x)))
        t = bench(f, x)
        print(f"          2-level cummax g={g:5d}: {t*1e3:7.1f}ms  "
              f"{'OK' if ok else 'MISMATCH'}")
    for w in (16, 51):
        f = sliding_max(w)
        t = bench(f, x)
        print(f"          sliding max w={w:3d}:     {t*1e3:7.1f}ms")

    # chained (the segmentation does several of these back to back)
    @jax.jit
    def seg_shape(v):
        a = jax.lax.cummax(v)                       # pos1 scan
        b = jax.lax.cummin(v, reverse=True)         # ell scan
        c = jax.lax.cummin(v * 2 + 1, reverse=True)  # sentinel scan
        return a[-1] + b[0] + c[0]

    t = bench(seg_shape, x)
    print(f"          3 fused global scans:  {t*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
