"""On-chip primitive re-measurement for the round-3 architecture choice.

Round-1's machine profile (DESIGN.md section 1) measured gather/scatter/
cumsum in the eager, per-dispatch era whose elementwise numbers were
later shown 17x off.  The super-k-mer (run-dedup) design and any
hash-table formulation hinge on the real rates of exactly these
primitives, so measure them honestly (jitted, queue drained) before
committing to a design:

  1. gather: random u32, 1D table sizes 32M/1M; multi-word span gather
     (idx[:,None] + arange(7), the run-content fetch pattern);
  2. scatter / scatter-add: n->n random, and R->R at run density;
  3. cumsum/cummax: 1D lax vs 2D minor-axis log-shift + row carry;
  4. elementwise with per-element (variable) shift amounts;
  5. the repeat trick: word[i//16] via broadcast+reshape (gather-free);
  6. interleave: stack 16 phase arrays -> transpose-reshape (the packed
     winkeys output pattern, suspected cause of its 5x bench loss);
  7. sliding-window min over 36 positions (log-shift formulation);
  8. one-hot matmul segment-pack on the MXU: route C=128 lane values
     into S=16 run slots per row (batched f32 dot) — the TPU-native
     replacement for within-row gather/scatter.

Run: python scripts/profile_primitives.py [--n-log2 25]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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
    mrec = n / 1e6
    rng = np.random.default_rng(0)

    def u32(m, hi=1 << 32):
        return jax.device_put(jnp.asarray(
            rng.integers(0, hi, size=m, dtype=np.uint64).astype(np.uint32)))

    table = u32(n)
    small = u32(1 << 20)
    idx_n = jax.device_put(jnp.asarray(
        rng.integers(0, n, size=n, dtype=np.int64).astype(np.int32)))
    R = n // 8
    idx_r = jax.device_put(jnp.asarray(
        rng.integers(0, n - 16, size=R, dtype=np.int64).astype(np.int32)))
    drain((table, small, idx_n, idx_r))

    print(f"== gather (n={n>>20}M) ==")
    t = timeit(jax.jit(lambda t_, i: jnp.take(t_, i)), table, idx_n)
    print(f"  take n<-n random:        {t*1e3:7.0f}ms -> {mrec/t:.0f} M/s")
    t = timeit(jax.jit(lambda t_, i: jnp.take(t_, i & jnp.int32((1 << 20) - 1))),
               small, idx_n)
    print(f"  take n<-1M table:        {t*1e3:7.0f}ms -> {mrec/t:.0f} M/s")
    span = jax.jit(lambda t_, i: jnp.take(t_, i[:, None] + jnp.arange(7)[None, :]))
    t = timeit(span, table, idx_r)
    print(f"  span take R={R>>20}M x 7 words:  {t*1e3:7.0f}ms -> "
          f"{R*7/1e6/t:.0f} M/s")

    print("== scatter ==")
    f = jax.jit(lambda t_, i, v: t_.at[i].add(v))
    t = timeit(f, table, idx_n, table)
    print(f"  scatter-add n->n:        {t*1e3:7.0f}ms -> {mrec/t:.0f} M/s")
    f = jax.jit(lambda i, v: jnp.zeros((R,), jnp.uint32).at[i & jnp.int32(R - 1)].add(v))
    t = timeit(f, idx_r, u32(R))
    print(f"  scatter-add R->R (R={R>>20}M): {t*1e3:7.0f}ms -> {R/1e6/t:.0f} M/s")
    f = jax.jit(lambda t_, i, v: t_.at[i].set(v, mode="drop", unique_indices=True))
    t = timeit(f, table, idx_n, table)
    print(f"  scatter-set n->n unique: {t*1e3:7.0f}ms -> {mrec/t:.0f} M/s")

    print("== cumulative ==")
    t = timeit(jax.jit(lambda x: jnp.cumsum(x.astype(jnp.uint32))), table)
    print(f"  cumsum 1D:               {t*1e3:7.0f}ms -> {mrec/t:.0f} M/s")
    t = timeit(jax.jit(lambda x: jax.lax.cummax(
        x.astype(jnp.int32), axis=0)), table)
    print(f"  cummax 1D:               {t*1e3:7.0f}ms -> {mrec/t:.0f} M/s")

    def cumsum2d(x):
        # minor-axis log-shift cumsum + row-total carry (exclusive scan
        # over 4096 row totals is tiny)
        g = x.reshape(4096, -1).astype(jnp.uint32)
        c = g.shape[1]
        s = 1
        while s < c:
            g = g + jnp.pad(g, ((0, 0), (s, 0)))[:, :c]
            s <<= 1
        tot = jnp.cumsum(g[:, -1])
        carry = jnp.concatenate([jnp.zeros((1,), jnp.uint32), tot[:-1]])
        return (g + carry[:, None]).reshape(-1)

    t = timeit(jax.jit(cumsum2d), table)
    print(f"  cumsum 2D log-shift:     {t*1e3:7.0f}ms -> {mrec/t:.0f} M/s")

    print("== elementwise shapes ==")
    sh = jax.jit(lambda a, b, s: (a >> s) | (b << (jnp.uint32(32) - s)))
    svec = (table & jnp.uint32(15)) * jnp.uint32(2) + jnp.uint32(1)
    t = timeit(sh, table, small[idx_n & jnp.int32((1 << 20) - 1)], svec)
    print(f"  variable-shift combine:  {t*1e3:7.0f}ms -> {mrec/t:.0f} M/s")
    rep = jax.jit(lambda w: jnp.broadcast_to(w[:, None], (w.shape[0], 16)).reshape(-1))
    words = u32(n // 16)
    t = timeit(rep, words)
    print(f"  repeat x16 (w[i//16]):   {t*1e3:7.0f}ms -> {mrec/t:.0f} M out/s")

    def interleave(w):
        cols = [w + jnp.uint32(j) for j in range(16)]
        return jnp.stack(cols, axis=1).reshape(-1)

    t = timeit(jax.jit(interleave), u32(n // 16))
    print(f"  stack16+reshape:         {t*1e3:7.0f}ms -> {mrec/t:.0f} M out/s")

    print("== sliding min (w=36, log-shift) ==")

    def slmin(x):
        w = 36
        s = 1
        y = x
        while s < w:
            step = min(s, w - s)
            y = jnp.minimum(y, jnp.pad(y, (0, step),
                                       constant_values=np.uint32(0xFFFFFFFF))[step:])
            s += step
        return y

    t = timeit(jax.jit(slmin), table)
    print(f"  sliding-min36:           {t*1e3:7.0f}ms -> {mrec/t:.0f} M/s")

    print("== one-hot matmul segment-pack (MXU) ==")
    B, C, S = n // 128, 128, 16
    vals = table.reshape(B, C)
    runidx = jax.device_put(jnp.asarray(
        np.minimum(np.add.accumulate(
            rng.random((B, C)) < 0.08, axis=1), S - 1).astype(np.int8)))
    drain(runidx)

    def pack(vals, runidx):
        oh = (runidx[:, :, None] == jnp.arange(S, dtype=jnp.int8)[None, None, :])
        lo = jnp.einsum("bc,bcs->bs", (vals & jnp.uint32(0xFFFF)).astype(jnp.float32),
                        oh.astype(jnp.float32))
        hi = jnp.einsum("bc,bcs->bs", (vals >> jnp.uint32(16)).astype(jnp.float32),
                        oh.astype(jnp.float32))
        return (hi.astype(jnp.uint32) << jnp.uint32(16)) | lo.astype(jnp.uint32)

    t = timeit(jax.jit(pack), vals, runidx)
    print(f"  onehot-pack {B>>10}K x {C} -> {S}: {t*1e3:7.0f}ms -> "
          f"{mrec/t:.0f} M in/s (1 u32 col)")


if __name__ == "__main__":
    main()
