"""Measure alternatives for the two sorts in the superstep merge at
production scale (36M rows x 4 u32 cols) on the real chip:

  A. current: stable partition sort (dead flag + 4 cols)
  B. plain 4-col sort with full-sentinel dead rows (no flag, no stability)
  C. scatter-compaction: cumsum(alive) positions + .at[].set(mode=drop)
  D. merge sort arity scaling: 2/3/4 key cols
  E. minimal compiled Pallas kernel viability (copy + add)
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
from kaarme_tpu.ops import sortcount

_B = jax.lax.optimization_barrier


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1])


def timeit(f, *args, reps=2):
    out = f(*args); drain(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(*args); drain(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n = 36 * (1 << 20)
    rng = np.random.default_rng(0)
    # sorted-ish keys with ~12% alive rows (like a post-merge state)
    cols = [jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
            for _ in range(4)]
    alive_np = (rng.random(n) < 0.125).astype(np.int32)
    alive = jnp.asarray(alive_np)
    drain((cols, alive))

    # A: stable partition with dead flag (round-1 formulation)
    def part_stable(cols, alive):
        dead = (jnp.int32(1) - alive).astype(jnp.uint32)
        s = jax.lax.sort((dead,) + tuple(cols), num_keys=1, is_stable=True)
        return s[1:]
    t, _ = timeit(jax.jit(part_stable), cols, alive)
    print(f"A stable-flag partition 36M x 4c: {t*1e3:6.0f}ms")

    # B: plain 4-col sort, dead rows -> all-ones sentinels
    def part_plain(cols, alive):
        smask = jax.lax.bitcast_convert_type(-(1 - alive), jnp.uint32)
        cs = tuple(c | smask for c in cols)
        return jax.lax.sort(cs, num_keys=4)
    t, _ = timeit(jax.jit(part_plain), cols, alive)
    print(f"B plain 4-col sentinel sort:      {t*1e3:6.0f}ms")

    # B2: plain sort but only 1 key col (how does arity change cost?)
    def part_plain1(cols, alive):
        smask = jax.lax.bitcast_convert_type(-(1 - alive), jnp.uint32)
        cs = tuple(c | smask for c in cols)
        return jax.lax.sort(cs, num_keys=1)
    t, _ = timeit(jax.jit(part_plain1), cols, alive)
    print(f"B2 1-key sort + 3 payload:        {t*1e3:6.0f}ms")

    # C: scatter compaction
    def part_scatter(cols, alive):
        pos = jnp.cumsum(alive) - 1
        pos = _B(pos)
        tgt = jnp.where(alive == 1, pos, n)  # n -> dropped
        outs = []
        for c in cols:
            o = jnp.full((n,), sortcount.SENTINEL, jnp.uint32)
            outs.append(o.at[tgt].set(c, mode="drop", unique_indices=True))
        return tuple(outs)
    t, _ = timeit(jax.jit(part_scatter), cols, alive)
    print(f"C scatter compaction 4c:          {t*1e3:6.0f}ms")

    # D: merge-sort arity scaling
    for arity in (2, 3, 4):
        f = jax.jit(lambda cs: jax.lax.sort(tuple(cs), num_keys=len(cs)))
        t, _ = timeit(f, cols[:arity])
        print(f"D sort {arity} key cols:             {t*1e3:6.0f}ms")

    # D2: 4 cols but num_keys=2 (2 key + 2 payload)
    f = jax.jit(lambda cs: jax.lax.sort(tuple(cs), num_keys=2))
    t, _ = timeit(f, cols)
    print(f"D2 sort 2 keys + 2 payload:       {t*1e3:6.0f}ms")

    # E: minimal compiled Pallas kernel
    try:
        from jax.experimental import pallas as pl

        def kern(x_ref, y_ref, o_ref):
            o_ref[...] = x_ref[...] + y_ref[...]

        x = cols[0].reshape(-1, 128)
        y = cols[1].reshape(-1, 128)
        rows = x.shape[0]
        blk = 4096

        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0)),
                      pl.BlockSpec((blk, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0)),
        )
        fj = jax.jit(f)
        t, out = timeit(fj, x, y)
        ok = np.array_equal(np.asarray(out[:4]), np.asarray(x[:4] + y[:4]))
        print(f"E pallas add 144MB r+w:           {t*1e3:6.0f}ms  ok={ok} "
              f"({144e-3/t:.0f} GB/s)")
    except Exception as e:
        print(f"E pallas FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
