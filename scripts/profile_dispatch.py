"""Is the measured 4.1 GB/s 'memory wall' real HBM bandwidth, or per-op
dispatch/tunnel overhead?  A/B: N ops as N dispatches vs N ops inside one
jit (lax.fori_loop) — a single dispatch.  If per-op time collapses in the
looped version, the wall is dispatch overhead and the fix is mega-fusion:
do an entire superbatch's work (all batches + merge) in ONE compiled call.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 24  # 16M u32 = 64 MB


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[:1])


def timeit(f, *args, reps=3):
    out = f(*args)
    drain(out)  # warm-up/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        drain(out)
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def ew_once(x):
    return x * jnp.uint32(3) + jnp.uint32(7)


@partial(jax.jit, static_argnames=("iters",))
def ew_loop(x, iters: int):
    def body(i, x):
        return x * jnp.uint32(3) + jnp.uint32(7)
    return jax.lax.fori_loop(0, iters, body, x)


@jax.jit
def sort1_once(x):
    return jax.lax.sort((x,), num_keys=1)[0]


@partial(jax.jit, static_argnames=("iters",))
def sort1_loop(x, iters: int):
    def body(i, x):
        # re-perturb so each sort does real work (xor with iota keeps u32)
        x = x ^ (jax.lax.broadcasted_iota(jnp.uint32, x.shape, 0) * jnp.uint32(2654435761) + i.astype(jnp.uint32))
        return jax.lax.sort((x,), num_keys=1)[0]
    return jax.lax.fori_loop(0, iters, body, x)


@jax.jit
def sort4_once(a, b, c, d, p):
    return jax.lax.sort((a, b, c, d, p), num_keys=4)


@partial(jax.jit, static_argnames=("iters",))
def sort4_loop(a, b, c, d, p, iters: int):
    def body(i, carry):
        a, b, c, d, p = carry
        a = a ^ i.astype(jnp.uint32)
        return jax.lax.sort((a, b, c, d, p), num_keys=4)
    return jax.lax.fori_loop(0, iters, body, (a, b, c, d, p))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    drain(x)

    ITERS = 16

    t1 = timeit(ew_once, x)
    tl = timeit(ew_loop, x, ITERS)
    print(f"elementwise 64MB: single={t1*1e3:.2f}ms  loop({ITERS})={tl*1e3:.2f}ms -> per-op {tl/ITERS*1e3:.3f}ms  implied {128e-3/ (tl/ITERS):.1f} GB/s r+w")

    t1 = timeit(sort1_once, x)
    tl = timeit(sort1_loop, x, ITERS)
    print(f"sort 1-key 16M:  single={t1*1e3:.2f}ms  loop({ITERS})={tl*1e3:.2f}ms -> per-op {tl/ITERS*1e3:.2f}ms  implied {N/(tl/ITERS)/1e6:.0f} M rec/s")

    cols = [jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32)) for _ in range(5)]
    drain(cols)
    t1 = timeit(sort4_once, *cols)
    tl = timeit(sort4_loop, *cols, ITERS)
    print(f"sort 4-key 16M:  single={t1*1e3:.2f}ms  loop({ITERS})={tl*1e3:.2f}ms -> per-op {tl/ITERS*1e3:.2f}ms  implied {N/(tl/ITERS)/1e6:.0f} M rec/s")


if __name__ == "__main__":
    main()
