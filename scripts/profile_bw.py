"""Find the machine's true achievable HBM bandwidth: XLA elementwise on
f32/u32 at various sizes, a Pallas tiled copy kernel, and an MXU matmul
sanity check.  Decides whether a Pallas radix sort can beat lax.sort."""

import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[:1])


def timeit(f, *args, reps=3):
    out = f(*args); drain(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(*args); drain(out)
        best = min(best, time.perf_counter() - t0)
    return best


@partial(jax.jit, static_argnames=("iters",))
def f32_loop(x, iters: int):
    def body(i, x):
        return x * jnp.float32(1.0000001) + jnp.float32(0.0)
    return jax.lax.fori_loop(0, iters, body, x)


@partial(jax.jit, static_argnames=("iters",))
def add_loop(x, iters: int):
    def body(i, x):
        return x + jnp.uint32(1)
    return jax.lax.fori_loop(0, iters, body, x)


def main():
    rng = np.random.default_rng(0)

    for mb in (64, 256, 1024):
        n = mb * (1 << 20) // 4
        x = jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.uint32))
        drain(x)
        ITERS = 8
        t = timeit(add_loop, x, ITERS) / ITERS
        print(f"u32 add {mb}MB: {t*1e3:7.2f}ms/op -> {2*mb/1024/t:6.1f} GB/s r+w")
        xf = jnp.asarray(rng.random(n, dtype=np.float32))
        drain(xf)
        t = timeit(f32_loop, xf, ITERS) / ITERS
        print(f"f32 fma {mb}MB: {t*1e3:7.2f}ms/op -> {2*mb/1024/t:6.1f} GB/s r+w")

    # 2D layouts (maybe 1D arrays tile badly)
    x2 = jnp.asarray(rng.integers(0, 2**31, size=(8192, 32768), dtype=np.uint32))  # 1GB
    drain(x2)
    t = timeit(add_loop, x2, 8) / 8
    print(f"u32 add 1GB 2D(8192x32768): {t*1e3:7.2f}ms/op -> {2/t:6.1f} GB/s r+w")

    # Pallas copy kernel, tiled (512, 1024) f32 blocks
    M, N = 8192, 32768

    def copy_kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] + jnp.uint32(1)

    @jax.jit
    def pallas_add(x):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.uint32),
            grid=(M // 512, N // 1024),
            in_specs=[pl.BlockSpec((512, 1024), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((512, 1024), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )(x)

    @partial(jax.jit, static_argnames=("iters",))
    def pallas_loop(x, iters: int):
        return jax.lax.fori_loop(0, iters, lambda i, x: pallas_add(x), x)

    t = timeit(pallas_loop, x2, 8) / 8
    print(f"pallas add 1GB: {t*1e3:7.2f}ms/op -> {2/t:6.1f} GB/s r+w")

    # MXU sanity: 8192^3 and 16384x8192x8192 bf16
    a = jnp.asarray(rng.random((8192, 8192), np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.random((8192, 8192), np.float32), jnp.bfloat16)
    drain((a, b))

    @partial(jax.jit, static_argnames=("iters",))
    def mm_loop(a, b, iters: int):
        def body(i, a):
            return jnp.dot(a, b, preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, a)

    t = timeit(mm_loop, a, b, 8) / 8
    fl = 2 * 8192**3
    print(f"matmul 8192^3 bf16: {t*1e3:7.2f}ms/op -> {fl/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
