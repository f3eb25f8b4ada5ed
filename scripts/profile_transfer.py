"""Measure host->device transfer behavior through the tunnel:
- rate vs size (fixed cost + per-byte)
- do queued transfers pipeline (fixed cost once) or serialize?
- does an async device_put overlap with device compute?
Also: sort cost matrix (num_keys x ncols) to pick the cheapest merge
formulation, and looped gather/scatter rates.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

dev = jax.devices()[0]


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[:1])


def main():
    rng = np.random.default_rng(0)

    # ---- transfer size sweep ----
    for mb in (1, 4, 16, 64):
        h = rng.integers(0, 2**32, size=mb * (1 << 20) // 4, dtype=np.uint32)
        d = jax.device_put(h, dev); drain(d)  # warm path
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(h, dev)
            drain(d)
            best = min(best, time.perf_counter() - t0)
        print(f"h2d {mb:3d}MB: {best*1e3:8.1f}ms  -> {mb/best:7.1f} MB/s")

    # ---- do queued transfers pipeline? 4x16MB back to back ----
    hs = [rng.integers(0, 2**32, size=(1 << 22), dtype=np.uint32) for _ in range(4)]
    ds = [jax.device_put(h, dev) for h in hs]; drain(ds)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ds = [jax.device_put(h, dev) for h in hs]
        drain(ds)
        best = min(best, time.perf_counter() - t0)
    print(f"h2d 4x16MB queued: {best*1e3:8.1f}ms (vs 4x single above)")

    # ---- transfer/compute overlap ----
    @partial(jax.jit, static_argnames=("iters",))
    def burn(x, iters: int):
        def body(i, x):
            return jax.lax.sort((x,), num_keys=1)[0]
        return jax.lax.fori_loop(0, iters, body, x)

    x = jax.device_put(rng.integers(0, 2**32, size=(1 << 24), dtype=np.uint32), dev)
    drain(x)
    h = hs[0]
    out = burn(x, 8); drain(out)  # compile
    # compute alone
    t0 = time.perf_counter(); out = burn(x, 8); drain(out)
    t_compute = time.perf_counter() - t0
    # transfer alone
    t0 = time.perf_counter(); d = jax.device_put(h, dev); drain(d)
    t_xfer = time.perf_counter() - t0
    # both: launch compute then transfer while running
    t0 = time.perf_counter()
    out = burn(x, 8)
    d = jax.device_put(h, dev)
    drain(out); drain(d)
    t_both = time.perf_counter() - t0
    print(f"overlap: compute={t_compute*1e3:.0f}ms xfer={t_xfer*1e3:.0f}ms both={t_both*1e3:.0f}ms "
          f"(full overlap ~= max, none ~= sum)")

    # ---- sort cost matrix (looped, per-op) ----
    N = 1 << 24
    cols8 = [jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32)) for _ in range(8)]
    drain(cols8)

    @partial(jax.jit, static_argnames=("nk", "nc", "iters"))
    def sort_loop(cols, nk: int, nc: int, iters: int):
        def body(i, cols):
            cols = (cols[0] ^ i.astype(jnp.uint32),) + cols[1:]
            return jax.lax.sort(cols, num_keys=nk)
        return jax.lax.fori_loop(0, iters, body, cols[:nc])

    ITERS = 8
    for nk, nc in [(1, 1), (1, 2), (1, 4), (1, 5), (2, 2), (2, 4), (3, 3), (4, 4), (4, 5), (5, 5)]:
        f = lambda: sort_loop(tuple(cols8), nk, nc, ITERS)
        out = f(); drain(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter(); out = f(); drain(out)
            best = min(best, time.perf_counter() - t0)
        per = best / ITERS
        print(f"sort nk={nk} ncols={nc}: {per*1e3:7.2f}ms/op  {N/per/1e6:6.0f} M rec/s")

    # ---- looped gather / scatter-add ----
    idx = jnp.asarray(rng.integers(0, N, size=N, dtype=np.int32))
    drain(idx)

    @partial(jax.jit, static_argnames=("iters",))
    def gather_loop(x, idx, iters: int):
        def body(i, x):
            return x[idx] + jnp.uint32(1)
        return jax.lax.fori_loop(0, iters, body, x)

    out = gather_loop(x, idx, ITERS); drain(out)
    t0 = time.perf_counter(); out = gather_loop(x, idx, ITERS); drain(out)
    per = (time.perf_counter() - t0) / ITERS
    print(f"gather 16M<-16M: {per*1e3:7.2f}ms/op  {N/per/1e6:6.0f} M/s")

    @partial(jax.jit, static_argnames=("iters",))
    def scatter_loop(x, idx, iters: int):
        def body(i, x):
            return x.at[idx].add(jnp.uint32(1))
        return jax.lax.fori_loop(0, iters, body, x)

    out = scatter_loop(x, idx, ITERS); drain(out)
    t0 = time.perf_counter(); out = scatter_loop(x, idx, ITERS); drain(out)
    per = (time.perf_counter() - t0) / ITERS
    print(f"scatter-add 16M->16M: {per*1e3:7.2f}ms/op  {N/per/1e6:6.0f} M/s")


if __name__ == "__main__":
    main()
