"""Bisect the segsum_compact kernel cost: time cut-down kernel variants
at 36M rows to find the pathological stage."""

import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")
from kaarme_tpu.ops import pallas_compact as pc

_LANES = 128


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(f, *args, reps=2):
    out = f(*args); drain(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(*args); drain(out)
        best = min(best, time.perf_counter() - t0)
    return best


def variant(level, S=256):
    """level: 0 copy-only, 1 +boundary+cummax, 2 +cumsum, 3 +compact loop,
    4 +dma cursor"""
    W = 4

    def kernel(*refs):
        in_refs = refs[:W]
        out_refs = refs[W:W + W + 1]
        nd_ref = refs[2 * W + 1]
        carry = refs[2 * W + 2]
        vout = refs[2 * W + 3]
        sem = refs[2 * W + 4]
        i = pl.program_id(0)
        n = S * _LANES

        @pl.when(i == 0)
        def _():
            for w in range(W + 4):
                carry[w] = jnp.uint32(0)
            nd_ref[0] = jnp.int32(0)
            nd_ref[1] = jnp.int32(0)

        key = [in_refs[w][...] for w in range(W)]
        fpos, _ = pc._flat_pos(S)
        is0 = fpos == 0

        alive = jnp.where((key[0] & 7) == 0, jnp.int32(1), jnp.int32(0))
        ocnt = key[0] & jnp.uint32(255)

        if level >= 1:
            neq = jnp.zeros((S, _LANES), jnp.int32)
            for w in range(W):
                pk = jnp.where(is0, carry[w], pc._flat_roll1(key[w], S))
                neq = jnp.maximum(neq, jnp.where(pk != key[w], 1, 0))
            gpos = i * n + fpos
            cand = jnp.where(neq == 1, gpos, jnp.int32(-1))
            segstart = jnp.maximum(pc._cummax_flat(cand, S, jnp.int32(-1)),
                                   carry[W + 2].astype(jnp.int32))
            alive = alive * jnp.minimum(segstart + 1, 1)
        if level >= 2:
            sh = pc._cumsum_flat_incl(1 - alive, S) - (1 - alive)
        cur = key + [ocnt]
        av = alive
        if level >= 3:
            sv = sh
            d = 1
            while d < n:
                mv = av * jnp.where((sv & d) != 0, 1, 0)
                take = pc._flat_roll_back(mv, d, S, jnp.int32(0))
                cur = [jnp.where(take == 1,
                                 pc._flat_roll_back(c, d, S, pc.SENT), c)
                       for c in cur]
                sv = jnp.where(take == 1,
                               pc._flat_roll_back(sv, d, S, jnp.int32(0)), sv)
                av = jnp.where(take == 1, jnp.int32(1), av * (1 - mv))
                d *= 2

        for w in range(W):
            vout[w] = jnp.where(av == 1, cur[w], pc.SENT)
        vout[W] = jnp.where(av == 1, cur[W], jnp.uint32(0))

        acount = jnp.sum(alive)
        arows = (acount + (_LANES - 1)) // _LANES
        if level >= 4:
            cursor = carry[W + 3].astype(jnp.int32)
        else:
            cursor = i * S
        dmas = [pltpu.make_async_copy(
            vout.at[w], out_refs[w].at[pl.ds(cursor, S), :], sem.at[w])
            for w in range(W + 1)]
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()
        if level >= 4:
            carry[W + 3] = (cursor + arows).astype(jnp.uint32)
        nd_ref[0] = nd_ref[0] + acount
        nd_ref[1] = (cursor + arows) * _LANES

    return kernel


def run(level, N, S=256):
    W = 4
    nblocks = N // (S * _LANES)
    out_rows = N // _LANES + S
    kern = variant(level, S)
    f = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((out_rows, _LANES), jnp.uint32)
                   for _ in range(W + 1)]
        + [jax.ShapeDtypeStruct((2,), jnp.int32)],
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((S, _LANES), lambda i: (i, 0))
                  for _ in range(W)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(W + 1)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.SMEM((W + 4,), jnp.uint32),
            pltpu.VMEM((W + 1, S, _LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((W + 1,)),
        ],
    )
    fj = jax.jit(f)
    rng = np.random.default_rng(0)
    cols = [jnp.asarray(
        rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
        .reshape(-1, _LANES)) for _ in range(W)]
    drain(cols)
    t = timeit(fj, *cols)
    print(f"level {level} S={S}: {t*1e3:7.0f}ms")


if __name__ == "__main__":
    N = 36 * (1 << 20)
    for level in (0, 1, 2, 3, 4):
        run(level, N)
