"""Mosaic capability probe for the compaction-kernel primitives:

  1. SMEM scratch carried across sequential grid steps
  2. dynamic-offset DMA write to an HBM output ref (cursor trick),
     with overlapping writes (later blocks overwrite earlier garbage)
  3. pltpu.roll on (S, 128) u32 along both axes + flattened-roll composite
  4. in-VMEM log-shift stream compaction of one block
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")


def test_smem_carry():
    S, L, NB = 64, 128, 16

    def kern(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0] = jnp.int32(0)

        acc_ref[0] = acc_ref[0] + jnp.sum(x_ref[...])
        o_ref[0] = acc_ref[0]

    x = jnp.ones((NB * S, L), jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        grid=(NB,),
        in_specs=[pl.BlockSpec((S, L), lambda i: (i, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(x)
    got, want = int(out[0]), NB * S * L
    print(f"1 smem carry: {'OK' if got == want else f'FAIL {got} != {want}'}")


def test_cursor_dma():
    # each block writes R rows at a data-dependent cursor; later blocks
    # overwrite earlier blocks' garbage tails
    S, L, NB = 8, 128, 8
    R = S * L
    rng = np.random.default_rng(0)
    alive_counts = rng.integers(100, R, size=NB)

    def kern(cnt_ref, x_ref, o_ref, cur_ref, vmem, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cur_ref[0] = jnp.int32(0)

        vmem[...] = x_ref[...]
        cur = cur_ref[0]
        dma = pltpu.make_async_copy(
            vmem, o_ref.at[pl.ds(cur, S), :], sem)
        dma.start()
        dma.wait()
        cur_ref[0] = cur + cnt_ref[i]

    # counts in SUBLANE units for simplicity (cursor moves whole rows)
    cnt_rows = (alive_counts // L).astype(np.int32)
    x = jnp.arange(NB * S * L, dtype=jnp.int32).reshape(NB * S, L)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NB * S + S, L), jnp.int32),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((S, L), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((S, L), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )(jnp.asarray(cnt_rows), x)
    out = np.asarray(out)
    # emulate
    want = np.full((NB * S + S, L), -99, np.int64)
    xs = np.asarray(x)
    cur = 0
    for i in range(NB):
        want[cur:cur + S] = xs[i * S:(i + 1) * S]
        cur += int(cnt_rows[i])
    ok = np.array_equal(out[:cur + S], want[:cur + S])
    print(f"2 cursor dma: {'OK' if ok else 'FAIL'}")


def test_roll():
    S, L = 16, 128
    x = jnp.arange(S * L, dtype=jnp.uint32).reshape(S, L)

    def kern(x_ref, o1_ref, o2_ref, o3_ref):
        v = x_ref[...]
        o1_ref[...] = pltpu.roll(v, 3, 1)      # lane roll
        o2_ref[...] = pltpu.roll(v, 2, 0)      # sublane roll
        # flattened roll by m (< L): y.flat[i] = x.flat[i - m]
        m = 5
        xl = pltpu.roll(v, m, 1)
        xp = pltpu.roll(xl, 1, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        o3_ref[...] = jnp.where(lane < m, xp, xl)

    o1, o2, o3 = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((S, L), jnp.uint32)] * 3,
    )(x)
    xs = np.asarray(x)
    ok1 = np.array_equal(np.asarray(o1), np.roll(xs, 3, 1))
    ok2 = np.array_equal(np.asarray(o2), np.roll(xs, 2, 0))
    ok3 = np.array_equal(np.asarray(o3).ravel(), np.roll(xs.ravel(), 5))
    print(f"3 rolls: lane={'OK' if ok1 else 'FAIL'} sublane={'OK' if ok2 else 'FAIL'} flat={'OK' if ok3 else 'FAIL'}")


def _flat_roll(v, m, S, L):
    """y.flat[i] = v.flat[i - m] for 0 < m, static m (full wraparound)."""
    ml, ms = m % L, m // L
    y = pltpu.roll(v, ms, 0) if ms else v
    if ml:
        xl = pltpu.roll(y, ml, 1)
        xp = pltpu.roll(xl, 1, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        y = jnp.where(lane < ml, xp, xl)
    return y


def _cumsum_axis(x, axis, size):
    """Inclusive scan along an axis via Hillis-Steele log-shift adds
    (Mosaic has no cumsum lowering).  Wrapped contributions masked with
    an iota guard."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    out = x
    sh = 1
    while sh < size:
        rolled = pltpu.roll(out, sh, axis)
        out = out + jnp.where(idx >= sh, rolled, 0)
        sh *= 2
    return out


def test_compact():
    # log-shift stream compaction: alive rows packed to front, flat order
    S, L = 32, 128
    n = S * L
    rng = np.random.default_rng(1)
    alive_np = (rng.random(n) < 0.3).astype(np.int32)
    x_np = np.arange(n, dtype=np.uint32)

    def kern(x_ref, a_ref, o_ref, cnt_ref):
        v = x_ref[...]
        a = a_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        # shift distance per element: # dead before me (inclusive scan of
        # dead, exclusive): flattened cumsum via lane cumsum + row offsets
        dead = 1 - a
        lane_csum = _cumsum_axis(dead, 1, L)              # inclusive per row
        row_tot = lane_csum[:, L - 1:L]                    # (S,1)
        row_off = _cumsum_axis(row_tot, 0, S) - row_tot    # exclusive row base
        s = lane_csum - dead + row_off                     # exclusive flat cumsum
        # monotone log-shift compaction
        cur, sh = v, s
        alive = a
        for j in range(14):  # 2^14 > n
            bit = (sh >> j) & 1
            move = bit * alive
            cand = _flat_roll(cur, -(1 << j) % n, S, L) if True else cur
            mvs = _flat_roll(move, -(1 << j) % n, S, L)
            shs = _flat_roll(sh, -(1 << j) % n, S, L)
            als = _flat_roll(alive, -(1 << j) % n, S, L)
            # element i receives from i + 2^j if that src moves by 2^j now
            take = mvs
            cur = jnp.where(take == 1, cand, cur)
            sh = jnp.where(take == 1, shs, sh)
            alive = jnp.where(take == 1, als, alive * (1 - move))
        o_ref[...] = jnp.where(alive == 1, cur, jnp.uint32(0xFFFFFFFF))
        cnt_ref[0] = jnp.sum(a)

    out, cnt = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((S, L), jnp.uint32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
    )(jnp.asarray(x_np.reshape(S, L)), jnp.asarray(alive_np.reshape(S, L)))
    got = np.asarray(out).ravel()
    na = int(cnt[0])
    want = x_np[alive_np.astype(bool)]
    ok = np.array_equal(got[:na], want) and np.all(got[na:] == 0xFFFFFFFF)
    print(f"4 log-shift compaction: {'OK' if ok else 'FAIL'} ({na} alive)")
    if not ok:
        print("   got ", got[:16])
        print("   want", want[:16])


if __name__ == "__main__":
    test_smem_carry()
    test_cursor_dma()
    test_roll()
    test_compact()
