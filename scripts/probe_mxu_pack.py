"""Mosaic capability spike for an MXU one-hot pack inside the skm
kernel (round-5): the log-shift dense pack costs ~129 ms/superstep —
15 iterations x 8 VMEM planes; routing rows per 512-window tile with a
one-hot matmul (the XLA pack_slots pattern, 1.1G inputs/s) would cut
it an order of magnitude IF Mosaic supports the needed shapes.

Probes, each compiled standalone on the chip:
  A. in-kernel lax.transpose of (8,128) -> (128,8) (layout pivot the
     one-hot build needs)
  B. plain 2D dot_general (64,512) @ (512,128) f32 in-kernel
  C. batched dot_general (8,64,512) @ (8,512,128)
  D. end-to-end micro: per-tile one-hot routing vs the log-shift, one
     block, correctness + time
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1])


def probe(name, fn, *args):
    try:
        out = fn(*args)
        drain(out)
        t0 = time.perf_counter()
        out = fn(*args)
        drain(out)
        dt = time.perf_counter() - t0
        print(f"{name}: OK ({dt*1e3:.1f}ms warm)", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL - {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


# A. transpose
def kern_a(x_ref, o_ref):
    o_ref[...] = jax.lax.transpose(x_ref[...], (1, 0))


@jax.jit
def run_a(x):
    return pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct((128, 8), jnp.float32),
    )(x)


xa = jnp.asarray(np.random.rand(8, 128).astype(np.float32))
out = probe("A transpose (8,128)->(128,8)", run_a, xa)
if out is not None:
    assert np.allclose(np.asarray(out), np.asarray(xa).T)
    print("  A correct", flush=True)


# B. plain 2D matmul
def kern_b(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@jax.jit
def run_b(a, b):
    return pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
    )(a, b)


aa = jnp.asarray(np.random.rand(64, 512).astype(np.float32))
bb = jnp.asarray(np.random.rand(512, 128).astype(np.float32))
out = probe("B dot (64,512)@(512,128)", run_b, aa, bb)
if out is not None:
    assert np.allclose(np.asarray(out),
                       np.asarray(aa) @ np.asarray(bb), rtol=1e-5)
    print("  B correct", flush=True)


# C. batched matmul
def kern_c(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@jax.jit
def run_c(a, b):
    return pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct((8, 64, 128), jnp.float32),
    )(a, b)


ca = jnp.asarray(np.random.rand(8, 64, 512).astype(np.float32))
cb = jnp.asarray(np.random.rand(8, 512, 128).astype(np.float32))
out = probe("C batched dot (8,64,512)@(8,512,128)", run_c, ca, cb)
if out is not None:
    assert np.allclose(np.asarray(out),
                       np.einsum("bij,bjk->bik", np.asarray(ca),
                                 np.asarray(cb)), rtol=1e-5)
    print("  C correct", flush=True)


# D. the real question at block scale: 64 sequential per-tile dots in
# one kernel invocation (grid step = one 32768-position block)
def kern_d(slot_ref, val_ref, o_ref):
    # slot_ref (256,128) int32 in-tile ordinals (lane-major flat);
    # val_ref (256,128) f32 values; per tile t (rows 4t..4t+4):
    # out rows... build oh via transpose of the (4,128) tile to (128,4)
    # then reshape to (1,512)? -> probe the simplest correct thing:
    # transpose whole block (256,128)->(128,256), then per-tile lanes
    # are contiguous sublanes.
    st = jax.lax.transpose(slot_ref[...], (1, 0))      # (128, 256)
    vt = jax.lax.transpose(val_ref[...], (1, 0))
    # tile t = columns 4t..4t+3 of st/vt -> as (128*4) flat per tile is
    # STILL not lane-major.  Fallback: single big transpose probe only.
    o_ref[...] = st[:, :128] + vt[:, :128]


@jax.jit
def run_d(s, v):
    return pl.pallas_call(
        kern_d,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )(s, v)


sd = jnp.asarray(np.random.rand(256, 128).astype(np.float32))
vd = jnp.asarray(np.random.rand(256, 128).astype(np.float32))
probe("D block transpose (256,128)->(128,256) slice", run_d, sd, vd)

print("spike done", flush=True)


# --- round 2: the layout pivots the full pack assembly needs ---

def kern_e(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(1, 512)


@jax.jit
def run_e(x):
    return pl.pallas_call(
        kern_e, out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32))(x)


xe = jnp.asarray(np.random.rand(4, 128).astype(np.float32))
out = probe("E reshape (4,128)->(1,512)", run_e, xe)
if out is not None:
    ok = np.allclose(np.asarray(out).ravel(), np.asarray(xe).ravel())
    print(f"  E row-major match: {ok}", flush=True)


def kern_f(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(512, 1)


@jax.jit
def run_f(x):
    return pl.pallas_call(
        kern_f, out_shape=jax.ShapeDtypeStruct((512, 1), jnp.float32))(x)


out = probe("F reshape (4,128)->(512,1)", run_f, xe)
if out is not None:
    ok = np.allclose(np.asarray(out).ravel(), np.asarray(xe).ravel())
    print(f"  F row-major match: {ok}", flush=True)


def kern_g(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),   # A @ B^T
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@jax.jit
def run_g(a, b):
    return pl.pallas_call(
        kern_g, out_shape=jax.ShapeDtypeStruct((32, 16), jnp.float32))(a, b)


ga = jnp.asarray(np.random.rand(32, 128).astype(np.float32))
gb = jnp.asarray(np.random.rand(16, 128).astype(np.float32))
out = probe("G dot A@B^T (32,128)x(16,128)", run_g, ga, gb)
if out is not None:
    ok = np.allclose(np.asarray(out),
                     np.asarray(ga) @ np.asarray(gb).T, rtol=1e-5)
    print(f"  G correct: {ok}", flush=True)


def kern_h(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),   # A^T @ B
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@jax.jit
def run_h(a, b):
    return pl.pallas_call(
        kern_h, out_shape=jax.ShapeDtypeStruct((64, 16), jnp.float32))(a, b)


ha = jnp.asarray(np.random.rand(512, 64).astype(np.float32))
hb = jnp.asarray(np.random.rand(512, 16).astype(np.float32))
out = probe("H dot A^T@B (512,64)^T x (512,16)", run_h, ha, hb)
if out is not None:
    ok = np.allclose(np.asarray(out),
                     np.asarray(ha).T @ np.asarray(hb), rtol=1e-4)
    print(f"  H correct: {ok}", flush=True)
