"""Pallas TPU kernel: packed 2-bit stream -> canonical window keys.

Fuses what the XLA path (ops/sortcount.window_keys) does in several
HBM passes — unpack, 2k shifted-slice packs, validity, sentinel — into
ONE pass that reads the packed words (0.25 B/base) and writes only the W
key planes.  The trick is to work at WORD level: a uint32 of the little-
endian packed stream holds 16 codes, so each output key word is built
from a per-lane funnel shift of two adjacent stream words instead of 16
per-code shift-ors:

  le(t)     = (word[t/16] >> 2*(t%16)) | (word[t/16+1] << (32-2*(t%16)))
  fwd_be(w) = bitrev2(le(t + 16w))          (2-bit-group reversal)
  rc_be(w)  = ~le(t + k - 16(w+1))          (no reversal needed: group
              j of the little-endian word at that offset is exactly
              big-endian group j of the complemented reverse window)

Per 128-lane row, the words each lane needs (index floor((l+c)/16))
are produced by repeating an 8-word row slice 16x across lanes — no
gathers.  Window validity comes from the invalid bitmap with the same
funnel construction at bit granularity.

Semantics are bit-identical to ops/sortcount.window_keys (canonical =
lexicographic min of forward/reverse-complement, ties forward,
reference: source/kmer_factory.cpp:219-233; invalid windows become
all-ones sentinel rows).

STATUS: verified bit-exact against the XLA path in Pallas interpreter
mode (tests/test_pallas_windows.py) and used as the reference design
for the fused kernel.  The TPU Mosaic compile is currently blocked by a
toolchain restriction: DMA/memref slices must be 128-lane aligned in
the minor dimension, which rejects the (rows, 8)-word staging layout
(alternatives — whole-array VMEM residency, ANY/HBM memory spaces —
either overflow scoped VMEM or hit the same alignment check).  The XLA
formulation in ops/sortcount.window_keys remains the production path;
revisit when Mosaic grows sub-lane DMA slicing or a strided-slice op.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.codec import words_per_kmer

BR = 256            # window rows (of 128 lanes) per grid step
_GUARD_ROWS = 1     # leading all-zero packed row (8 words) for rc reads


def _on_cpu() -> bool:
    """True when computation runs on CPU (tests pin the default device
    there even though the axon TPU plugin stays registered) — the kernel
    must then use the Pallas interpreter."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform == "cpu"
    return jax.default_backend() == "cpu"


def _bitrev2(v):
    """Reverse the 16 2-bit groups of a uint32 (little<->big endian)."""
    m2 = jnp.uint32(0x33333333)
    m4 = jnp.uint32(0x0F0F0F0F)
    m8 = jnp.uint32(0x00FF00FF)
    v = ((v & m2) << jnp.uint32(2)) | ((v >> jnp.uint32(2)) & m2)
    v = ((v & m4) << jnp.uint32(4)) | ((v >> jnp.uint32(4)) & m4)
    v = ((v & m8) << jnp.uint32(8)) | ((v >> jnp.uint32(8)) & m8)
    return (v << jnp.uint32(16)) | (v >> jnp.uint32(16))


def _funnel(a, b, sh):
    """(a >> sh) | (b << (32-sh)) with sh==0 handled (per-lane uint32)."""
    lo = a >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), b << (jnp.uint32(32) - sh))
    return lo | hi


def _kernel(packed_hbm, mask_hbm, *out_refs_and_scratch, k: int, mwin: int):
    W = words_per_kmer(k)
    out_refs = out_refs_and_scratch[:W]
    blk_ref, mblk_ref, sem = out_refs_and_scratch[W:]
    g = pl.program_id(0)

    # inputs live in HBM (whole-array VMEM residency would block output
    # streaming and overflow VMEM); DMA this step's slice into scratch
    cp1 = pltpu.make_async_copy(
        packed_hbm.at[pl.ds(g * BR, BR + 2), :], blk_ref, sem.at[0])
    cp2 = pltpu.make_async_copy(
        mask_hbm.at[pl.ds(g * BR, BR + 2), :], mblk_ref, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    blk = blk_ref[:, :]                             # (BR+2, 8) words
    mblk = mblk_ref[:, :]                           # (BR+2, 4) mask words

    lane = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 1)
    lane16 = lane % 16
    lane32 = lane % 32

    def rep16(off: int):
        """(BR, 128) where lane l carries the stream word at flat block
        index 8*GUARD + r*8 + off + l//16.  Built as a broadcast + select
        chain over clean single-column slices (Mosaic rejects misaligned
        concats; element-repeat reshapes do not lower at all)."""
        flat0 = 8 * _GUARD_ROWS + off
        out = None
        for j in range(8):
            r0, c0 = divmod(flat0 + j, 8)
            col = jnp.broadcast_to(blk[r0 : r0 + BR, c0 : c0 + 1], (BR, 128))
            out = col if out is None else jnp.where(lane >= 16 * j, col, out)
        return out

    def rep32(off: int):
        """(BR, 128) where lane l carries mask word r*4 + off + l//32."""
        out = None
        for j in range(4):
            r0, c0 = divmod(off + j, 4)
            col = jnp.broadcast_to(mblk[r0 : r0 + BR, c0 : c0 + 1], (BR, 128))
            out = col if out is None else jnp.where(lane >= 32 * j, col, out)
        return out

    # -- forward words (big-endian) ---------------------------------------
    off2 = (jnp.uint32(2) * lane16.astype(jnp.uint32))
    fwd = []
    for w in range(W):
        a = rep16(w)
        b = rep16(w + 1)
        be = _bitrev2(_funnel(a, b, off2))
        if w == W - 1 and k % 16:
            be = be & jnp.uint32((0xFFFFFFFF << (32 - 2 * (k % 16))) & 0xFFFFFFFF)
        fwd.append(be)

    # -- reverse-complement words -----------------------------------------
    rcw = []
    for w in range(W):
        cc = k - 16 * (w + 1)
        q, r = divmod(cc, 16)          # floor division: q may be negative
        p0 = rep16(q)
        p1 = rep16(q + 1)
        p2 = rep16(q + 2)
        hi = lane16 + r >= 16
        a = jnp.where(hi, p1, p0)
        b = jnp.where(hi, p2, p1)
        sh = (jnp.uint32(2) * ((lane16 + r) % 16).astype(jnp.uint32))
        v = ~_funnel(a, b, sh)
        if w == W - 1 and k % 16:
            v = v & jnp.uint32((0xFFFFFFFF << (32 - 2 * (k % 16))) & 0xFFFFFFFF)
        rcw.append(v)

    # -- canonical select (lexicographic min, ties forward) ----------------
    c = jnp.zeros((BR, 128), jnp.int32)
    for f, rv in zip(reversed(fwd), reversed(rcw)):
        c = jnp.where(f < rv, jnp.int32(-1), jnp.where(f > rv, jnp.int32(1), c))
    use_fwd = c <= 0

    # -- validity: any invalid bit in [t, t+k) -----------------------------
    s = lane32.astype(jnp.uint32)
    mwords = [rep32(j) for j in range(mwin + 1)]
    bad = jnp.uint32(0)
    for j in range(mwin):
        v = _funnel(mwords[j], mwords[j + 1], s)
        bits_left = k - 32 * j
        if bits_left < 32:
            v = v & jnp.uint32((1 << bits_left) - 1)
        bad = bad | v
    smask = jnp.where(bad != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))

    for w in range(W):
        out_refs[w][:, :] = jnp.where(use_fwd, fwd[w], rcw[w]) | smask


@partial(jax.jit, static_argnames=("k", "n"))
def window_keys_pallas(packed, maskwords, *, k: int, n: int):
    """Canonical window keys via the fused Pallas kernel.

    Args/semantics identical to ops/sortcount.window_keys: packed uint32
    [>= ceil((n+k-1)/16)], maskwords uint32 [>= ceil((n+k-1)/32)], n a
    multiple of BR*128.  Returns a tuple of W uint32 [n] arrays with
    all-ones sentinels for invalid windows.
    """
    if n % (BR * 128):
        raise ValueError(f"n must be a multiple of {BR * 128}")
    W = words_per_kmer(k)
    mwin = (k + 31) // 32          # mask words overlapped by one window
    rows = n // 128
    grid = rows // BR

    # layout packed words as (rows', 8) with a leading guard row and
    # trailing slack for the last window's forward reads
    need_w = rows * 8 + 8 * _GUARD_ROWS + 16 + 8 * W
    pw = jnp.zeros((need_w,), jnp.uint32)
    pw = jax.lax.dynamic_update_slice(pw, packed, (8 * _GUARD_ROWS,))
    packed2d = pw.reshape(-1, 8)

    need_m = rows * 4 + 8 + 4 * mwin
    mw = jnp.zeros((need_m,), jnp.uint32)
    mw = jax.lax.dynamic_update_slice(mw, maskwords, (0,))
    mask2d = mw.reshape(-1, 4)

    out_shape = tuple(
        jax.ShapeDtypeStruct((rows, 128), jnp.uint32) for _ in range(W)
    )
    out_specs = tuple(
        pl.BlockSpec((BR, 128), lambda g: (g, 0), memory_space=pltpu.VMEM)
        for _ in range(W)
    )
    outs = pl.pallas_call(
        partial(_kernel, k=k, mwin=mwin),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BR + 2, 8), jnp.uint32),
            pltpu.VMEM((BR + 2, 4), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_on_cpu(),
    )(packed2d, mask2d)
    return tuple(o.reshape(-1) for o in outs)
