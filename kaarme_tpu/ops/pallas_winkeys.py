"""Pallas TPU kernel: fused canonical window-key extraction.

Replaces the XLA `window_keys_from_codes` stage of the superstep
(ops/sortcount.py) — measured 182 ms at 32M windows on the target chip,
where the kernel's arithmetic is ~20 VPU passes per (256,128) block and
should be IO-bound instead.

The reference's counterpart is the rolling k-mer factory
(reference: source/kmer_factory.cpp:104-239): a sequential shift
register holding the forward window and its reverse complement.  Here
every window is materialized at once: for each block of S*128
consecutive window positions, the k shifted code planes are built with
lane/sublane rolls over the block's codes (plus its k-1 halo), and the
2-bit chars are OR-accumulated into big-endian packed forward and
reverse-complement words; the canonical orientation is an elementwise
lexicographic select (reference semantics: min(fwd, rc), ties -> fwd —
source/kmer_factory.cpp:219-233).

Robustness-first design (everything here runs through the narrow part
of the Mosaic toolchain that is known-good on this machine):
  - inputs/outputs via BlockSpec-managed pipelining only — NO manual
    DMA, NO semaphores, NO SMEM carries;
  - the k-1 halo is obtained by passing the SAME codes array through a
    second BlockSpec whose index_map points at block i+1 (the array is
    padded by one extra block of separator codes);
  - all shifts are pltpu.roll along lanes/sublanes (measured ~free).

Layout contract: codes is the flat uint32 array the XLA unpack
produces (2-bit code in bits 0-1, invalid flag in bit 2), reshaped
(rows, 128) row-major, so flat order == window order.  Output key
columns are bit-identical to `window_keys_from_codes` (invalid windows
are all-ones sentinel rows).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.codec import words_per_kmer

_LANES = 128
_BLOCK_ROWS = 256


def _shift_flat(c2, d: int, S: int):
    """(S,128) view of c2.flat[d : d + S*128] for static d >= 1.

    c2 is (2S, 128); valid for d <= S*128 (we only use d <= k-1).
    Gather-from-ahead: lane roll pulls within the row, wrapped lanes
    take the next row's values, then whole rows move up.
    """
    ml, ms = d % _LANES, d // _LANES
    y = c2
    S2 = c2.shape[0]
    if ml:
        xl = pltpu.roll(y, _LANES - ml, 1)      # [s,l] = y[s, (l+ml)%128]
        xn = pltpu.roll(xl, S2 - 1, 0)          # next row's wrapped lanes
        lane = jax.lax.broadcasted_iota(jnp.int32, (S2, _LANES), 1)
        y = jnp.where(lane >= _LANES - ml, xn, xl)
    if ms:
        y = pltpu.roll(y, S2 - ms, 0)
    return y[:S]


def _winkeys_kernel(k: int, S: int):
    W = words_per_kmer(k)

    def kernel(main_ref, next_ref, *out_refs):
        c2 = jnp.concatenate([main_ref[...], next_ref[...]], axis=0)
        zero = jnp.zeros((S, _LANES), jnp.uint32)
        fwd = [zero for _ in range(W)]
        rc = [zero for _ in range(W)]
        vm = zero
        for i in range(k):
            p = main_ref[...] if i == 0 else _shift_flat(c2, i, S)
            code = p & jnp.uint32(3)
            vm = vm | (p >> jnp.uint32(2))      # any invalid in window
            w, j = i // 16, i % 16
            fwd[w] = fwd[w] | (code << jnp.uint32(2 * (15 - j)))
            t = k - 1 - i
            w2, j2 = t // 16, t % 16
            rc[w2] = rc[w2] | ((code ^ jnp.uint32(3))
                               << jnp.uint32(2 * (15 - j2)))
        # lexicographic min(fwd, rc), ties -> fwd (int32 carry, scanning
        # words last-to-first: the first differing word decides)
        c = jnp.zeros((S, _LANES), jnp.int32)
        for f, r in zip(reversed(fwd), reversed(rc)):
            c = jnp.where(f < r, jnp.int32(-1),
                          jnp.where(f > r, jnp.int32(1), c))
        # all-ones where any window position was invalid
        smask = jnp.where(vm != jnp.uint32(0),
                          jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        for w in range(W):
            key = jnp.where(c <= 0, fwd[w], rc[w])
            out_refs[w][...] = key | smask

    return kernel


@partial(jax.jit, static_argnames=("k", "n", "block_rows", "interpret"))
def window_keys_pallas(codes, *, k: int, n: int,
                       block_rows: int = _BLOCK_ROWS,
                       interpret: bool = False):
    """codes (uint32 [>= n + k - 1], bit2 = invalid) -> W key columns
    (uint32 [n] each), bit-identical to window_keys_from_codes.

    n must be a multiple of block_rows*128.  The codes array is padded
    on-device to (NB+1) blocks with separator codes so the halo
    BlockSpec of the last block reads defined data.
    """
    W = words_per_kmer(k)
    blk = block_rows * _LANES
    if n % blk:
        raise ValueError(f"n={n} not a multiple of {blk}")
    if k - 1 > blk:
        # the halo BlockSpec provides exactly ONE lookahead block; a
        # larger k would silently wrap the in-block rolls and corrupt
        # keys (callers fall back to the XLA formulation)
        raise ValueError(f"k={k} needs a halo of {k-1} > one block ({blk})")
    nb = n // blk
    need = (nb + 1) * blk
    pad = need - codes.shape[0]
    if pad < 0:
        codes = codes[:need]
    else:
        codes = jnp.concatenate(
            [codes, jnp.full((pad,), jnp.uint32(4))])
    c2d = codes.reshape(-1, _LANES)

    outs = pl.pallas_call(
        _winkeys_kernel(k, block_rows),
        out_shape=[jax.ShapeDtypeStruct((nb * block_rows, _LANES), jnp.uint32)
                   for _ in range(W)],
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, _LANES), lambda i: (i + 1, 0)),
        ],
        out_specs=[pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0))
                   for _ in range(W)],
        interpret=interpret,
    )(c2d, c2d)
    return tuple(o.reshape(-1) for o in outs)
