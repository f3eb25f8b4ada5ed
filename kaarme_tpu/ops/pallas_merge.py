"""Pallas TPU kernel: linear merge of two sorted runs + fused compact.

The superstep's dominant cost is `lax.sort(prefix + batch)` — the
prefix is re-sorted every superstep even though it is ALREADY sorted
(O((P+n) log(P+n)) per superstep).  This kernel replaces that with the
linear formulation the round-1 review asked for (VERDICT item 3):

    sort the n new window keys only           (XLA, O(n log n))
    merge the two sorted runs in ONE pass     (this kernel, O(P+n))
    ... fused with the segment-sum compaction (no intermediate array)

so the prefix costs a streaming pass instead of a sort.  The reference
has no counterpart (its table IS the merged state — one CAS per window,
source/kmer_hash_table.cpp:2207-2567); this is the sorted-store
equivalent of that "touch the state once" property.

Design (classic merge-path, self-pacing variant):

  grid = (Na + Nb) / R sequential blocks, R = block_rows * 128.
  SMEM cursors ca/cb track elements consumed from A (the dense sorted
  prefix, ascending) and B (the sorted batch, DESCENDING — the caller
  sorts bitwise-NOT-ed keys ascending, so no in-kernel reversal is
  ever needed).  Per block:

    - DMA A[ca : ca + R] and the next R ascending elements of B
      (= B_desc[Nb' - cb - R : Nb' - cb], already in descending order)
      into VMEM — ONE DMA per side: the caller interleaves columns
      into a (rows, pow2(planes), 128) layout so each side is one
      contiguous slab (per-DMA fixed cost ~24 us/stream/block
      dominates this kernel's budget — see DESIGN.md section 0);
    - concat(A_tile asc, B_tile desc) is BITONIC: a log2(2R)-stage
      bitonic merge network over lane/sublane rolls sorts the window
      by (key words [, count], source tag); the tag plane makes
      every element distinct, so consumption counts are exact and
      B's sentinels are provably never consumed before A's;
    - the first R sorted rows are this block's output (they are the
      R smallest remaining elements globally — merge-path invariant);
      cntB = sum(tag) advances the cursors;
    - the output rows run through the same fused segment-sum +
      dense compaction machinery as ops/pallas_compact.py (lagged
      decisions, cross-block carries, residual-row dense packing) and
      ONE interleaved DMA appends the distinct records at the output
      cursor.

Cursor reads are clamped (ca_r = min(ca, Na)): once a side is
exhausted its tile re-reads trailing sentinel rows, which merge last
and compact away — no out-of-bounds reads, no phantom real records.

Count layouts match the compact kernel: embedded (count in the low
``ebits`` of the last key word; B rows carry |1) or separate trailing
count plane (B's unit counts are synthesized in-kernel, not shipped).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_compact import (
    SENT,
    _LANES,
    _flat_pos,
    _flat_roll_back,
    _pow2,
    dense_stage,
    segsum_rows,
)

# 256-row blocks halve the per-block fixed DMA cost vs 128; the VMEM
# footprint (two (S+1)-row input tiles + the (2S, 128) bitonic working
# set + the staging buffer, ~9 MB at W=4) matches what the compact
# kernel already runs compiled on-chip.  Dial down if Mosaic reports
# scoped-VMEM pressure at large W.
_BLOCK_ROWS = 256


def block_elems(block_rows: int = _BLOCK_ROWS) -> int:
    return block_rows * _LANES


def _flat_roll_fwd(v, d: int, S: int, fill):
    """y.flat[i] = v.flat[i - d] for static d > 0; head filled."""
    ml, ms = d % _LANES, d // _LANES
    y = v
    if ml:
        xl = pltpu.roll(y, ml, 1)               # y[s,l] = v[s,(l-ml)%128]
        xp = pltpu.roll(xl, 1, 0)               # previous row's wrapped part
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
        y = jnp.where(lane < ml, xp, xl)
    if ms:
        y = pltpu.roll(y, ms, 0)
    fpos, _ = _flat_pos(S)
    return jnp.where(fpos < d, fill, y)


def _shift_back_dyn(v, j, S1: int):
    """y.flat[i] = v.flat[i + j] over an (S1, 128) tile, j a traced
    scalar in [0, 128).  The last j elements wrap (callers only use the
    first (S1-1)*128 outputs)."""
    ji = j.astype(jnp.int32)
    sh = (jnp.int32(_LANES) - ji) % jnp.int32(_LANES)
    xl = pltpu.roll(v, sh, 1)                   # xl[s,l] = v[s,(l+j)%128]
    xn = pltpu.roll(xl, S1 - 1, 0)              # next row's values
    lane = jax.lax.broadcasted_iota(jnp.int32, (S1, _LANES), 1)
    return jnp.where(lane >= jnp.int32(_LANES) - ji, xn, xl)


def _lex_cmp_sign(a, b):
    """int32 sign per element: +1 where tuple a > b, -1 where a < b,
    0 where equal (planes compared most-significant-first)."""
    c = jnp.zeros(a[0].shape, jnp.int32)
    for x, y in zip(reversed(a), reversed(b)):
        c = jnp.where(x < y, jnp.int32(-1), jnp.where(x > y, jnp.int32(1), c))
    return c


def _bitonic_merge(planes, S2: int):
    """Sort a bitonic (ascending ++ descending) sequence of 2R = S2*128
    elements, laid out (S2, 128) flat, by the lexicographic tuple of
    ``planes`` (all planes permuted together).  log2(2R) stages of
    compare-exchange at power-of-two distances via static rolls."""
    n2 = S2 * _LANES
    fpos, _ = _flat_pos(S2)
    d = n2 // 2
    while d >= 1:
        ahead = [_flat_roll_back(p, d, S2, jnp.uint32(0)) for p in planes]
        gt_ahead = _lex_cmp_sign(planes, ahead)          # x[i] vs x[i+d]
        gt_behind = _flat_roll_fwd(gt_ahead, d, S2, jnp.int32(0))
        low = jnp.where((fpos & d) == 0, jnp.int32(1), jnp.int32(0))
        swap = jnp.where(low == 1, jnp.where(gt_ahead > 0, 1, 0),
                         jnp.where(gt_behind > 0, 1, 0))
        new_planes = []
        for p, ah in zip(planes, ahead):
            bh = _flat_roll_fwd(p, d, S2, jnp.uint32(0))
            partner = jnp.where(low == 1, ah, bh)
            new_planes.append(jnp.where(swap == 1, partner, p))
        planes = new_planes
        d //= 2
    return planes


def _merge_kernel(W: int, S: int, embedded: bool, ebits: int,
                  rows_a: int, rows_b: int):
    """Kernel body.  Refs:
      ins:  a (rows_a, PA, 128) ANY, b (rows_b, PB, 128) ANY
      outs: o (out_rows, PO, 128) ANY, nd SMEM (2,)
      scratch: carry SMEM (W+7,), a_tile VMEM (S+1, PA, 128),
               b_tile VMEM (S+1, PB, 128), vout VMEM (S+1, PO, 128),
               residual VMEM (1, (W+1)*128), sem DMA (3,)
      (P* = pow2 plane counts — DMA slab constraint, see _pow2)
    carry: [0..W) prev key, [W] prev cnt, [W+1] prev sent,
      [W+2] prev segstart, [W+3] out row cursor, [W+4] residual count,
      [W+5] ca, [W+6] cb.
    """
    n = S * _LANES
    WA = W + (0 if embedded else 1)
    cmask = np.uint32((1 << ebits) - 1) if embedded else np.uint32(0)
    max_start_a = rows_a - (S + 1)
    na_el = max_start_a * _LANES        # clamp ceiling for ca reads
    # B layout: (S+1) leading margin rows + real rows + 1 trailing
    # headroom row (read but unused when the window is row-aligned)
    nb_content_el = (rows_b - 1) * _LANES
    nb_el = nb_content_el - (S + 1) * _LANES   # real B elements
    PA, PB, PO = _pow2(WA), _pow2(W), _pow2(W + 1)

    def kernel(a_ref, b_ref, out_ref, nd_ref, carry, a_tile, b_tile,
               vout, residual, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for w in range(W):
                carry[w] = SENT
            carry[W] = jnp.uint32(0)
            carry[W + 1] = jnp.uint32(1)
            carry[W + 2] = jnp.uint32(0)
            carry[W + 3] = jnp.uint32(0)
            carry[W + 4] = jnp.uint32(0)
            carry[W + 5] = jnp.uint32(0)   # ca
            carry[W + 6] = jnp.uint32(0)   # cb
            nd_ref[0] = jnp.int32(0)
            nd_ref[1] = jnp.int32(0)
            residual[...] = jnp.concatenate(
                [jnp.full((1, W * _LANES), SENT, jnp.uint32),
                 jnp.zeros((1, _LANES), jnp.uint32)], axis=1)

        ca = jnp.minimum(carry[W + 5], jnp.uint32(na_el)).astype(jnp.int32)
        cb = jnp.minimum(carry[W + 6], jnp.uint32(nb_el)).astype(jnp.int32)

        start_a = ca // _LANES
        ja = ca - start_a * _LANES
        # next R ascending B elements end at descending index Nb' - cb
        end_b = nb_content_el - cb
        start_el_b = end_b - n
        start_b = start_el_b // _LANES
        jb = start_el_b - start_b * _LANES

        in_a = pltpu.make_async_copy(
            a_ref.at[pl.ds(start_a, S + 1)], a_tile, sem.at[0])
        in_b = pltpu.make_async_copy(
            b_ref.at[pl.ds(start_b, S + 1)], b_tile, sem.at[1])
        in_a.start()
        in_b.start()
        in_a.wait()
        in_b.wait()

        # align tiles to the element cursors; keep the first S rows.
        # tiles are (S+1, P, 128) with P = pow2(plane count): DMA slabs
        # need power-of-two plane counts (see _pow2 in pallas_compact);
        # dummy planes beyond the real count are never read
        def tile_planes(tile, nplanes, j):
            out = []
            for w in range(nplanes):
                p = _shift_back_dyn(tile[:, w, :], j, S + 1)
                out.append(jax.lax.slice(p, (0, 0), (S, _LANES)))
            return out

        a_planes = tile_planes(a_tile, WA, ja)
        b_planes = tile_planes(b_tile, W, jb)
        if not embedded:
            # B rows are implicit unit counts — synthesize the plane
            b_planes = b_planes + [jnp.ones((S, _LANES), jnp.uint32)]

        # concat(A asc, B desc) + tag plane -> bitonic merge
        planes = [jnp.concatenate([a, b], axis=0)
                  for a, b in zip(a_planes, b_planes)]
        tag = jnp.concatenate([jnp.zeros((S, _LANES), jnp.uint32),
                               jnp.ones((S, _LANES), jnp.uint32)], axis=0)
        merged = _bitonic_merge(planes + [tag], 2 * S)
        out_planes = [jax.lax.slice(p, (0, 0), (S, _LANES))
                      for p in merged[:-1]]
        tag_out = jax.lax.slice(merged[-1], (0, 0), (S, _LANES))

        cnt_b = jnp.sum(tag_out.astype(jnp.int32))
        carry[W + 5] = carry[W + 5] + (jnp.int32(n) - cnt_b).astype(jnp.uint32)
        carry[W + 6] = carry[W + 6] + cnt_b.astype(jnp.uint32)

        # ---- fused segment-sum + dense compaction (shared core in
        # ops/pallas_compact.py) ----
        key = out_planes[:W]
        if embedded:
            cnt = key[W - 1] & cmask
            key = key[:W - 1] + [key[W - 1] - cnt]   # subtractive strip
        else:
            cnt = out_planes[W]

        cur, av, acount, carry_vals = segsum_rows(key, cnt, i, S, W,
                                                  carry, cmask)
        cursor = carry[W + 3].astype(jnp.int32)
        staged_all, res_all, full_rows, new_r = dense_stage(
            cur, av, acount, carry[W + 4], residual, S, W)
        # pad the plane dim to PO with dummy sentinel planes (see _pow2);
        # single whole-buffer writes (strided per-plane VMEM stores are
        # the riskier Mosaic lowering)
        for _ in range(PO - (W + 1)):
            staged_all.append(jnp.full_like(staged_all[0], SENT))
        vout[...] = jnp.stack(staged_all, axis=1)
        residual[...] = jnp.concatenate(res_all, axis=1)

        out_dma = pltpu.make_async_copy(
            vout, out_ref.at[pl.ds(cursor, S + 1)], sem.at[2])
        out_dma.start()
        out_dma.wait()

        for w, v in enumerate(carry_vals):
            carry[w] = v
        carry[W + 3] = (cursor + full_rows).astype(jnp.uint32)
        carry[W + 4] = new_r.astype(jnp.uint32)
        nd_ref[0] = nd_ref[0] + acount
        # count the partial residual row only when non-empty (see
        # pallas_compact: an inflated nd_used at exact-fit capacity
        # would trigger spurious grow-and-replay)
        nd_ref[1] = (cursor + full_rows + jnp.minimum(new_r, 1)) * _LANES

    return kernel


def _interleave(cols, margin_rows: int, fills):
    """Stack flat columns into the (rows + margin, P, 128) slab layout,
    P = pow2(len(cols)) (DMA slabs need power-of-two plane counts — see
    _pow2 in pallas_compact); margin rows are filled per-column and
    dummy planes are sentinel."""
    rows = cols[0].shape[0] // _LANES
    planes = []
    for c, fill in zip(cols, fills):
        pad = jnp.full((margin_rows * _LANES,), fill, jnp.uint32)
        planes.append(jnp.concatenate(
            [jax.lax.bitcast_convert_type(c, jnp.uint32), pad]
        ).reshape(rows + margin_rows, 1, _LANES))
    for _ in range(_pow2(len(cols)) - len(cols)):
        planes.append(jnp.full_like(planes[0], SENT))
    return jnp.concatenate(planes, axis=1)


@partial(jax.jit, static_argnames=("embedded", "ebits", "block_rows",
                                   "interpret"))
def merge_compact_dense(a_cols, b_desc_cols, *, embedded: bool, ebits: int,
                        block_rows: int = _BLOCK_ROWS,
                        interpret: bool = False):
    """Merge a DENSE ascending-sorted run ``a_cols`` (trailing sentinel
    rows allowed) with a DESCENDING-sorted run ``b_desc_cols``
    (sentinel rows leading), summing counts of equal keys and packing
    distinct records densely.

    a_cols: W uint32 key columns (embedded counts) or W+1 (separate
      trailing count column); length Na, a multiple of 128.
    b_desc_cols: W uint32 key columns, descending (embedded runs carry
      |1 unit counts in the low bits; separate-count runs are implicit
      unit counts).  Length Nb, a multiple of 128.

    Returns (W key cols + count col, each (Na + Nb + (block_rows+1)*128,),
    nd_exact, nd_used) with the dense-compact contract
    (nd_used == ceil(nd_exact/128)*128; sentinel fill in between;
    garbage beyond — callers mask).
    """
    W = len(b_desc_cols)
    if len(a_cols) != W + (0 if embedded else 1):
        raise ValueError("column count mismatch")
    Na, Nb = a_cols[0].shape[0], b_desc_cols[0].shape[0]
    S = block_rows
    R = S * _LANES
    if Na % _LANES or Nb % _LANES:
        raise ValueError("runs must be padded to 128-element rows")
    ntot = Na + Nb
    npad = (-ntot) % R
    if npad == 0:
        # the lagged compact decision needs at least one trailing
        # sentinel OUTPUT after the last real element: when both runs
        # are completely full (nd == cap prefix + all-valid batch) and
        # their total is an exact block multiple, no input sentinel
        # would ever be consumed — append one all-sentinel block
        npad = R
    nblocks = (ntot + npad) // R

    key_fill, cnt_fill = np.uint32(SENT), np.uint32(0)
    # margin: S+1 rows of overread + npad extra sentinels folded into A
    margin_a = (S + 1) + npad // _LANES
    fills_a = [key_fill] * W + ([] if embedded else [cnt_fill])
    a = _interleave(list(a_cols), margin_a, fills_a)
    # B descending: margin sentinels PREPEND (largest keys lead) + one
    # trailing headroom row (read but never used when row-aligned)
    bm = jnp.full(((S + 1) * _LANES,), SENT, jnp.uint32)
    bt = jnp.zeros((_LANES,), jnp.uint32)
    b_planes = [
        jnp.concatenate([bm, jax.lax.bitcast_convert_type(c, jnp.uint32), bt])
        .reshape(-1, 1, _LANES)
        for c in b_desc_cols
    ]
    for _ in range(_pow2(W) - W):
        b_planes.append(jnp.full_like(b_planes[0], SENT))
    b = jnp.concatenate(b_planes, axis=1)

    rows_a, rows_b = a.shape[0], b.shape[0]
    out_rows = (ntot + npad) // _LANES + S + 1
    kern = _merge_kernel(W, S, embedded, ebits, rows_a, rows_b)
    WA = W + (0 if embedded else 1)
    PA, PB, PO = _pow2(WA), _pow2(W), _pow2(W + 1)
    out, nd = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, PO, _LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.SMEM((W + 7,), jnp.uint32),
            pltpu.VMEM((S + 1, PA, _LANES), jnp.uint32),
            pltpu.VMEM((S + 1, PB, _LANES), jnp.uint32),
            pltpu.VMEM((S + 1, PO, _LANES), jnp.uint32),
            pltpu.VMEM((1, (W + 1) * _LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(a, b)
    okeys = [out[:, w, :].reshape(-1) for w in range(W)]
    ocnt = out[:, W, :].reshape(-1)
    return tuple(okeys), ocnt, nd[0], nd[1]
