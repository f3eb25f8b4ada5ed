"""Pallas TPU kernel: fused segment-sum + stream compaction.

Replaces the post-sort half of the superstep merge (`_compact_embedded` /
`compact` in ops/sortcount.py).  The XLA formulation needs a second full
W+1-column sort (a stable partition) plus several cumulative passes —
measured 601 ms for 36M rows on the target chip, ~60% of the whole
superstep.  This kernel does the same work in ONE pass over the sorted
columns (~50 ms):

  per block of R = S*128 rows (sequential grid):
    - segment boundaries against the previous row (cross-block carry of
      the last row's key in SMEM — the reference's analogous state is
      the rolling factory's previous-window state,
      reference: source/kmer_factory.cpp:104-239);
    - per-segment totals WITHOUT a segmented scan: merge inputs
      guarantee at most one non-unit-count row per key segment, and the
      count is the least-significant sort key, so the segment's last
      row carries that count: total = c_last + (len - 1)
      (len via a flat cummax of boundary positions, carried across
      blocks);
    - the totals are clamped with the contract-preserving modular clamp
      (counts stay < 2^21 — see sortcount._clamp_count);
    - alive rows (= segment-last, non-sentinel) are packed to the block
      front by a monotone log-shift compaction in VMEM (no gather /
      scatter hardware needed — TPU has none worth using);
    - the packed run (padded to whole 128-lane rows with sentinels) is
      DMA'd to a global cursor carried in SMEM; later blocks overwrite
      earlier blocks' padding, so the output is dense up to the final
      cursor.

Output rows are therefore "sorted distinct records with interspersed
all-ones sentinel pad rows" — every consumer treats sentinel rows as
dead (they sort last in the next merge; host dumps filter count == 0).

The same kernel serves both count layouts:
  - embedded (ebits >= 21): count lives in the low `ebits` of the last
    key word (sort arity W);
  - separate (ebits == 0): count is its own trailing uint32 column,
    sorted as the LEAST-SIGNIFICANT key (arity W+1) — that ordering is
    exactly what makes the c_last trick valid for any k.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.mathutils import next_pow2
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = np.uint32(0xFFFFFFFF)
_LANES = 128
_BLOCK_ROWS = 256


def _pow2(x: int) -> int:
    """utils.mathutils.next_pow2, re-exported with the DMA-constraint
    rationale: interleaved (rows, planes, 128) DMA
    slabs MUST have a power-of-two plane count: measured on the target
    toolchain, a VMEM<->ANY async copy of a 3D buffer with plane count
    in {3, 5, 6} hard-faults the TPU runtime ({1, 2, 4, 8} work), and
    the 2D lane-major alternative is rejected at compile time because
    dynamic row offsets can't be proven 8-aligned.  Dummy planes carry
    sentinel fill and are ignored by the de-interleave."""
    return next_pow2(x)


def block_elems(block_rows: int = _BLOCK_ROWS) -> int:
    """Rows consumed per grid step — callers pad N to a multiple."""
    return block_rows * _LANES


def block_rows_for(ncols: int) -> int:
    """Block size scaled to the column count: at P = pow2(ncols) > 8
    interleave planes (k > ~120), 256-row blocks overflow the 16 MB
    scoped-VMEM budget (measured: k=201 classic superstep OOMed at
    16.69M).  Halve the block so the double-buffered inputs + the
    interleave stay comfortably inside."""
    return _BLOCK_ROWS if _pow2(ncols) <= 8 else _BLOCK_ROWS // 2


def _flat_pos(S):
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
    return sub * _LANES + lane, lane


def _flat_roll1(v, S):
    """y.flat[i] = v.flat[i-1] (y.flat[0] = v.flat[-1], caller replaces)."""
    xl = pltpu.roll(v, 1, 1)
    xp = pltpu.roll(xl, 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
    return jnp.where(lane < 1, xp, xl)


def _flat_roll_fwd(v, d, S, fill):
    """y.flat[i] = v.flat[i-d] for static d > 0; head filled with
    ``fill`` (the gather-from-behind mirror of _flat_roll_back)."""
    ml, ms = d % _LANES, d // _LANES
    y = v
    if ml:
        xl = pltpu.roll(y, ml, 1)               # y[s,l] = v[s, (l-ml)%128]
        xp = pltpu.roll(xl, 1, 0)               # previous row's wrap
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
        y = jnp.where(lane < ml, xp, xl)
    if ms:
        y = pltpu.roll(y, ms, 0)
    fpos, _ = _flat_pos(S)
    return jnp.where(fpos < d, fill, y)


def _flat_roll_back(v, d, S, fill):
    """y.flat[i] = v.flat[i+d] for static d > 0; tail filled with `fill`.

    d = ml + ms*128.  Gather-from-ahead: lane roll by -ml pulls within
    the row (elements wrapping came from the next row), sublane roll by
    -ms moves whole rows up.
    """
    n = S * _LANES
    ml, ms = d % _LANES, d // _LANES
    y = v
    if ml:
        xl = pltpu.roll(y, _LANES - ml, 1)      # y[s,l] = v[s, (l+ml)%128]
        xn = pltpu.roll(xl, S - 1, 0)           # next row's wrapped part
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
        y = jnp.where(lane >= _LANES - ml, xn, xl)
    if ms:
        y = pltpu.roll(y, S - ms, 0)
    fpos, _ = _flat_pos(S)
    return jnp.where(fpos >= n - d, fill, y)


def _cumsum_flat_incl(x, S):
    """Inclusive prefix sum over flat order: lane scan + row-base scan."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
    out = x
    sh = 1
    while sh < _LANES:
        r = pltpu.roll(out, sh, 1)
        out = out + jnp.where(lane >= sh, r, 0)
        sh *= 2
    row_tot = jax.lax.broadcast_in_dim(out[:, _LANES - 1], (S, _LANES), (0,))
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 0)
    base = row_tot
    sh = 1
    while sh < S:
        r = pltpu.roll(base, sh, 0)
        base = base + jnp.where(sub >= sh, r, 0)
        sh *= 2
    # base is inclusive-of-own-row; exclusive row base:
    return out + (base - row_tot)


def _cummax_flat(x, S, neg):
    """Inclusive prefix max over flat order (monotone candidates)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
    out = x
    sh = 1
    while sh < _LANES:
        r = pltpu.roll(out, sh, 1)
        out = jnp.maximum(out, jnp.where(lane >= sh, r, neg))
        sh *= 2
    row_max = jax.lax.broadcast_in_dim(out[:, _LANES - 1], (S, _LANES), (0,))
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 0)
    base = row_max
    sh = 1
    while sh < S:
        r = pltpu.roll(base, sh, 0)
        base = jnp.maximum(base, jnp.where(sub >= sh, r, neg))
        sh *= 2
    # exclusive row base: inclusive row scan shifted down one row
    base_excl = jnp.where(sub >= 1, pltpu.roll(base, 1, 0), neg)
    return jnp.maximum(out, base_excl)


def _clamp_u32(c):
    big = jnp.uint32(1 << 20)
    return jnp.where(c > big, big + (c & (big - 1)), c)


def _shift_fwd_dyn(v, r, S, fill, residual):
    """Dense-mode staging shift: (S, 128) -> (S+1, 128) where
    out.flat[i] = residual.flat[i] for i < r, v.flat[i - r] for
    r <= i < r + S*128, ``fill`` beyond.  ``r`` is a traced scalar in
    [0, 128); ``residual`` is a (1, 128) row whose lanes >= r are
    already ``fill``."""
    xl = pltpu.roll(v, r, 1)            # lane rotate: xl[s, l] = v[s, (l-r)%128]
    xp = pltpu.roll(xl, 1, 0)           # previous row's rotated values
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 0)
    ri = r.astype(jnp.int32)
    y = jnp.where(lane < ri, xp, xl)    # wrapped low lanes come from row above
    res_b = jax.lax.broadcast_in_dim(residual, (S, _LANES), (0, 1))
    y = jnp.where((sub == 0) & (lane < ri), res_b, y)
    # overflow row: the r elements pushed past row S-1 live in xl[S-1]'s
    # low lanes
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ov = jnp.where(lane1 < ri, jax.lax.slice(xl, (S - 1, 0), (S, _LANES)), fill)
    return jnp.concatenate([y, ov], axis=0)


def _row_at_dyn(x, row, S1, fill_dtype):
    """Extract row ``row`` (traced scalar) of an (S1, 128) value as a
    (1, 128) row via a masked cross-sublane reduction (no dynamic VMEM
    indexing)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (S1, _LANES), 0)
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    picked = jnp.sum(jnp.where(sub == row.astype(jnp.int32), xi, 0),
                     axis=0, keepdims=True)
    return jax.lax.bitcast_convert_type(picked, fill_dtype)


def segsum_rows(key, cnt, i, S: int, W: int, carry, cmask,
                full_sum: bool = False):
    """Shared fused segment-sum + alive compaction over one (S, 128)
    block of SORTED rows — the core both the compact kernel and the
    merge kernel (ops/pallas_merge.py) run after producing their sorted
    block: segment boundaries against the carried previous row, lagged
    (decided) row quantities, per-segment totals via the cumsum-free
    ``c_last + (len - 1)`` trick with the modular clamp, and the
    monotone log-shift packing of alive rows to the block front.

    Reads carries [0..W+2] (prev key words / cnt / sent / segstart);
    writes nothing.  Returns (cur, av, acount, carry_vals):
      cur:   W+1 (S, 128) planes (decided keys + segment totals),
             alive rows packed to the front per ``av``;
      av:    int32 {0,1} post-shift occupancy mask;
      acount: scalar int32 alive-row count;
      carry_vals: uint32 scalars for carries [0..W+2] from this block's
             final (unlagged) row.

    ``full_sum=True`` replaces the c_last trick with a TRUE clamped
    segmented inclusive scan (log-shift in VMEM, cross-block carry of
    the running segment sum in carry[W]): exact for ANY number of
    non-unit-count rows per segment and any segment length — the
    modular clamp commutes with addition, so clamping every step keeps
    intermediates < 2^22 while preserving both output contracts
    (sortcount._clamp_count).  Finalize expansion needs this: one
    clamped row per distinct run containing a k-mer makes segment mass
    unbounded (the XLA formulation is sortcount.compact(clamped=True),
    measured 503 ms of scan+partition at 50M rows vs one pass here).
    """
    n = S * _LANES
    fpos, _lane = _flat_pos(S)
    is0 = fpos == 0

    # sentinel rows: all key words all-ones once count bits are set
    acc = key[W - 1] | cmask
    for w in range(W - 1):
        acc = acc & key[w]
    sent = jnp.where(acc == SENT, jnp.int32(1), jnp.int32(0))

    # segment-first marks vs previous row (carry for flat 0)
    neq = jnp.zeros((S, _LANES), jnp.int32)
    for w in range(W):
        pk = jnp.where(is0, carry[w], _flat_roll1(key[w], S))
        neq = jnp.maximum(neq, jnp.where(pk != key[w], 1, 0))
    first = neq

    gpos = i * n + fpos
    cand = jnp.where(first == 1, gpos, jnp.int32(-1))
    segstart = jnp.maximum(_cummax_flat(cand, S, jnp.int32(-1)),
                           carry[W + 2].astype(jnp.int32))

    # decided (lagged) row quantities: decided j == global row i*n-1+j
    def lag(v, c0):
        return jnp.where(is0, c0, _flat_roll1(v, S))

    dk = [lag(key[w], carry[w]) for w in range(W)]
    dsent = lag(sent, carry[W + 1].astype(jnp.int32))
    dstart = lag(segstart, carry[W + 2].astype(jnp.int32))
    alive = first * (1 - dsent)
    if full_sum:
        # clamped segmented inclusive scan: val[i] += val[i-d] when row
        # i-d is in my segment (gpos-d >= segstart), clamp each step
        val = _clamp_u32(cnt.astype(jnp.uint32))
        d = 1
        while d < n:
            prev = _flat_roll_fwd(val, d, S, jnp.uint32(0))
            ok = jnp.where(gpos - d >= segstart, jnp.uint32(1),
                           jnp.uint32(0))
            ok = ok * jnp.where(fpos >= d, jnp.uint32(1), jnp.uint32(0))
            val = _clamp_u32(val + ok * prev)
            d *= 2
        # rows of the block's FIRST segment (started before this block)
        # inherit the carried running sum
        inherit = jnp.where(segstart < i * n, jnp.uint32(1), jnp.uint32(0))
        val = _clamp_u32(val + inherit * carry[W])
        cnt_for_carry = val            # carry[W] = running segment sum
        dcnt = lag(val, carry[W])
        total = _clamp_u32(dcnt)
    else:
        cnt_for_carry = cnt
        dcnt = lag(cnt, carry[W])
        total = _clamp_u32(dcnt + (gpos - 1 - dstart).astype(jnp.uint32))
    ocnt = jnp.where(alive == 1, total, jnp.uint32(0))

    # ---- monotone log-shift compaction of alive rows ----
    sh = _cumsum_flat_incl(1 - alive, S) - (1 - alive)  # excl. dead count
    cur = dk + [ocnt]
    av, sv = alive, sh
    d = 1
    while d < n:
        mv = av * jnp.where((sv & d) != 0, 1, 0)
        take = _flat_roll_back(mv, d, S, jnp.int32(0))
        cur = [
            jnp.where(take == 1, _flat_roll_back(c, d, S, SENT), c)
            for c in cur
        ]
        sv = jnp.where(take == 1, _flat_roll_back(sv, d, S, jnp.int32(0)), sv)
        av = jnp.where(take == 1, jnp.int32(1), av * (1 - mv))
        d *= 2

    # carries from this block's (unlagged) final row — scalar extraction
    # via masked reductions (Mosaic lowers signed-int reductions only;
    # single-term i32 sums preserve u32 bit patterns)
    last1 = jnp.where(fpos == n - 1, jnp.int32(1), jnp.int32(0))

    def _last_u32(x):
        xi = jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.int32)
        return jnp.sum(xi * last1).astype(jnp.uint32)

    carry_vals = [_last_u32(key[w]) for w in range(W)] + [
        _last_u32(cnt_for_carry), _last_u32(sent), _last_u32(segstart)]
    return cur, av, jnp.sum(alive), carry_vals


def dense_stage(cur, av, acount, r, residual, S: int, W: int):
    """Shared dense staging: shift the alive-packed block by the carried
    residual count, splice the residual row in, and compute the next
    residual.  ``residual`` is a (1, (W+1)*128) lane-major VMEM ref,
    plane w in lanes [w*128, (w+1)*128) — 2D because it is VMEM-only
    (never DMA'd), so the _pow2 plane-count constraint on DMA slabs
    does not apply and no dummy planes are needed.  Returns (staged
    list of (S+1, 128) planes, new_res list of (1, 128) rows,
    full_rows, new_r)."""
    total_el = r.astype(jnp.int32) + acount
    full_rows = total_el // _LANES
    new_r = total_el % _LANES
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    staged_all, res_all = [], []
    for w in range(W + 1):
        fill = jnp.uint32(0) if w == W else SENT
        clean = jnp.where(av == 1, cur[w], fill)
        res_w = residual[:, w * _LANES:(w + 1) * _LANES]
        staged = _shift_fwd_dyn(clean, r, S, fill, res_w)
        staged_all.append(staged)
        picked = _row_at_dyn(staged, full_rows, S + 1, jnp.uint32)
        res_all.append(jnp.where(lane1 < new_r, picked, fill))
    return staged_all, res_all, full_rows, new_r


def _compact_kernel(W: int, S: int, embedded: bool, ebits: int,
                    dense: bool = False, full_sum: bool = False):
    """Build the kernel body.  Refs:
      ins:  s_0..s_{W-1} [, cnt_in]   each (S, 128) blocks
      outs: o_0..o_{W-1}, o_cnt (ANY/HBM, full arrays), nd (SMEM (2,))
      scratch: carry SMEM (W+5,), vout VMEM (S[+1], P, 128) with
               P = pow2(W+1) (see _pow2),
               [residual VMEM (1, (W+1)*128) in dense mode,] sem DMA
    carry layout: [0..W): prev key words (count-stripped);
      [W]: prev cnt; [W+1]: prev sent; [W+2]: prev segstart;
      [W+3]: row cursor; [W+4]: residual element count (dense mode);
      nd accumulates in the nd output itself.

    ``dense=True`` packs the output with NO interspersed pad rows: each
    block's alive rows are shifted by the carried residual count and
    the partial last row rides in a VMEM residual buffer to the next
    block (nd_used == ceil(nd_exact/128)*128, everything in between is
    sentinel fill).
    """
    n = S * _LANES
    cmask = np.uint32((1 << ebits) - 1) if embedded else np.uint32(0)

    def kernel(*refs):
        nin = W + (0 if embedded else 1)
        in_refs = refs[:nin]
        out_ref = refs[nin]
        nd_ref = refs[nin + 1]
        carry = refs[nin + 2]
        vout = refs[nin + 3]
        if dense:
            residual = refs[nin + 4]
            sem = refs[nin + 5]
        else:
            sem = refs[nin + 4]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for w in range(W):
                carry[w] = SENT
            carry[W] = jnp.uint32(0)       # prev cnt
            carry[W + 1] = jnp.uint32(1)   # prev sent
            carry[W + 2] = jnp.uint32(0)   # prev segstart
            carry[W + 3] = jnp.uint32(0)   # row cursor
            carry[W + 4] = jnp.uint32(0)   # residual count (dense)
            nd_ref[0] = jnp.int32(0)
            nd_ref[1] = jnp.int32(0)
            if dense:
                residual[...] = jnp.concatenate(
                    [jnp.full((1, W * _LANES), SENT, jnp.uint32),
                     jnp.zeros((1, _LANES), jnp.uint32)], axis=1)

        key = [in_refs[w][...] for w in range(W)]
        if embedded:
            cnt = key[W - 1] & cmask
            # strip via subtraction, NOT `& ~cmask`: Mosaic miscompiles an
            # AND with a negative-as-i32 splat constant when it fuses into
            # a downstream pltpu.roll (measured on the target toolchain:
            # 0xFFC00000-masked values came out of the roll with bit 31
            # or bit 22 cleared; see tests/test_pallas_compact.py
            # test_adjacent_low_keybit_segments for the regression case)
            key[W - 1] = key[W - 1] - cnt
        else:
            cnt = in_refs[W][...]

        cur, av, acount, carry_vals = segsum_rows(key, cnt, i, S, W,
                                                  carry, cmask,
                                                  full_sum=full_sum)
        cursor = carry[W + 3].astype(jnp.int32)

        if dense:
            staged_all, res_all, full_rows, new_r = dense_stage(
                cur, av, acount, carry[W + 4], residual, S, W)
            residual[...] = jnp.concatenate(res_all, axis=1)
            arows = full_rows
            nrows_dma = S + 1
        else:
            staged_all = [jnp.where(av == 1, cur[w], SENT) for w in range(W)]
            staged_all.append(jnp.where(av == 1, cur[W], jnp.uint32(0)))
            arows = (acount + (_LANES - 1)) // _LANES
            nrows_dma = S
        # ONE interleaved output DMA per block (per-plane streams paid
        # the ~24 us fixed DMA cost W+1 times per block; the caller
        # de-interleaves in XLA, which is a cheap strided copy).
        # The plane dim is padded to a power of two (see _pow2)
        for _ in range(_pow2(W + 1) - (W + 1)):
            staged_all.append(jnp.full_like(staged_all[0], SENT))
        vout[...] = jnp.stack(staged_all, axis=1)
        out_dma = pltpu.make_async_copy(
            vout, out_ref.at[pl.ds(cursor, nrows_dma)], sem)
        out_dma.start()
        out_dma.wait()

        for w, v in enumerate(carry_vals):
            carry[w] = v
        carry[W + 3] = (cursor + arows).astype(jnp.uint32)
        nd_ref[0] = nd_ref[0] + acount
        if dense:
            carry[W + 4] = new_r.astype(jnp.uint32)
            # + the partial residual row at cursor + arows, counted only
            # when non-empty (otherwise nd_used == nd_exact exactly at
            # full-row boundaries — an inflated nd_used would trigger
            # spurious grow-and-replay when the output exactly fits)
            nd_ref[1] = (cursor + arows + jnp.minimum(new_r, 1)) * _LANES
        else:
            nd_ref[1] = (cursor + arows) * _LANES

    return kernel


@partial(jax.jit, static_argnames=("embedded", "ebits", "block_rows",
                                   "interpret", "dense", "full_sum"))
def segsum_compact(cols, *, embedded: bool, ebits: int,
                   block_rows: "int | None" = None, interpret: bool = False,
                   dense: bool = False, full_sum: bool = False):
    """Fused segment-sum + compaction over sorted store columns.

    cols: tuple of W uint32 key columns (count embedded in the last
      word's low `ebits` when ``embedded``) or W+1 columns (separate
      trailing count column sorted as least-significant key) — all flat
      (N,), N a multiple of 128*block_rows, sorted, with at least one
      trailing sentinel row.
    Returns (W key cols + 1 count col, each (N + (block_rows+1)*128,),
    nd_exact, nd_used): sorted distinct records in the first ``nd_used``
    elements; everything at index >= nd_used is garbage (caller masks).
    With ``dense=False`` up to 127 sentinel pad rows are interspersed
    per block boundary (nd_used >= nd_exact rounded up per block); with
    ``dense=True`` the records are contiguous and only the final
    partial 128-lane row is sentinel-padded
    (nd_used == ceil(nd_exact/128)*128).
    """
    W = len(cols) - (0 if embedded else 1)
    N = cols[0].shape[0]
    if block_rows is None:
        block_rows = block_rows_for(W + 1)
    S = block_rows
    if N % (S * _LANES):
        raise ValueError(f"N={N} not a multiple of {S * _LANES}")
    nblocks = N // (S * _LANES)
    if full_sum and embedded:
        raise ValueError("full_sum needs a separate count column")
    kern = _compact_kernel(W, S, embedded, ebits, dense, full_sum)

    nin = len(cols)
    P = _pow2(W + 1)
    out_rows = N // _LANES + S + 1
    out_shapes = [
        jax.ShapeDtypeStruct((out_rows, P, _LANES), jnp.uint32),
        jax.ShapeDtypeStruct((2,), jnp.int32),
    ]
    grid = (nblocks,)
    in_specs = [
        pl.BlockSpec((S, _LANES), lambda i: (i, 0)) for _ in range(nin)
    ]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
    scratch = [pltpu.SMEM((W + 5,), jnp.uint32),
               pltpu.VMEM((S + (1 if dense else 0), P, _LANES),
                          jnp.uint32)]
    if dense:
        scratch.append(pltpu.VMEM((1, (W + 1) * _LANES), jnp.uint32))
    scratch.append(pltpu.SemaphoreType.DMA(()))
    out, nd = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*[jax.lax.bitcast_convert_type(c, jnp.uint32).reshape(-1, _LANES)
        for c in cols])
    okeys = [out[:, w, :].reshape(-1) for w in range(W)]
    ocnt = out[:, W, :].reshape(-1)
    return tuple(okeys), ocnt, nd[0], nd[1]
