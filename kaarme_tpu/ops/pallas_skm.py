"""Pallas TPU kernel: fused super-k-mer segmentation + slot packing.

Replaces the XLA `run_rows` + `pack_slots` front half of the skm
superstep (ops/skm.py).  The XLA formulation is pass-count bound:
~60 full-array elementwise/scan passes per superstep (measured 210 ms
for 16M windows — every elementwise op on this backend is a memory
pass, and each pass costs ~25-31 ms per 2^24 elements regardless of
formulation, scripts/probe_scans.py).  This kernel reads the unpacked
code stream once per block and writes ONLY the slotted run rows
(~S/512 of the window mass), keeping every intermediate in VMEM:

  per block of B = block_rows*128 window positions (sequential grid):
    - raw 16-base big-endian words at every position (16 lane/sublane
      rolls, the pallas_winkeys pattern);
    - window validity (log-shift sliding OR of the invalid bits over k);
    - minimizer per window (log-shift sliding MIN of raw over k-15);
    - run starts: minimizer/validity change vs the previous window
      (SMEM carry across blocks) | LMAX cap force anchored at the last
      TRUE start (in-block cummax + SMEM carry of the global position);
    - run length ell: distance to the next start, <= LMAX by
      construction for live runs (log-shift window-min over 16 on the
      halo-extended domain);
    - per-tile (512 windows) slot ordinals via an in-block cumsum with
      tile bases subtracted; rows whose ordinal exceeds the slot budget
      S are dropped and reported through the per-block max-runs output
      (the driver's ladder-replay contract, models/skm_counter.py);
    - content words (Wc gathers-from-ahead of raw), span-masked, plus
      the (ell-1)<<26 | 1 meta word (dead runs all-ones);
    - a TWO-stage monotone log-shift compaction moves every surviving
      start row from window position tile*512+p to output position
      tile*S+slot (the pallas_compact machinery): within-tile
      front-pack, then a uniform per-tile re-stride — a single shift
      is not monotone across tile boundaries and collides.

Bit-identical to the XLA path (tests/test_pallas_skm.py pins both the
interpreter and, via bench --verify, the compiled kernel).

Reference counterpart: none — the reference has no minimizer concept;
the capability this accelerates maps to its one-character-and-pointer
chain exploiting window overlap (source/kmer_hash_table.cpp:2769-3068).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_compact import (_LANES, _cummax_flat, _cumsum_flat_incl,
                             _flat_pos, _flat_roll1, _flat_roll_back,
                             _row_at_dyn, _shift_fwd_dyn, _pow2)

SENT = np.uint32(0xFFFFFFFF)
_BLOCK_ROWS = 256
M = 16       # minimizer m-mer length (ops/skm.py contract)
LMAX = 16
EBITS = 26


def _shift_flat2(c2, d: int, S2: int):
    """(S2,128) y with y.flat[i] = c2.flat[i+d], static d >= 0, on the
    full concat domain (garbage wraps in the last d positions — callers
    only read far from the end)."""
    if d == 0:
        return c2
    ml, ms = d % _LANES, d // _LANES
    y = c2
    if ml:
        xl = pltpu.roll(y, _LANES - ml, 1)
        xn = pltpu.roll(xl, S2 - 1, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S2, _LANES), 1)
        y = jnp.where(lane >= _LANES - ml, xn, xl)
    if ms:
        y = pltpu.roll(y, S2 - ms, 0)
    return y


def _slide_min(x, w: int, S2: int):
    """y.flat[i] = min(x.flat[i .. i+w-1]) by log-shift."""
    y, s = x, 1
    while s < w:
        step = min(s, w - s)
        y = jnp.minimum(y, _shift_flat2(y, step, S2))
        s += step
    return y


def _slide_or(x, w: int, S2: int):
    y, s = x, 1
    while s < w:
        step = min(s, w - s)
        y = y | _shift_flat2(y, step, S2)
        s += step
    return y


def _roll_back_nf(v, d: int, S: int):
    """_flat_roll_back without the tail fill: y.flat[i] = v.flat[i+d]
    with WRAPPED garbage in the last d flat positions.  Safe wherever
    the rolled value is consumed behind a ``take`` mask that is itself
    rolled with a 0 fill — take is 0 at every garbage position, so the
    fill pass (one extra vector op per plane per iteration, and HALF
    the cost of the row-granularity iterations) is dead work in the
    pack loops."""
    ml, ms = d % _LANES, d // _LANES
    y = v
    if ml:
        xl = pltpu.roll(y, _LANES - ml, 1)
        xn = pltpu.roll(xl, S - 1, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
        y = jnp.where(lane >= _LANES - ml, xn, xl)
    if ms:
        y = pltpu.roll(y, S - ms, 0)
    return y


def _halo_rows(S_rows: int, k: int) -> int:
    """Halo rows appended to the compute domain: covers the element
    lookahead (content words + minimizer window + ell probe), rounded
    to whole 8-sublane groups.  Computing on S_rows + H rows instead of
    2*S_rows nearly halves the front-half VPU work (the lookahead is
    ~150 elements at k=51 vs a 32768-element block)."""
    Wc = (LMAX + k - 1 + 15) // 16
    lookahead = max(k + M * (Wc - 1) + LMAX + 2, k + 17)
    if S_rows <= 8:
        return S_rows                       # full next block (old shape)
    H = max(8, -(-lookahead // _LANES // 8) * 8)
    while S_rows % H:
        H += 8
    return min(H, S_rows)


def _seg_rows_block(main_ref, halo_ref, i, carry, k: int, S_rows: int,
                    Wc: int):
    """Shared segmentation front half on one block (the slotted and the
    dense kernels differ only in how they compact the start rows).

    ``halo_ref`` holds the next _halo_rows(S_rows, k) rows of the
    stream (a whole block in the legacy shape).  Returns (b, vld, cur):
    run-start flags and window validity (int32 {0,1}) on the main block
    domain, plus the Wc+1 value planes (span-masked content words +
    meta; dead runs all-ones).  Reads and writes carry[0..2] =
    [prev_minv, prev_valid, last_true_start].
    """
    H = halo_ref.shape[0]
    S2 = S_rows + H
    n_blk = S_rows * _LANES
    w_min = k - M + 1

    c2 = jnp.concatenate([main_ref[...], halo_ref[...]], axis=0)
    fpos2, _ = _flat_pos(S2)
    gpos2 = i * n_blk + fpos2

    # raw 16-base big-endian words at every position
    raw = jnp.zeros((S2, _LANES), jnp.uint32)
    for p in range(M):
        code = _shift_flat2(c2, p, S2) & jnp.uint32(3)
        raw = raw | (code << jnp.uint32(2 * (M - 1 - p)))

    # window validity: any invalid base in [i, i+k)
    invb = (c2 >> jnp.uint32(2)) & jnp.uint32(1)
    invw = _slide_or(invb, k, S2)
    valid = (jnp.uint32(1) - invw).astype(jnp.int32)

    # minimizer per window; invalid windows forced to +inf.
    # Mosaic has no unsigned vector min (arith.minui fails to
    # legalize) — flip the sign bit so uint32 order == int32 order
    # and take the min in signed space (only EQUALITY of minimizers
    # is consumed downstream, so the biased domain never leaks).
    raws = jax.lax.bitcast_convert_type(
        raw ^ jnp.uint32(0x80000000), jnp.int32)
    minv = _slide_min(raws, w_min, S2) if w_min > 1 else raws
    minv = jnp.where(invw > 0, jnp.int32(0x7FFFFFFF), minv)

    # true run starts: minimizer/validity change vs previous window
    pm = jnp.where(fpos2 == 0, carry[0].astype(jnp.int32),
                   _flat_roll1(minv, S2))
    pv = jnp.where(fpos2 == 0, carry[1].astype(jnp.int32),
                   _flat_roll1(valid, S2))
    true_b = jnp.where((minv != pm) | (valid != pv) | (gpos2 == 0),
                       jnp.int32(1), jnp.int32(0))

    # LMAX cap force anchored at the last TRUE start (global pos)
    cand = jnp.where(true_b == 1, gpos2, jnp.int32(-1))
    lts = jnp.maximum(_cummax_flat(cand, S2, jnp.int32(-1)),
                      carry[2].astype(jnp.int32))
    pos1 = gpos2 - lts
    force = jnp.where(
        (valid == 1) & (pos1 > 0) & ((pos1 & jnp.int32(LMAX - 1)) == 0),
        jnp.int32(1), jnp.int32(0))
    b2 = jnp.maximum(true_b, force)

    # ell: distance to the next start within [i+1, i+LMAX]
    x = jnp.where(b2 == 1, fpos2, jnp.int32(1 << 30))
    nxt = _slide_min(_shift_flat2(x, 1, S2), LMAX, S2)
    ell2 = jnp.clip(nxt - fpos2, 1, LMAX)

    # ---- slice to the main block domain ----
    sl = lambda v: jax.lax.slice(v, (0, 0), (S_rows, _LANES))
    b = sl(b2)
    ell = sl(ell2)
    vld = sl(valid)

    # carries for the next block (window B-1's unsliced values)
    lastm = jnp.where(fpos2 == n_blk - 1, jnp.int32(1), jnp.int32(0))

    def _at_last(v):
        vi = jax.lax.bitcast_convert_type(v.astype(jnp.uint32), jnp.int32)
        return jnp.sum(vi * lastm).astype(jnp.uint32)

    carry[0] = _at_last(minv)
    carry[1] = _at_last(valid.astype(jnp.uint32))
    carry[2] = _at_last(lts.astype(jnp.uint32))

    # ---- run-row values at start positions ----
    dead = jnp.uint32(0) - (jnp.int32(1) - vld).astype(jnp.uint32)
    span = ell + jnp.int32(k - 1)
    cur = []
    for j in range(Wc):
        cw = sl(_shift_flat2(raw, M * j, S2))
        nb = jnp.clip(span - 16 * j, 0, 16)
        sh = jnp.clip(32 - 2 * nb, 0, 30).astype(jnp.uint32)
        mask = (jnp.uint32(0xFFFFFFFF) << sh) \
            * jnp.minimum(nb, 1).astype(jnp.uint32)
        cur.append((cw & mask) | dead)
    meta = (((ell - 1).astype(jnp.uint32) << jnp.uint32(EBITS))
            | jnp.uint32(1)) | dead
    cur.append(meta)
    return b, vld, cur


def _skm_kernel(k: int, S_rows: int, S_slots: int, Wc: int):
    n_blk = S_rows * _LANES
    # tiles per block = S_rows*128/512 = S_rows//4; out elems = tiles*S_slots
    out_rows = ((S_rows // 4) * S_slots) // _LANES

    def kernel(main_ref, next_ref, *refs):
        # refs: out content words [Wc], out meta, out maxruns (8,128)
        #       (single block rewritten every step; [0,0] = running max),
        #       carry SMEM (4,): [prev_minv, prev_valid, last_true_start,
        #       running_maxruns]
        *out_refs, mr_ref, carry = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            carry[0] = jnp.uint32(0)
            carry[1] = jnp.uint32(2)       # neither 0 nor 1: forces a
            carry[2] = jnp.uint32(0)       # validity-change start at 0
            carry[3] = jnp.uint32(0)       # running max-runs-per-tile

        b, vld, cur = _seg_rows_block(main_ref, next_ref, i, carry,
                                      k, S_rows, Wc)
        fpos, _ = _flat_pos(S_rows)

        # ---- per-tile slot ordinals (tiles = 512 windows, in-block) ----
        C = _cumsum_flat_incl(b, S_rows)            # inclusive starts count
        is_tl = jnp.where((fpos & jnp.int32(511)) == 511,
                          jnp.int32(1), jnp.int32(0))
        D = _cummax_flat(jnp.where(is_tl == 1, C, jnp.int32(0)),
                         S_rows, jnp.int32(0))
        E = jnp.where(fpos == 0, jnp.int32(0), _flat_roll1(D, S_rows))
        slot = C - b - E                            # exclusive in-tile ordinal
        runs_t = (C - E) * is_tl
        mr = jnp.maximum(jnp.max(runs_t), carry[3].astype(jnp.int32))
        carry[3] = mr.astype(jnp.uint32)
        mr_ref[...] = jnp.broadcast_to(mr, (8, _LANES))

        # ---- two-stage monotone log-shift compaction ----
        # A single shift to tile*S_slots+slot is NOT monotone across
        # tile boundaries (a tile whose starts sit late has a larger
        # distance than the next tile's early starts) and collides.
        # Stage 1 front-packs starts WITHIN their tile (distances
        # nondecreasing inside a tile, and moves never cross the tile's
        # left edge, so tiles cannot interact); stage 2 re-strides whole
        # tiles from 512 to S_slots spacing (uniform per-tile distance,
        # globally nondecreasing).
        def logshift(cur, av, dist, dmax):
            # value planes and dist roll without tail fill — take's own
            # 0 fill guards the wrapped garbage (see _roll_back_nf)
            d = 1
            while d < dmax:
                mv = av * jnp.where((dist & d) != 0, 1, 0)
                take = _flat_roll_back(mv, d, S_rows, jnp.int32(0))
                cur = [jnp.where(take == 1, _roll_back_nf(c, d, S_rows), c)
                       for c in cur]
                dist = jnp.where(
                    take == 1, _roll_back_nf(dist, d, S_rows), dist)
                av = jnp.where(take == 1, jnp.int32(1), av * (1 - mv))
                d *= 2
            return cur, av

        av = b * jnp.where(slot < S_slots, 1, 0)
        dist1 = jnp.where(av == 1,
                          (fpos & jnp.int32(511)) - slot, jnp.int32(0))
        cur = [jnp.where(av == 1, c, SENT) for c in cur]
        cur, av = logshift(cur, av, dist1, 512)

        tile = fpos >> jnp.int32(9)       # post-stage-1 position's tile
        dist2 = jnp.where(av == 1, tile * (512 - S_slots), jnp.int32(0))
        cur, av = logshift(cur, av, dist2, n_blk)

        for j in range(Wc + 1):
            out = jnp.where(av == 1, cur[j], SENT)
            out_refs[j][...] = jax.lax.slice(out, (0, 0),
                                             (out_rows, _LANES))

    return kernel, out_rows


def pick_block_rows(n: int, k: int, S: int) -> "int | None":
    """Largest supported block size for an n-window superstep (multiple
    of one 512-window tile, dividing n, lookahead-covering, with a
    whole number of 128-lane output rows per block), or None."""
    Wc = (LMAX + k - 1 + 15) // 16
    lookahead = max(k + M * (Wc - 1) + LMAX + 2, k + 17)
    for br in (256, 128, 64, 32, 16, 8, 4):
        # Mosaic block constraint: output blocks need >= 8 sublane rows
        # divisibility, i.e. (tiles_per_block * S) % (8 * 128) == 0
        if (n % (br * _LANES) == 0 and lookahead <= br * _LANES
                and ((br // 4) * S) % (8 * _LANES) == 0):
            return br
    return None


@partial(jax.jit, static_argnames=("k", "n", "S", "block_rows", "interpret"))
def run_rows_slotted_pallas(codes, *, k: int, n: int, S: int,
                            block_rows: "int | None" = None,
                            interpret: bool = False):
    """codes (uint32 [>= n + lookahead], bit0-1 = 2-bit code, bit 2 =
    invalid) -> (slotted columns: Wc content + meta, each uint32
    [(n // 512) * S], max_tile_runs int32 scalar) — bit-identical to
    skm.run_rows + skm.pack_slots.

    n must be a multiple of block_rows*128 (default: largest supported
    block, pick_block_rows); S even, <= 512; windows [n_real, n) must
    be invalid in `codes` (the superstep's separator padding guarantees
    it).
    """
    if k < M:
        raise ValueError("skm kernel requires k >= 16")
    Wc = (LMAX + k - 1 + 15) // 16
    if block_rows is None:
        block_rows = pick_block_rows(n, k, S)
        if block_rows is None:
            raise ValueError(f"n={n} has no supported block size")
    elif block_rows % 4 or ((block_rows // 4) * S) % _LANES:
        # mirror the pick_block_rows divisibility: out_rows floor-division
        # would otherwise silently truncate trailing slotted rows (ADVICE r4)
        raise ValueError(
            f"block_rows={block_rows} needs block_rows % 4 == 0 and "
            f"(block_rows // 4) * S divisible by {_LANES}")
    blk = block_rows * _LANES
    if n % blk:
        raise ValueError(f"n={n} not a multiple of {blk}")
    if S % 2 or S > 512:
        raise ValueError("S must be even and <= 512")
    H = _halo_rows(block_rows, k)
    lookahead = max(k + M * (Wc - 1) + LMAX + 2, k + 17)
    if lookahead > H * _LANES:
        raise ValueError(f"k={k} lookahead exceeds the halo")
    nb = n // blk
    need = (nb + 1) * blk
    pad = need - codes.shape[0]
    if pad < 0:
        codes = codes[:need]
    else:
        codes = jnp.concatenate([codes, jnp.full((pad,), jnp.uint32(4))])
    c2d = codes.reshape(-1, _LANES)

    kernel, out_rows = _skm_kernel(k, block_rows, S, Wc)
    grid = (nb,)
    hstep = block_rows // H
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((nb * out_rows, _LANES), jnp.uint32)
                   for _ in range(Wc + 1)]
        + [jax.ShapeDtypeStruct((8, _LANES), jnp.int32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((H, _LANES), lambda i, _h=hstep: ((i + 1) * _h, 0)),
        ],
        out_specs=[pl.BlockSpec((out_rows, _LANES), lambda i: (i, 0))
                   for _ in range(Wc + 1)]
        + [pl.BlockSpec((8, _LANES), lambda i: (0, 0))],
        scratch_shapes=[pltpu.SMEM((4,), jnp.uint32)],
        interpret=interpret,
    )(c2d, c2d)
    cols = tuple(o.reshape(-1) for o in outs[:-1])
    maxruns = outs[-1][0, 0]
    return cols, maxruns


# ---------------------------------------------------------------------------
# Dense variant: global-cursor DMA output, no per-tile slot budget
# ---------------------------------------------------------------------------
# The slotted layout pays S/512 of the window mass in sorted rows per
# superstep regardless of how many runs actually start (measured on the
# bench workload: 37% live at S=96 — SKMPROFILE_r05.json), and dead
# (invalid) runs still occupy slots.  The dense kernel front-packs ALL
# live start rows of a block with ONE monotone log-shift (the move
# distance "dead rows before me" is nondecreasing, so the tile dance
# above is unnecessary) and appends them at a global row cursor with
# the pallas_compact residual-row machinery.  Output capacity is a
# ladder value the driver grows on overflow (reported through the rows
# vector) — the run-domain analogue of store grow-and-replay.


def _skm_dense_kernel(k: int, S_rows: int, Wc: int, cap_rows: int):
    n_blk = S_rows * _LANES
    P = _pow2(Wc + 1)

    def kernel(main_ref, next_ref, out_ref, nd_ref, carry, vout,
               residual, sem):
        # carry SMEM (6,): [prev_minv, prev_valid, last_true_start,
        #                   row_cursor, residual_count, spare]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            carry[0] = jnp.uint32(0)
            carry[1] = jnp.uint32(2)       # neither 0 nor 1: forces a
            carry[2] = jnp.uint32(0)       # validity-change start at 0
            carry[3] = jnp.uint32(0)       # output row cursor
            carry[4] = jnp.uint32(0)       # residual element count
            nd_ref[0] = jnp.int32(0)
            nd_ref[1] = jnp.int32(0)
            residual[...] = jnp.full((1, (Wc + 1) * _LANES), SENT,
                                     jnp.uint32)

        b, vld, cur = _seg_rows_block(main_ref, next_ref, i, carry,
                                      k, S_rows, Wc)

        # live starts only — dead (invalid) runs are dropped entirely
        av = b * vld
        acount = jnp.sum(av)
        cur = [jnp.where(av == 1, c, SENT) for c in cur]

        # ONE monotone log-shift front-pack (dist = dead rows before me).
        # Value planes and dist roll WITHOUT tail fill (_roll_back_nf):
        # take is rolled with a 0 fill, so wrapped garbage at the tail
        # is never selected — the fill passes were dead work (~1/3 of
        # the pack's vector ops at 15 iterations x 7 planes).
        dist = _cumsum_flat_incl(1 - av, S_rows) - (1 - av)
        dist = dist * av
        d = 1
        while d < n_blk:
            mv = av * jnp.where((dist & d) != 0, 1, 0)
            take = _flat_roll_back(mv, d, S_rows, jnp.int32(0))
            cur = [jnp.where(take == 1, _roll_back_nf(c, d, S_rows), c)
                   for c in cur]
            dist = jnp.where(
                take == 1, _roll_back_nf(dist, d, S_rows), dist)
            av = jnp.where(take == 1, jnp.int32(1), av * (1 - mv))
            d *= 2

        # dense staging: shift by the carried residual count, splice the
        # residual row, keep the new partial last row in VMEM
        # (pallas_compact.dense_stage with all-sentinel fill)
        r = carry[4]
        total_el = r.astype(jnp.int32) + acount
        full_rows = total_el // _LANES
        new_r = total_el % _LANES
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        staged_all, res_all = [], []
        for w in range(Wc + 1):
            clean = jnp.where(av == 1, cur[w], SENT)
            res_w = residual[:, w * _LANES:(w + 1) * _LANES]
            staged = _shift_fwd_dyn(clean, r, S_rows, SENT, res_w)
            staged_all.append(staged)
            picked = _row_at_dyn(staged, full_rows, S_rows + 1, jnp.uint32)
            res_all.append(jnp.where(lane1 < new_r, picked, SENT))
        residual[...] = jnp.concatenate(res_all, axis=1)

        cursor = carry[3].astype(jnp.int32)
        # overflow clamp: blocks past capacity write into the tail pad
        # (the driver detects rows_used > cap and replays larger)
        cursor_eff = jnp.minimum(cursor, jnp.int32(cap_rows))
        for _ in range(P - (Wc + 1)):
            staged_all.append(jnp.full_like(staged_all[0], SENT))
        vout[...] = jnp.stack(staged_all, axis=1)
        out_dma = pltpu.make_async_copy(
            vout, out_ref.at[pl.ds(cursor_eff, S_rows + 1)], sem)
        out_dma.start()
        out_dma.wait()

        carry[3] = (cursor + full_rows).astype(jnp.uint32)
        carry[4] = new_r.astype(jnp.uint32)
        nd_ref[0] = nd_ref[0] + acount
        # rows_used counts the partial residual row only when non-empty
        nd_ref[1] = (cursor + full_rows + jnp.minimum(new_r, 1)) * _LANES

    return kernel


def pick_block_rows_dense(n: int, k: int) -> "int | None":
    """Largest supported dense-kernel block size (divides n, covers the
    lookahead) — no slot-budget alignment constraint.  Wide rows
    (P = pow2(Wc+1) > 8 interleave planes, k > ~110) cap at 128 rows so
    the staging buffer + double-buffered inputs stay inside the 16 MB
    scoped-VMEM budget (same constraint as pallas_compact)."""
    Wc = (LMAX + k - 1 + 15) // 16
    lookahead = max(k + M * (Wc - 1) + LMAX + 2, k + 17)
    top = 256 if _pow2(Wc + 1) <= 8 else 128
    for br in (256, 128, 64, 32, 16, 8, 4):
        if br > top:
            continue
        if n % (br * _LANES) == 0 and lookahead <= br * _LANES:
            return br
    return None


@partial(jax.jit, static_argnames=("k", "n", "cap", "block_rows",
                                   "interpret"))
def run_rows_dense_pallas(codes, *, k: int, n: int, cap: int,
                          block_rows: "int | None" = None,
                          interpret: bool = False):
    """codes (uint32 [>= n + lookahead], bit0-1 = 2-bit code, bit 2 =
    invalid) -> (dense run-row columns: Wc content + meta, each uint32
    (cap,), rows int32 (2,) = [rows_exact, rows_used]).

    The first ``rows_used`` elements are the live run rows in stream
    order (the final partial 128-lane row sentinel-padded); everything
    at or beyond rows_used is sentinel-masked.  rows_used > cap means
    the output overflowed the capacity: the columns are garbage and the
    caller must replay with a larger ``cap`` (same contract as store
    grow-and-replay).  Row multiset (at fitting cap) is bit-identical
    to the live rows of skm.run_rows + skm.pack_slots.
    """
    if k < M:
        raise ValueError("skm kernel requires k >= 16")
    if cap % _LANES:
        raise ValueError(f"cap={cap} must be a multiple of {_LANES}")
    Wc = (LMAX + k - 1 + 15) // 16
    if block_rows is None:
        block_rows = pick_block_rows_dense(n, k)
        if block_rows is None:
            raise ValueError(f"n={n} has no supported block size")
    blk = block_rows * _LANES
    if n % blk:
        raise ValueError(f"n={n} not a multiple of {blk}")
    H = _halo_rows(block_rows, k)
    lookahead = max(k + M * (Wc - 1) + LMAX + 2, k + 17)
    if lookahead > H * _LANES:
        raise ValueError(f"k={k} lookahead exceeds the halo")
    nb = n // blk
    need = (nb + 1) * blk
    pad = need - codes.shape[0]
    if pad < 0:
        codes = codes[:need]
    else:
        codes = jnp.concatenate([codes, jnp.full((pad,), jnp.uint32(4))])
    c2d = codes.reshape(-1, _LANES)

    cap_rows = cap // _LANES
    P = _pow2(Wc + 1)
    kernel = _skm_dense_kernel(k, block_rows, Wc, cap_rows)
    hstep = block_rows // H
    out, ndv = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows + block_rows + 1, P, _LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((H, _LANES), lambda i, _h=hstep: ((i + 1) * _h, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.SMEM((6,), jnp.uint32),
            pltpu.VMEM((block_rows + 1, P, _LANES), jnp.uint32),
            pltpu.VMEM((1, (Wc + 1) * _LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(c2d, c2d)
    # rows beyond the final cursor were never written (uninitialized):
    # sentinel-mask everything at or beyond rows_used (cf.
    # sortcount._pallas_finish)
    pos = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    junk = jax.lax.bitcast_convert_type((pos - ndv[1]) >> 31,
                                        jnp.uint32) ^ SENT
    cols = tuple(out[:cap_rows, w, :].reshape(-1) | junk
                 for w in range(Wc + 1))
    return cols, ndv
