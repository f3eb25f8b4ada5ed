"""On-chip phase budget of the skm pipeline at the BENCH workload —
the round-5 attribution artifact (SKMPROFILE_r05.json).

The round-4 verdict's gap statement: the segmentation kernel proves
526M windows/s, the pipeline delivers ~26-33M e2e — this script
attributes every millisecond in between, per superstep and per phase,
on the real chip, with the bench workload (4.6 MB genome, 30x
coverage, k=51, 92M windows) and the bench configuration
(superstep n = 2^25 windows, S = skm slot budget).

Phases measured (each drained with a real data fetch — on this
backend block_until_ready returns early):
  transfer     host->device copy of one packed superstep
  segpack      fused Pallas segmentation + slot-pack kernel
  merge        6-col sort + Pallas segsum/compact of prefix+slotted
    sort_only  the lax.sort alone at the same shapes (sub-phase)
  dispatch     fixed per-dispatch overhead (trivial jitted op)
  finalize     run-store expansion into the k-mer store (once per job)
plus the occupancy facts the dense-output decision needs: live
(non-sentinel) slotted rows vs the S-budget row mass, per superstep.

    python scripts/skm_phase_budget.py [--out SKMPROFILE_r05.json]
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")

from bench import make_reads
from kaarme_tpu.ops import skm, sortcount


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1])


def timed(f, *args, reps=3):
    """Warm-timed: returns (best_seconds, result). Caller must have
    compiled f at these shapes already (first call excluded)."""
    out = f(*args)
    drain(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        drain(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=51)
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--n-log2", type=int, default=25,
                    help="windows per superstep (bench: 2^23 batch x 4)")
    ap.add_argument("--slots", type=int, default=96)
    ap.add_argument("--prefix-log2", type=int, default=23)
    ap.add_argument("--out", default="SKMPROFILE_r05.json")
    args = ap.parse_args()
    k, S = args.k, args.slots
    n = 1 << args.n_log2

    dev = jax.devices()[0]
    out = {"device": str(dev), "k": k, "n_per_superstep": n, "S": S,
           "workload": f"{args.genome_mb}MB x{args.coverage} "
                       f"rl{args.read_len}"}

    codes = make_reads(args.genome_mb, args.coverage, args.read_len)
    n_reads = codes.shape[0] // (args.read_len + 1)
    n_windows = n_reads * (args.read_len - k + 1)
    out["windows_total"] = int(n_windows)

    # host-side superstep packing, mirroring SortKmerCounter._prepare
    def prepare(lo):
        need = n + k - 1
        sl = codes[lo: lo + need]
        if sl.shape[0] < need:
            sl = np.concatenate(
                [sl, np.full(need - sl.shape[0], 4, np.uint8)])
        packed, _ = sortcount.pack_stream_np(sl)
        seps = np.flatnonzero(sl >= 4).astype(np.uint32)
        budget = max(n // 128, 32)
        assert seps.shape[0] <= budget, "bench reads use sparse seps"
        sep = np.full(budget, need, np.uint32)
        sep[: seps.shape[0]] = seps
        return packed, sep

    # full supersteps only (the bench tail rides a smaller program; its
    # cost is proportional and the attribution question is steady-state)
    steps = []
    lo = 0
    total = codes.shape[0] - (k - 1)
    while lo + n <= total:
        steps.append(prepare(lo))
        lo += n
    out["supersteps"] = len(steps)
    out["windows_profiled"] = len(steps) * n

    # fixed dispatch overhead: trivial jitted op, warm
    @jax.jit
    def tiny(x):
        return x + 1

    x = jax.device_put(jnp.zeros((8,), jnp.int32))
    drain(tiny(x))
    t_disp, _ = timed(tiny, x, reps=5)
    out["dispatch_fixed_ms"] = round(t_disp * 1e3, 2)

    prefix = sortcount.make_store(
        sortcount.next_store_size(1 << args.prefix_log2),
        skm.store_words(k))
    drain(prefix)

    # sub-phase: the XLA unpack inside the segpack dispatch
    need0 = n + k - 1
    p0 = jax.device_put(jnp.asarray(steps[0][0]))
    s0 = jax.device_put(jnp.asarray(steps[0][1]))
    drain((p0, s0))

    @jax.jit
    def unpack_only(p, s):
        return sortcount.unpack_codes_sparse(p, s, need0)

    drain(unpack_only(p0, s0))
    tu, _ = timed(unpack_only, p0, s0)
    out["unpack_ms"] = round(tu * 1e3, 1)

    per_step = []
    t_transfer = t_segpack = t_merge = 0.0
    slotted_last = None
    cap = sortcount.next_store_size(max(n // 8, 1 << 12))
    out["dense_cap"] = cap
    rows_hw = 0
    for i, (packed_h, sep_h) in enumerate(steps):
        t0 = time.perf_counter()
        packed_d = jax.device_put(jnp.asarray(packed_h))
        sep_d = jax.device_put(jnp.asarray(sep_h))
        drain((packed_d, sep_d))
        tt = time.perf_counter() - t0

        seg = lambda p, s: skm.skm_segpack_dense_step(
            p, s, 0, 0, k=k, n=n, cap=cap, dense=False)
        ts, (slotted, rowsv) = timed(seg, packed_d, sep_d)
        eff = cap if not rows_hw else min(cap, sortcount.next_store_size(
            rows_hw + max(rows_hw // 4, 1 << 12)))

        mrg = lambda sl, rw, pf: skm.skm_merge_dense_step(
            sl, rw, pf, eff=eff, pallas="on")
        tm, (new_prefix, ndv) = timed(mrg, slotted, rowsv, prefix)
        # accept the timed run's output as the real state transition
        prefix = new_prefix
        nd_exact, nd_used, r_exact, r_used = (
            int(v) for v in np.asarray(ndv))
        rows_hw = max(rows_hw, r_exact)
        slotted_last = (slotted, rowsv)

        t_transfer += tt
        t_segpack += ts
        t_merge += tm
        per_step.append({
            "transfer_ms": round(tt * 1e3, 1),
            "segpack_ms": round(ts * 1e3, 1),
            "merge_ms": round(tm * 1e3, 1),
            "merge_eff_rows": eff,
            "live_rows": r_exact,
            "live_frac_of_cap": round(r_exact / cap, 4),
            "nd_runs": nd_exact, "nd_used": nd_used,
        })
        print(f"# step {i}: transfer {tt*1e3:.0f}ms segpack {ts*1e3:.0f}ms "
              f"merge {tm*1e3:.0f}ms live {r_exact}/{cap} eff {eff} "
              f"runs={nd_exact}", file=sys.stderr, flush=True)
    out["per_step"] = per_step

    # sub-phase: the merge's sort alone at the last superstep's shapes
    slotted, _rowsv = slotted_last
    eff = per_step[-1]["merge_eff_rows"]
    slotted = tuple(c[:eff] for c in slotted)
    w = skm.store_words(k)
    merge_cols = [jnp.concatenate([prefix[i2], slotted[i2]])
                  for i2 in range(w - 1)]
    merge_cols.append(jnp.concatenate(
        [prefix[w - 1] | prefix[-1].astype(jnp.uint32), slotted[w - 1]]))

    @jax.jit
    def sort_only(cols):
        return jax.lax.sort(tuple(cols), num_keys=w)

    drain(sort_only(merge_cols))
    t_sort, _ = timed(sort_only, merge_cols)
    out["merge_sort_only_ms"] = round(t_sort * 1e3, 1)
    out["merge_rows"] = int(merge_cols[0].shape[0])

    # finalize on the final store (production path: finalize_store)
    nd_used = per_step[-1]["nd_used"]
    m = min(sortcount.next_store_size(nd_used), prefix[0].shape[0])
    run_cols = tuple(c[:m] for c in prefix)
    t0 = time.perf_counter()
    store, nd_k = skm.finalize_store(run_cols, k)
    drain(store)
    t_fin_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    store, nd_k = skm.finalize_store(run_cols, k)
    drain(store)
    t_fin = time.perf_counter() - t0
    out["finalize_ms"] = round(t_fin * 1e3, 1)
    out["finalize_first_ms"] = round(t_fin_first * 1e3, 1)
    out["finalize_rows_in"] = int(m)
    cnt = np.asarray(store[-1][:nd_k])
    out["distinct_kmers"] = int((cnt > 0).sum())

    # roll-up: per-phase share of a hypothetical serial wall
    n_steps = len(steps)
    n_prof = n_steps * n
    wall = t_transfer + t_segpack + t_merge + t_fin \
        + 2 * n_steps * t_disp
    out["kernel_attribution_note"] = (
        "probe (scripts/probe_overlap_r05.py session): segmentation "
        "front half 26 ms, log-shift dense pack ~129 ms, staging+DMA "
        "~21 ms per 2^25-position superstep; the pack is the kernel's "
        "dominant cost")
    out["rollup"] = {
        "transfer_s": round(t_transfer, 3),
        "segpack_s": round(t_segpack, 3),
        "merge_s": round(t_merge, 3),
        "dispatch_s": round(2 * n_steps * t_disp, 3),
        "finalize_s": round(t_fin, 3),
        "serial_wall_s": round(wall, 3),
        "serial_kmers_per_s": round(n_prof / wall),
        "device_only_s": round(t_segpack + t_merge + t_fin, 3),
        "device_only_kmers_per_s": round(
            n_prof / (t_segpack + t_merge + t_fin)),
    }
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
