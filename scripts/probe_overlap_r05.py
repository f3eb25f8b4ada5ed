"""Round-5 probes: (1) does a host->device copy overlap a running
device computation on this backend? (2) segpack sub-phase split
(unpack vs kernel), (3) merge at live-sized prefix, (4) finalize
sub-phases (expand / sort / segsum-compact).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")

from bench import make_reads
from kaarme_tpu.ops import skm, sortcount, pallas_skm


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1])


def t(f, *a, reps=3):
    out = f(*a)
    drain(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        drain(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


k = 51
n = 1 << 25
codes = make_reads(4.6, 30, 150)
need = n + k - 1
sl = codes[:need]
packed, _ = sortcount.pack_stream_np(sl)
seps = np.flatnonzero(sl >= 4).astype(np.uint32)
budget = max(n // 128, 32)
sep = np.full(budget, need, np.uint32)
sep[: seps.shape[0]] = seps

packed_d = jax.device_put(jnp.asarray(packed))
sep_d = jax.device_put(jnp.asarray(sep))
drain((packed_d, sep_d))

# ---- probe 1: transfer/compute overlap ----
# compute: a sort that takes ~300 ms; copy: ~9.4 MB (~230 ms serial)
big = jax.device_put(jnp.asarray(
    np.random.randint(0, 2**31, size=(6, 1 << 24), dtype=np.int64)
    .astype(np.uint32)))
drain(big)


@jax.jit
def heavy(cols):
    s = jax.lax.sort(tuple(cols), num_keys=4)
    return s[0]


drain(heavy(big))
tc, _ = t(heavy, big)
host_arr = np.ascontiguousarray(np.concatenate([packed, packed[: 1 << 20]]))
t0 = time.perf_counter()
hd = jax.device_put(jnp.asarray(host_arr))
drain(hd)
tt = time.perf_counter() - t0
print(f"overlap probe: compute {tc*1e3:.0f}ms copy {tt*1e3:.0f}ms")
# serial reference then interleaved
t0 = time.perf_counter()
out = heavy(big)
hd2 = jax.device_put(jnp.asarray(host_arr))
drain(out)
drain(hd2)
both = time.perf_counter() - t0
print(f"  dispatch-then-copy wall {both*1e3:.0f}ms "
      f"(serial would be {(tc+tt)*1e3:.0f}ms, full overlap "
      f"{max(tc,tt)*1e3:.0f}ms)")

# ---- probe 2: segpack sub-phases ----
L = n + k - 1


@jax.jit
def unpack_only(p, s):
    return sortcount.unpack_codes_sparse(p, s, L)


tu, codes_d = t(unpack_only, packed_d, sep_d)
print(f"unpack_codes_sparse: {tu*1e3:.0f}ms")


@jax.jit
def kernel_only(c):
    return pallas_skm.run_rows_slotted_pallas(c, k=k, n=n, S=96)


tk, (slotted, maxruns) = t(kernel_only, codes_d)
print(f"segpack kernel only: {tk*1e3:.0f}ms")

# ---- probe 3: merge at live-sized prefix ----
for cap_log in (21, 22):
    cap = sortcount.next_store_size((1 << cap_log) + 1)
    prefix = sortcount.make_store(cap, skm.store_words(k))
    drain(prefix)
    tm, (np_, ndv) = t(lambda s_, m_, p_: skm.skm_merge_step(
        s_, m_, p_, pallas="on"), slotted, maxruns, prefix)
    print(f"merge at prefix cap {cap}: {tm*1e3:.0f}ms "
          f"rows={cap + slotted[0].shape[0]}")

# ---- probe 4: finalize sub-phases on a realistic run store ----
# build the full-stream store quickly (4 supersteps)
cap = sortcount.next_store_size(1 << 22)
prefix = sortcount.make_store(cap, skm.store_words(k))
lo = 0
while lo + n <= codes.shape[0] - (k - 1):
    slc = codes[lo: lo + need]
    p_, _ = sortcount.pack_stream_np(slc)
    sps = np.flatnonzero(slc >= 4).astype(np.uint32)
    sp = np.full(budget, need, np.uint32)
    sp[: sps.shape[0]] = sps
    sl_d, mx = skm.skm_segpack_step(
        jax.device_put(jnp.asarray(p_)), jax.device_put(jnp.asarray(sp)),
        0, 0, k=k, n=n, S=96, dense=False)
    prefix, ndv = skm.skm_merge_step(sl_d, mx, prefix, pallas="on")
    lo += n
nd_used = int(np.asarray(ndv)[1])
m = min(sortcount.next_store_size(nd_used), prefix[0].shape[0])
run_cols = tuple(c[:m] for c in prefix)
print(f"run store: nd_used={nd_used} m={m}")


@jax.jit
def expand_only(rc):
    return skm.expand_chunk(rc, k=k)


te, rows = t(expand_only, run_cols)
print(f"finalize expand_chunk ({m} runs -> {rows[0].shape[0]} rows): "
      f"{te*1e3:.0f}ms")
live = int(jnp.sum(jnp.minimum(rows[-1], 1)))
print(f"  live expanded rows: {live} ({live/rows[0].shape[0]:.1%})")


@jax.jit
def sort_exp(rows):
    *keys, cnt = rows
    return jax.lax.sort(tuple(keys) + (cnt,), num_keys=len(keys) + 1)


ts, _ = t(sort_exp, rows)
print(f"finalize sort ({rows[0].shape[0]} rows x {len(rows)} cols): "
      f"{ts*1e3:.0f}ms")


@jax.jit
def compact_clamped(rows):
    return sortcount.compact(rows, clamped=True)


tc2, _ = t(compact_clamped, rows)
print(f"finalize sort+compact(clamped): {tc2*1e3:.0f}ms "
      f"(scan+partition = {1e3*(tc2-ts):.0f}ms)")
