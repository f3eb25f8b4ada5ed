"""Phase-by-phase timing of the fused superstep at production scale
(32M windows, k=51) on the real chip: unpack, window extraction, merge
sort, partition — each as its own jit (one dispatch each), then the
fused superstep for comparison."""

import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
from kaarme_tpu.ops import sortcount


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1] if getattr(leaf, "ndim", 0) else leaf)


def timeit(f, *args, reps=2):
    out = f(*args); drain(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(*args); drain(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    k = 51
    n = 1 << 25
    rows = 1 << 12
    cap = 1 << 22
    eb = sortcount.embed_bits(k)
    W = sortcount.words_per_kmer(k)
    L = n + k - 1

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=L).astype(np.uint8)
    codes[::151] = 4
    packed, _ = sortcount.pack_stream_np(codes)
    seps = np.flatnonzero(codes >= 4).astype(np.uint32)
    budget = n // 32
    sep = np.full(budget, L, np.uint32)
    sep[: seps.shape[0]] = seps

    packed_d = jax.device_put(jnp.asarray(packed))
    sep_d = jax.device_put(jnp.asarray(sep))
    prefix = sortcount.make_store(cap, W)
    drain((packed_d, sep_d, prefix))

    # phase 1: unpack
    unpack = jax.jit(lambda p, s: sortcount.unpack_codes_sparse(p, s, L))
    t, codes_d = timeit(unpack, packed_d, sep_d)
    print(f"unpack_sparse {L>>20}M codes: {t*1e3:7.0f}ms")

    # phase 2: window extraction
    wk = jax.jit(lambda c: sortcount.window_keys_from_codes(c, k, n, rows))
    t, keys = timeit(wk, codes_d)
    print(f"window_keys {n>>20}M x {W}w: {t*1e3:7.0f}ms -> {n/t/1e6:.0f} M windows/s")

    # phase 3: merge sort (keys + prefix concat, 4 cols embedded)
    def merge_sort(prefix, keys):
        w = len(prefix) - 1
        cols = [jnp.concatenate([prefix[i], keys[i]]) for i in range(w - 1)]
        last = jnp.concatenate([
            prefix[w - 1] | prefix[-1].astype(jnp.uint32),
            keys[w - 1] | jnp.uint32(1)])
        s = jax.lax.sort(tuple(cols + [last]), num_keys=w)
        return s
    ms = jax.jit(merge_sort)
    t, sorted_cols = timeit(ms, prefix, keys)
    nrows = n + cap
    print(f"merge sort {nrows>>20}M x {W}c: {t*1e3:7.0f}ms -> {nrows/t/1e6:.0f} M rec/s")

    # phase 4: segment-sum + partition (rest of _compact_embedded)
    def seg_part(s):
        s = sortcount._B(s)
        s_keys = list(s[:-1])
        cmask = jnp.uint32((1 << eb) - 1)
        s_cnt = (s[-1] & cmask).astype(jnp.int32)
        s_last = s[-1] & ~cmask
        idx, first, last = sortcount._segment_marks(s_keys + [s_last])
        start = jax.lax.cummax(first * idx)
        start = sortcount._B(start)
        acc = s_last | cmask
        for x in s_keys:
            acc = acc & x
        alive = last * sortcount._nz(acc ^ sortcount.SENTINEL)
        seg = alive * sortcount._clamp_count(s_cnt + (idx - start))
        smask = jax.lax.bitcast_convert_type((seg - 1) >> 31, jnp.uint32)
        dead = (smask & jnp.uint32(1))
        out_cols = [x | smask for x in s_keys] + [
            (s_last | seg.astype(jnp.uint32)) | smask]
        s2 = jax.lax.sort((dead,) + tuple(out_cols), num_keys=1, is_stable=True)
        return s2
    sp = jax.jit(seg_part)
    t, _ = timeit(sp, sorted_cols)
    print(f"segsum+partition {nrows>>20}M: {t*1e3:7.0f}ms")

    # phase 2b: Pallas window kernel
    from kaarme_tpu.ops.pallas_winkeys import window_keys_pallas
    wkp = jax.jit(lambda c: window_keys_pallas(c, k=k, n=n))
    t, _ = timeit(wkp, codes_d)
    print(f"window_keys pallas: {t*1e3:7.0f}ms -> {n/t/1e6:.0f} M windows/s")

    # phase 2c: packed shift-or extraction (includes its own invalid
    # unpack — no code array at all, so compare against unpack + 2/2b)
    wkq = jax.jit(lambda p, s: sortcount.window_keys_packed(
        p, sortcount.invalid_from_sparse(s, L), k, n))
    t, _ = timeit(wkq, packed_d, sep_d)
    print(f"window_keys packed (incl unpack): {t*1e3:7.0f}ms -> "
          f"{n/t/1e6:.0f} M windows/s")

    # phase 4b: Pallas compact kernel (via _pallas_finish)
    pf = jax.jit(lambda s: sortcount._pallas_finish(s, cap, True, eb, False))
    t, _ = timeit(pf, sorted_cols)
    print(f"pallas compact: {t*1e3:7.0f}ms")

    # fused superstep: compaction x window-extraction matrix
    for pal in ("off", "on"):
        for wkmode in ("legacy", "packed"):
            f = partial(sortcount.superstep_embedded, k=k, n=n, rows=rows,
                        ebits=eb, pallas=pal, winkeys=wkmode)
            t, (_, nd) = timeit(f, packed_d, sep_d, prefix)
            nde = int(np.asarray(nd)[0])
            print(f"fused superstep[{pal:3s},{wkmode:6s}]: {t*1e3:7.0f}ms -> "
                  f"{n/t/1e6:.0f} M windows/s (nd={nde})")


if __name__ == "__main__":
    main()
