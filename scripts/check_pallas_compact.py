"""On-chip verification + timing of ops/pallas_compact.segsum_compact
against the XLA _compact_embedded formulation.

Usage: python scripts/check_pallas_compact.py [small|big]
"""

import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from kaarme_tpu.ops import sortcount
from kaarme_tpu.ops import pallas_compact as pc


def make_sorted_embedded(n_real, n_total, W, ebits, seed=0, max_c=1000):
    """Sorted store columns with embedded counts: segments with one
    non-unit row (count c, sorts last in segment) + unit rows."""
    rng = np.random.default_rng(seed)
    n_keys = max(1, n_real // 3)
    keys = rng.integers(0, 1 << 32, size=(n_keys, W), dtype=np.uint64).astype(np.uint32)
    keys[:, W - 1] &= np.uint32(~((1 << ebits) - 1) & 0xFFFFFFFF)
    # avoid accidental all-ones rows
    keys[:, 0] &= 0x7FFFFFFF
    picks = rng.integers(0, n_keys, size=n_real)
    rows = keys[picks]
    cnts = np.ones(n_real, np.uint32)
    # one non-unit count per key for a random subset of keys
    specials = rng.integers(0, n_keys, size=n_keys // 2)
    first_occurrence = {}
    for i, p in enumerate(picks):
        if p not in first_occurrence:
            first_occurrence[p] = i
    for s in set(specials.tolist()):
        if s in first_occurrence:
            cnts[first_occurrence[s]] = rng.integers(2, max_c)
    # expected totals
    exp = {}
    for p, c in zip(picks, cnts):
        exp[p] = exp.get(p, 0) + int(c)
    cols = [rows[:, w].copy() for w in range(W)]
    cols[W - 1] = cols[W - 1] | cnts
    # pad with sentinels
    pad = n_total - n_real
    full = [np.concatenate([c, np.full(pad, 0xFFFFFFFF, np.uint32)])
            for c in cols]
    order = np.lexsort(tuple(full[w] for w in range(W - 1, -1, -1)))
    full = [c[order] for c in full]
    exp_rows = sorted(
        (tuple(int(keys[p, w]) for w in range(W)), tot) for p, tot in exp.items()
    )
    return [jnp.asarray(c) for c in full], exp_rows


def drain(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf)).ravel()[:1]


def check(n_real, n_total, W=4, ebits=26, S=256, seed=0):
    cols, exp_rows = make_sorted_embedded(n_real, n_total, W, ebits, seed)
    okeys, ocnt, nd, ndu = pc.segsum_compact(
        tuple(cols), embedded=True, ebits=ebits, block_rows=S)
    nd, ndu = int(nd), int(ndu)
    ks = np.stack([np.asarray(k)[:ndu] for k in okeys], 1)
    cs = np.asarray(ocnt)[:ndu].astype(np.int64)
    live = cs > 0
    got_rows = [
        (tuple(int(x) for x in ks[i]), int(cs[i]))
        for i in np.nonzero(live)[0]
    ]
    ok = (nd == len(exp_rows)) and got_rows == exp_rows
    # check sortedness of live rows
    print(f"n_real={n_real} -> nd={nd} (expect {len(exp_rows)}) ndu={ndu} "
          f"{'OK' if ok else 'MISMATCH'}")
    if not ok:
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if g != e:
                print("  first diff at", i, g, e)
                break
        if len(got_rows) != len(exp_rows):
            print("  len", len(got_rows), len(exp_rows))
    return ok


def bench():
    W, ebits, S = 4, 26, 256
    N = 36 * (1 << 20)
    rng = np.random.default_rng(0)
    # ~8x duplication like the production merge
    n_keys = N // 8
    base = rng.integers(0, 1 << 31, size=(n_keys, W), dtype=np.uint64).astype(np.uint32)
    base[:, W - 1] &= np.uint32(~((1 << ebits) - 1) & 0xFFFFFFFF)
    picks = rng.integers(0, n_keys, size=N)
    rows = base[picks]
    cols = [rows[:, w] for w in range(W)]
    cols[W - 1] = cols[W - 1] | 1
    order = np.lexsort(tuple(cols[w] for w in range(W - 1, -1, -1)))
    cols = [jnp.asarray(c[order]) for c in cols]
    drain(cols)

    f = lambda c: pc.segsum_compact(c, embedded=True, ebits=ebits, block_rows=S)
    out = f(tuple(cols)); drain(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); out = f(tuple(cols)); drain(out)
        best = min(best, time.perf_counter() - t0)
    print(f"pallas segsum_compact 36M x {W}c: {best*1e3:.0f}ms "
          f"(nd={int(out[2])}, ndu={int(out[3])})")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    if mode == "small":
        ok = True
        ok &= check(1000, 128 * 256)          # one block
        ok &= check(100000, 128 * 256 * 4)    # multi-block + carry
        ok &= check(0, 128 * 256)             # empty
        ok &= check(200000, 128 * 256 * 8, seed=3)
        print("ALL OK" if ok else "FAILURES")
    else:
        bench()
