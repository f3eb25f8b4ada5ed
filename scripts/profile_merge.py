"""On-chip A/B: linear-merge superstep vs sort superstep.

Measures, at bench shapes (k=51, 32M-window superbatch), the steady-state
device cost of one superstep under:
  - compactor="pallas"  (sort prefix+batch, Pallas compact)
  - compactor="xla"     (sort prefix+batch, XLA partition compact)
  - compactor="merge"   (sort batch only, Pallas merge-compact kernel)
for several live-prefix sizes, with forced-drain timing.

Run on the real chip:  python scripts/profile_merge.py [--n-log2 25]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=51)
    ap.add_argument("--n-log2", type=int, default=25,
                    help="windows per superstep (default 32M)")
    ap.add_argument("--prefix-log2", type=int, nargs="*",
                    default=[22, 23, 25, 27],
                    help="live-prefix sizes to sweep")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kaarme_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    from kaarme_tpu.ops import sortcount

    k, n = args.k, 1 << args.n_log2
    rows = 1 << (args.n_log2 // 2)
    eb = sortcount.embed_bits(k)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=n + k - 1).astype(np.uint8)
    packed, _ = sortcount.pack_stream_np(codes)
    sep = np.full(max(n // 128, 32), n + k - 1, np.uint32)
    packed_d = jax.device_put(jnp.asarray(packed))
    sep_d = jax.device_put(jnp.asarray(sep))

    def drain(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf[:1])

    for plog in args.prefix_log2:
        cap = 1 << plog
        # realistic prefix: distinct random keys, ~70% full
        W = sortcount.words_per_kmer(k)
        pref = sortcount.make_store(cap, W)
        fill = int(cap * 0.7)
        cols = []
        for w in range(W):
            col = np.full(cap, 0xFFFFFFFF, np.uint32)
            col[:fill] = rng.integers(0, 1 << 32, fill, dtype=np.uint64) \
                .astype(np.uint32)
            if w == W - 1 and eb:
                col[:fill] &= np.uint32(~((1 << eb) - 1) & 0xFFFFFFFF)
            cols.append(col)
        order = np.lexsort(tuple(cols[w][:fill] for w in range(W - 1, -1, -1)))
        for w in range(W):
            head = cols[w][:fill][order]
            cols[w][:fill] = head
        cnt = np.zeros(cap, np.int32)
        cnt[:fill] = 1
        pref = tuple(jnp.asarray(c) for c in cols) + (jnp.asarray(cnt),)

        for mode in ("merge", "pallas", "xla"):
            pl = {"pallas": "on", "xla": "off", "merge": "merge"}[mode]
            try:
                def step():
                    if pl == "merge":
                        return sortcount.superstep_merged(
                            packed_d, sep_d, pref, k=k, n=n, rows=rows,
                            ebits=eb, pallas="merge")
                    return sortcount.superstep_embedded(
                        packed_d, sep_d, pref, k=k, n=n, rows=rows,
                        ebits=eb, pallas=pl)

                out = step()          # compile
                drain(out)
                best = float("inf")
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    out = step()
                    drain(out)
                    best = min(best, time.perf_counter() - t0)
                nd = np.asarray(out[1])
                print(f"prefix=2^{plog} mode={mode:6s}: {best*1e3:8.1f} ms "
                      f"({n/best/1e6:6.1f}M windows/s) nd={int(nd[0])}",
                      flush=True)
            except Exception as e:
                print(f"prefix=2^{plog} mode={mode:6s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
