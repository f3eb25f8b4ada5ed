"""Compiled-path triage for the round-2 Pallas kernels (run on chip).

Small shapes, one case per kernel feature, each compared bit-for-bit
against interpreter mode — run this FIRST when the TPU is reachable to
find any Mosaic lowering problem in minutes:

    python scripts/probe_merge_compile.py
"""

import sys
import traceback

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from kaarme_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    from kaarme_tpu.ops import pallas_compact as pc
    from kaarme_tpu.ops import pallas_merge as pm
    from kaarme_tpu.ops import sortcount

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    SENT = 0xFFFFFFFF

    def check(name, fn):
        try:
            got, exp = fn(False), fn(True)
            ok = all(
                (np.asarray(a) == np.asarray(b)).all()
                for a, b in zip(jax.tree_util.tree_leaves(got),
                                jax.tree_util.tree_leaves(exp))
            )
            print(f"{name}: {'PASS' if ok else 'MISMATCH'}", flush=True)
            return ok
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
            traceback.print_exc(limit=3)
            return False

    S = 8
    N = pc.block_elems(S) * 2
    eb = 22
    keys = np.sort(rng.integers(0, 700, N - 300).astype(np.uint64))
    rows = np.concatenate([
        (keys << np.uint64(eb) | np.uint64(1)).astype(np.uint32),
        np.full(300, SENT, np.uint32)])

    def case_dense_compact(interp):
        ok, oc, nd, ndu = pc.segsum_compact(
            (jnp.asarray(rows),), embedded=True, ebits=eb, block_rows=S,
            interpret=interp, dense=True)
        ndu_i = int(ndu)
        return (np.asarray(ok[0][:ndu_i]), np.asarray(oc[:ndu_i]),
                int(nd), ndu_i)

    akeys = np.unique(rng.integers(0, 900, 300).astype(np.uint64))
    acnt = rng.integers(1, 1000, akeys.shape[0]).astype(np.uint64)
    Na = ((akeys.shape[0] + 127) // 128) * 128
    a0 = np.concatenate([
        (akeys << np.uint64(eb) | acnt).astype(np.uint32),
        np.full(Na - akeys.shape[0], SENT, np.uint32)])
    bkeys = np.sort(rng.integers(0, 900, 2000).astype(np.uint64))
    Nb = ((2000 + 127) // 128) * 128
    b0 = np.concatenate([
        np.full(Nb - 2000, SENT, np.uint32),
        (bkeys << np.uint64(eb) | np.uint64(1)).astype(np.uint32)[::-1]])

    def case_merge(interp):
        ok, oc, nd, ndu = pm.merge_compact_dense(
            (jnp.asarray(a0),), (jnp.asarray(b0),),
            embedded=True, ebits=eb, block_rows=S, interpret=interp)
        ndu_i = int(ndu)
        return (np.asarray(ok[0][:ndu_i]), np.asarray(oc[:ndu_i]),
                int(nd), ndu_i)

    def make_superstep_case(k):
        # k=31 -> W=2, separate-count (ebits 2 < 21); k=51 -> W=4,
        # embedded — together they cover odd AND even interleaved plane
        # counts (W+1 = 3 and 5), the exact family the lane-major 2D
        # layout fix exists for
        n, rws = 1 << 12, 1 << 5
        ebk = sortcount.embed_bits(k)
        codes = rng.integers(0, 5, size=n + k - 1).astype(np.uint8)
        packed, _ = sortcount.pack_stream_np(codes)
        seps = np.flatnonzero(codes >= 4).astype(np.uint32)
        sep = np.full(max(n // 32, seps.shape[0]), n + k - 1, np.uint32)
        sep[: seps.shape[0]] = seps
        prefix = sortcount.make_store(1 << 13, sortcount.words_per_kmer(k))

        def case(interp):
            out, nd = sortcount.superstep_merged(
                jnp.asarray(packed), jnp.asarray(sep), prefix,
                k=k, n=n, rows=rws, ebits=ebk,
                pallas="merge_interpret" if interp else "merge")
            ndi = int(nd[0])
            return tuple(np.asarray(c[:ndi]) for c in out) + (ndi,)

        return case

    ok = True
    ok &= check("dense segsum_compact (compiled vs interpret)",
                case_dense_compact)
    ok &= check("merge_compact_dense (compiled vs interpret)", case_merge)
    ok &= check("superstep_merged k=31 W=2 (compiled vs interpret)",
                make_superstep_case(31))
    ok &= check("superstep_merged k=51 W=4 (compiled vs interpret)",
                make_superstep_case(51))
    print("ALL PASS" if ok else "FAILURES PRESENT", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
