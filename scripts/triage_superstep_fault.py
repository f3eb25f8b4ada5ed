"""Isolate the compiled-path fault in superstep_merged (on-chip triage).

Each case runs in sequence; the first crash kills the TPU worker for
this process, so run once per suspect if needed:

    python scripts/triage_superstep_fault.py [case ...]

Cases: merge256  — merge_compact_dense alone at block_rows=256
       winkeys   — window_keys_pallas alone (block_rows=32, compiled)
       ss_codes  — superstep_merged with XLA windows (winkeys="codes")
       ss_packed — superstep_merged with packed windows
       ss        — superstep_merged default (legacy -> pallas winkeys)
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from kaarme_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    from kaarme_tpu.ops import pallas_merge as pm
    from kaarme_tpu.ops import sortcount

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    SENT = 0xFFFFFFFF
    eb = 22

    def case_merge256():
        # keys must fit the 32 - eb key bits of a single-word embedded
        # row: with eb = 22 that is 10 bits (an unbounded 90000 range
        # overflowed the shift, aliasing keys and violating the
        # sorted-input precondition — round-2 ADVICE item)
        akeys = np.unique(rng.integers(0, 1 << (32 - eb), 30000)
                          .astype(np.uint64))
        acnt = rng.integers(1, 1000, akeys.shape[0]).astype(np.uint64)
        Na = ((akeys.shape[0] + 127) // 128) * 128
        a0 = np.concatenate([
            (akeys << np.uint64(eb) | acnt).astype(np.uint32),
            np.full(Na - akeys.shape[0], SENT, np.uint32)])
        nb = 200000
        bkeys = np.sort(rng.integers(0, 1 << (32 - eb), nb).astype(np.uint64))
        Nb = ((nb + 127) // 128) * 128
        b0 = np.concatenate([
            np.full(Nb - nb, SENT, np.uint32),
            (bkeys << np.uint64(eb) | np.uint64(1)).astype(np.uint32)[::-1]])
        got = pm.merge_compact_dense(
            (jnp.asarray(a0),), (jnp.asarray(b0),),
            embedded=True, ebits=eb, block_rows=256, interpret=False)
        ndu = int(got[3])
        exp = pm.merge_compact_dense(
            (jnp.asarray(a0),), (jnp.asarray(b0),),
            embedded=True, ebits=eb, block_rows=256, interpret=True)
        ok = (np.asarray(got[0][0][:ndu]) == np.asarray(exp[0][0][:ndu])).all() \
            and int(got[2]) == int(exp[2])
        return ok

    k, n, rws = 31, 1 << 12, 1 << 5
    ebk = sortcount.embed_bits(k)
    codes = rng.integers(0, 5, size=n + k - 1).astype(np.uint8)
    packed, _ = sortcount.pack_stream_np(codes)
    seps = np.flatnonzero(codes >= 4).astype(np.uint32)
    sep = np.full(max(n // 32, seps.shape[0]), n + k - 1, np.uint32)
    sep[: seps.shape[0]] = seps
    prefix = sortcount.make_store(1 << 13, sortcount.words_per_kmer(k))

    def case_winkeys():
        from kaarme_tpu.ops.pallas_winkeys import window_keys_pallas
        cd = sortcount.unpack_codes_sparse(
            jnp.asarray(packed), jnp.asarray(sep), n + k - 1)
        got = window_keys_pallas(cd, k=k, n=n, block_rows=32, interpret=False)
        exp = sortcount.window_keys_from_codes(cd, k, n, rws)
        return all((np.asarray(a) == np.asarray(b)).all()
                   for a, b in zip(got, exp))

    def ss(wk):
        out, nd = sortcount.superstep_merged(
            jnp.asarray(packed), jnp.asarray(sep), prefix,
            k=k, n=n, rows=rws, ebits=ebk, pallas="merge", winkeys=wk)
        ndi = int(nd[0])
        out_i, nd_i = sortcount.superstep_merged(
            jnp.asarray(packed), jnp.asarray(sep), prefix,
            k=k, n=n, rows=rws, ebits=ebk, pallas="merge_interpret",
            winkeys=wk)
        return ndi == int(nd_i[0]) and all(
            (np.asarray(a[:ndi]) == np.asarray(b[:ndi])).all()
            for a, b in zip(out, out_i))

    def case_merge1blk():
        # exact superstep shapes: all-sentinel 8192-row prefix, 4096-row
        # batch, block_rows=256 -> nblocks=1
        a0 = np.full(8192, SENT, np.uint32)
        nb = 4096
        bkeys = np.sort(rng.integers(0, 1 << (32 - eb), nb).astype(np.uint64))
        b0 = (bkeys << np.uint64(eb) | np.uint64(1)).astype(np.uint32)[::-1]
        got = pm.merge_compact_dense(
            (jnp.asarray(a0),), (jnp.asarray(b0),),
            embedded=True, ebits=eb, block_rows=256, interpret=False)
        ndu = int(got[3])
        exp = pm.merge_compact_dense(
            (jnp.asarray(a0),), (jnp.asarray(b0),),
            embedded=True, ebits=eb, block_rows=256, interpret=True)
        return (np.asarray(got[0][0][:ndu]) == np.asarray(exp[0][0][:ndu])).all() \
            and int(got[2]) == int(exp[2])

    def _sortmerge_fn(interpret):
        import functools

        @functools.partial(jax.jit, static_argnames=("interp",))
        def f(a0, braw, *, interp):
            inv = (~braw,)
            s = jax.lax.sort(inv, num_keys=1)
            s = jax.lax.optimization_barrier(s)
            b_desc = tuple(~x for x in s)
            return pm.merge_compact_dense(
                (a0,), b_desc, embedded=True, ebits=eb,
                block_rows=256, interpret=interp)
        return f

    def case_sortmerge():
        # XLA sort + merge kernel fused in ONE jit (the superstep shape)
        a0 = jnp.full((8192,), SENT, jnp.uint32)
        braw = jnp.asarray(
            (rng.integers(0, 90000, 4096).astype(np.uint64) << np.uint64(eb)
             | np.uint64(1)).astype(np.uint32))
        f = _sortmerge_fn(False)
        got = f(a0, braw, interp=False)
        ndu = int(got[3])
        exp = f(a0, braw, interp=True)
        return (np.asarray(got[0][0][:ndu]) == np.asarray(exp[0][0][:ndu])).all() \
            and int(got[2]) == int(exp[2])

    def case_mergeW2(S=256):
        # W=2 key words (k=31), nblocks=1 — standalone
        a0 = np.full(8192, SENT, np.uint32)
        nb = 4096
        hi = np.sort(rng.integers(0, 90000, nb).astype(np.uint64))
        b_hi = (hi >> np.uint64(10)).astype(np.uint32)[::-1]
        b_lo = (((hi & np.uint64(1023)) << np.uint64(eb))
                | np.uint64(1)).astype(np.uint32)[::-1]
        args = ((jnp.asarray(a0), jnp.asarray(a0)),
                (jnp.asarray(b_hi), jnp.asarray(b_lo)))
        got = pm.merge_compact_dense(
            *args, embedded=True, ebits=eb, block_rows=S, interpret=False)
        ndu = int(got[3])
        exp = pm.merge_compact_dense(
            *args, embedded=True, ebits=eb, block_rows=S, interpret=True)
        return all((np.asarray(g[:ndu]) == np.asarray(e[:ndu])).all()
                   for g, e in zip(got[0], exp[0])) \
            and int(got[2]) == int(exp[2])

    cases = {
        "merge256": case_merge256,
        "merge1blk": case_merge1blk,
        "sortmerge": case_sortmerge,
        "mergeW2": case_mergeW2,
        "mergeW2_s8": lambda: case_mergeW2(8),
        "mergeW2_s64": lambda: case_mergeW2(64),
        "mergeW2_s128": lambda: case_mergeW2(128),
        "winkeys": case_winkeys,
        "ss_codes": lambda: ss("codes"),
        "ss_packed": lambda: ss("packed"),
        "ss": lambda: ss("legacy"),
    }
    want = sys.argv[1:] or list(cases)
    for name in want:
        try:
            ok = cases[name]()
            print(f"{name}: {'PASS' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
