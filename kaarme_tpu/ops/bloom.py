"""Two-stage Bloom prefilter (device side, JAX/XLA).

TPU-native rebuild of the reference's ``DoubleAtomicDoubleBloomFilter``
(reference: include/double_bloomfilter.hpp:233-452): BF1 = "seen at
least once", BF2 = "seen at least twice"; pass 1 populates both, the
table is sized from the BF2 cardinality counter, then BF1 is dropped
("squeeze", reference: include/mybitarray.hpp:127-162) and pass 2 counts
only k-mers whose bits are all set in BF2.

Design differences, TPU-motivated:
- two separate uint32 word arrays instead of one interleaved even/odd bit
  array — gathers stay contiguous and the squeeze is just dropping BF1;
- bit positions come from double hashing of a 64-bit root hash
  (pos_j = r1 + j * (r2|1) mod 2^m) instead of per-seed XXH64 calls
  (reference: double_bloomfilter.hpp:276-281) — one multiply-add per
  probe on the VPU, same independence guarantees;
- atomic CAS bit-sets (reference: mybitarray.hpp:87-125) are replaced by
  a converging OR loop: gather word, OR my mask, scatter, re-gather,
  retry while my bits are missing (last-writer-wins scatters make this
  terminate: every round durably sets at least each contested word's
  winner);
- the sequential "first occurrence sets BF1, second sets BF2" semantics
  (reference: double_bloomfilter.hpp:371-413) is recovered batch-wise by
  sorting the batch's root hashes and ranking duplicates in-segment, so a
  doubleton entirely inside one batch still lands in BF2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def make_bloom(bits: int):
    """One stage's bit array as uint32 words; ``bits`` is a power of two."""
    assert bits % 32 == 0 and bits & (bits - 1) == 0
    return jnp.zeros((bits // 32,), jnp.uint32)


def _positions(r1, r2, j: int, nbits: int):
    stride = r2 | jnp.uint32(1)
    pos = (r1 + jnp.uint32(j) * stride) & jnp.uint32(nbits - 1)
    return (pos >> jnp.uint32(5)).astype(jnp.int32), jnp.uint32(1) << (pos & jnp.uint32(31))


def contains(bf, r1, r2, hfn: int):
    """True where all hfn bits are set. Shape follows r1."""
    nbits = bf.shape[0] * 32
    ok = jnp.ones(r1.shape, jnp.bool_)
    for j in range(hfn):
        widx, mask = _positions(r1, r2, j, nbits)
        ok = ok & ((bf[widx] & mask) == mask)
    return ok


def set_bits(bf, r1, r2, hfn: int, active, max_rounds: int | None = None):
    """Set all hfn bits for the active elements (converging OR loop).

    Runs to CONVERGENCE by default: every round at least one pending
    entry per contested word durably lands (scatter duplicate-index
    resolution is deterministic last-writer-wins, and that writer's
    ``cur | mask`` includes its own bits), so the loop terminates in at
    most max-distinct-keys-per-word rounds (~word occupancy, ≈20-60 at
    standard Bloom sizing).  A fixed small cap silently DROPS bits under
    contention — a Bloom false negative, i.e. a lost k-mer (regression
    test: tests/test_bloom.py::test_set_bits_converges_under_contention).
    """
    bound = (1 << 30) if max_rounds is None else max_rounds
    nbits = bf.shape[0] * 32
    nwords = bf.shape[0]
    widx_l, mask_l = [], []
    for j in range(hfn):
        w, m = _positions(r1, r2, j, nbits)
        widx_l.append(w)
        mask_l.append(m)
    widx = jnp.concatenate(widx_l)
    mask = jnp.concatenate(mask_l)
    act = jnp.concatenate([active] * hfn)

    def cond(state):
        r, pending, _ = state
        return jnp.logical_and(r < bound, jnp.any(pending))

    def body(state):
        r, pending, b = state
        cur = b[widx]
        upd = cur | mask
        b = b.at[jnp.where(pending, widx, nwords)].set(upd, mode="drop")
        cur2 = b[widx]
        pending = pending & ((cur2 & mask) != mask)
        return r + 1, pending, b

    state = (jnp.int32(0), act, bf)
    _, _, bf = jax.lax.while_loop(cond, body, state)
    return bf


@partial(jax.jit, static_argnames=("hfn",), donate_argnums=(0, 1))
def insert_batch(bf1, bf2, r1, r2, valid, hfn: int):
    """Pass-1 insertion of a batch of root hashes.

    Returns (bf1, bf2, new_in_first, new_in_second) — the counters mirror
    the reference's exactly-once accounting used for table sizing
    (reference: double_bloomfilter.hpp:264-274, main.cpp:454).
    """
    n = r1.shape[0]
    # sort so duplicate roots are adjacent; invalid entries go last.
    inval = (~valid).astype(jnp.int32)
    s_inval, sr1, sr2 = jax.lax.sort((inval, r1, r2), num_keys=3)
    sval = s_inval == 0

    idx = jnp.arange(n, dtype=jnp.int32)
    prev_r1 = jnp.concatenate([sr1[:1], sr1[:-1]])
    prev_r2 = jnp.concatenate([sr2[:1], sr2[:-1]])
    newseg = (idx == 0) | (sr1 != prev_r1) | (sr2 != prev_r2)
    seg_start = jax.lax.cummax(jnp.where(newseg, idx, jnp.int32(0)))
    ordinal = idx - seg_start

    first = sval & (ordinal == 0)
    in1 = contains(bf1, sr1, sr2, hfn)
    in2 = contains(bf2, sr1, sr2, hfn)

    set1 = first & ~in1
    # BF2 is reached when a prior pass saw the key once (first & in1) or
    # when the batch itself holds a second occurrence (ordinal == 1 of a
    # segment whose key was not yet in BF1).
    set2 = sval & ~in2 & ((first & in1) | ((ordinal == 1) & ~in1))

    new1 = jnp.sum(set1.astype(jnp.int32))
    new2 = jnp.sum(set2.astype(jnp.int32))
    bf1 = set_bits(bf1, sr1, sr2, hfn, set1)
    bf2 = set_bits(bf2, sr1, sr2, hfn, set2)
    return bf1, bf2, new1, new2
