"""End-to-end canonical k-mer counting pipelines.

The "model" of this framework: a streaming counter that consumes encoded
code chunks (host), tiles them with a k-1 halo, and accumulates counts in
an HBM open-addressing table via the batched insert kernel.

Replaces the reference's parser functors (reference:
include/parallel_parser.hpp: parse_input_atomic_flag /
parse_input_pointer_atomic_variable et al.): instead of N CPU threads
CAS-ing into a shared table, one device consumes fixed-shape batches.

Mode semantics (output-time only — the counting math is identical):
- mode 2 ("kaarme"): counts saturate at 16383, replicating the 14-bit
  slot count field (reference: source/kmer.cpp:699-713);
- mode 0 ("plain"): counts wrap mod 2^16, replicating the uint16 count
  array (reference: source/kmer_hash_table.cpp:2001).

Unlike the reference, a full table grows and retries instead of
``exit(1)`` (reference: source/kmer_hash_table.cpp:2553-2556).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..io import reader as io_reader
from ..ops import table as table_ops
from ..ops.hashing import hash_words
from ..utils import codec
from ..utils.mathutils import capacity_log2
from .tiling import TileBatcher


@dataclasses.dataclass
class CounterConfig:
    k: int
    min_slots: int = 1 << 22
    mode: int = 2              # 0 = plain, 2 = kaarme (output clipping)
    min_abundance: int = 2
    tile: int = 1 << 14        # window positions per tile row
    batch_tiles: int = 64      # tile rows per device step
    max_probes: int = 64
    max_grows: int = 8

    @property
    def words(self) -> int:
        return codec.words_per_kmer(self.k)

    @property
    def cap_log2(self) -> int:
        return capacity_log2(self.min_slots)


class KmerCounter:
    """Streaming canonical k-mer counter on one device (or data-parallel
    shards via parallel/sharded.py)."""

    def __init__(self, config: CounterConfig):
        if config.k < 2:
            raise ValueError("k must be >= 2")
        if config.mode not in (0, 1, 2):
            raise ValueError("mode must be 0, 1 or 2")
        self.cfg = config
        self.cap_log2 = config.cap_log2
        self.tkeys, self.counts = table_ops.make_table(self.cap_log2, config.words)
        self._batcher = TileBatcher(config.k, config.tile, config.batch_tiles)
        # stats (the reference prints occupancy / written / skipped —
        # include/parallel_parser.hpp:1551-1562)
        self.stats = {
            "windows_processed": 0,
            "batches": 0,
            "grow_events": 0,
            "build_seconds": 0.0,
            "write_seconds": 0.0,
        }

    # -- streaming ---------------------------------------------------------

    def add_codes(self, codes: np.ndarray):
        """Append encoded codes; flush full batches to the device."""
        for tiles in self._batcher.add(codes):
            self._flush(tiles)

    def finish(self):
        """Process the remaining (padded) positions."""
        for tiles in self._batcher.finish():
            self._flush(tiles)

    def _count_step(self, tiles):
        """One device step; subclasses may filter windows (Bloom mode)."""
        return table_ops.count_step(
            self.tkeys, self.counts, tiles, self.cfg.k, self.cfg.max_probes
        )

    def _flush(self, tiles_np: np.ndarray):
        t0 = time.perf_counter()
        tiles = jnp.asarray(tiles_np)
        self.tkeys, self.counts, overflow, pending = self._count_step(tiles)
        if int(overflow):
            self._grow_and_retry(tiles, pending)
        self.stats["batches"] += 1
        self.stats["windows_processed"] += tiles_np.shape[0] * self.cfg.tile
        self.stats["build_seconds"] += time.perf_counter() - t0

    def _grow_and_retry(self, tiles, pending):
        """Double capacity, migrate, and re-insert the exact pending set.

        Windows that already landed stay counted; only the insert's own
        pending mask is retried, so nothing is double-counted.
        """
        from ..ops.windows import windows_with_hash

        keys, _, h = windows_with_hash(tiles, self.cfg.k)
        for _ in range(self.cfg.max_grows):
            self.stats["grow_events"] += 1
            self.cap_log2 += 1
            new_tk, new_cn = table_ops.make_table(self.cap_log2, self.cfg.words)
            # migrate existing entries (amount = stored count)
            old_tk, old_cn = self.tkeys, self.counts
            okeys = tuple(old_tk[:, w] for w in range(old_tk.shape[1]))
            oh = hash_words(okeys)
            new_tk, new_cn, mig_pending = table_ops.insert(
                new_tk, new_cn, okeys, old_cn > 0, oh, amount=old_cn,
                max_probes=self.cfg.max_probes,
            )
            if int(mig_pending.sum()):
                continue  # did not fit either: grow again
            new_tk, new_cn, pending = table_ops.insert(
                new_tk, new_cn, keys, pending, h, max_probes=self.cfg.max_probes
            )
            self.tkeys, self.counts = new_tk, new_cn
            if int(pending.sum()) == 0:
                return
        raise RuntimeError("hash table could not grow to fit the input")

    # -- end-to-end --------------------------------------------------------

    def count_file(self, path: str, chunk_bytes: int = io_reader.DEFAULT_CHUNK_BYTES,
                   prefetch: int = 4):
        chunks = io_reader.CodeChunkReader(path, chunk_bytes=chunk_bytes)
        if prefetch:
            chunks = io_reader.PrefetchingReader(chunks, depth=prefetch)
        for codes in chunks:
            self.add_codes(codes)
        self.finish()
        return self

    def count_codes(self, codes: np.ndarray):
        self.add_codes(np.asarray(codes, np.uint8))
        self.finish()
        return self

    # -- output ------------------------------------------------------------

    def _clip(self, counts: np.ndarray) -> np.ndarray:
        if self.cfg.mode == 0:
            return counts & 0xFFFF  # uint16 wrap, reference plain table
        return np.minimum(counts, 16383)  # 14-bit saturation, kaarme table

    def dump(self):
        """(kmers (N, W) uint32, counts (N,) int32) of occupied slots,
        *before* abundance filtering / clipping."""
        cn = np.asarray(self.counts)
        occ = cn > 0
        tk = np.asarray(self.tkeys)[occ]
        return tk, cn[occ]

    def as_dict(self) -> dict:
        """{kmer string: clipped count >= min_abundance} — for tests."""
        tk, cn = self.dump()
        cn = self._clip(cn)
        keep = cn >= self.cfg.min_abundance
        names = codec.unpack_kmers(tk[keep], self.cfg.k) if keep.any() else []
        return dict(zip(names, cn[keep].tolist()))

    def write_output(self, path: str) -> int:
        """Write `KMER COUNT` lines (reference output contract:
        source/kmer_hash_table.cpp:4318-4524; order is table order there,
        slot order here — comparisons must sort, see pytools note in
        SURVEY.md section 4). Returns #lines written."""
        t0 = time.perf_counter()
        tk, cn = self.dump()
        cn = self._clip(cn)
        keep = cn >= self.cfg.min_abundance
        tk, cn = tk[keep], cn[keep]
        n = tk.shape[0]
        with open(path, "wb") as f:
            if n:
                k = self.cfg.k
                chars = np.empty((n, k), np.uint8)
                for i in range(k):
                    chars[:, i] = (tk[:, i // 16] >> np.uint32(30 - 2 * (i % 16))) & np.uint32(3)
                lut = np.frombuffer(b"ACGT", np.uint8)
                kmer_b = lut[chars].view(f"S{k}").ravel().astype(object)
                cnt_b = cn.astype(f"S{len(str(int(cn.max())))}").astype(object)
                lines = kmer_b + b" " + cnt_b + b"\n"
                f.write(b"".join(lines.tolist()))
        self.stats["write_seconds"] += time.perf_counter() - t0
        return int(n)

    # -- queries -----------------------------------------------------------

    def find(self, kmers) -> list:
        """Counts for query k-mer strings (0 if absent, -1 if malformed) —
        the point-lookup API of the reference
        (source/kmer_hash_table.cpp:2675-2727, program_runs.cpp query loop).
        Counts are clipped per table mode."""
        if isinstance(kmers, str):
            kmers = [kmers]
        w = self.cfg.words
        packed = np.zeros((len(kmers), w), np.uint32)
        ok = np.ones(len(kmers), bool)
        for i, s in enumerate(kmers):
            if len(s) != self.cfg.k or any(ch not in "ACGTacgt" for ch in s):
                ok[i] = False
                continue
            packed[i] = codec.pack_kmer(codec.canonical(s.upper()))
        keys = tuple(jnp.asarray(packed[:, j]) for j in range(w))
        h = hash_words(keys)
        out = np.asarray(table_ops.lookup(self.tkeys, self.counts, keys, h,
                                          max_probes=self.cfg.max_probes))
        out = self._clip(out)
        return [int(c) if good else -1 for c, good in zip(out, ok)]

    # -- diagnostics ---------------------------------------------------------

    def occupancy(self) -> tuple:
        cn = np.asarray(self.counts)
        used = int((cn > 0).sum())
        return used, int(cn.shape[0])
