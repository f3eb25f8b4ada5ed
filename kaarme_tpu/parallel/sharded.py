"""Multi-device (and multi-host) sharded counting.

The reference has no distribution at all — its parallelism is N CPU
threads CAS-ing one shared table (SURVEY.md section 2.2).  The TPU-native
scale-out keeps that table as ONE logical array sharded over a device
mesh:

- mesh axis ``d``: the count table (keys rows + counts) is partitioned by
  *hash prefix* — slot bits [shard_log2, cap_log2) pick the owner device,
  the low bits address within the owner's shard;
- read tiles are data-parallel over ``d``: every device extracts windows
  from its own shard of the input stream;
- each window is routed to its owner via ``jax.lax.all_to_all`` as a
  (key words, amount) record over ICI; the owner runs the same batched
  probe/insert kernel locally (ops/table.py).

Within a shard the probe sequence uses only low slot bits, so shards are
independent open-addressing tables and single-device results equal
multi-device results as count multisets.

The per-destination routing capacity is the full local window count, so
routing can never drop records (skew-proof); a future optimization is
local sort-dedup + 2x-slack capacity to cut ICI volume.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import table as table_ops
from ..ops.hashing import hash_words, hash_words_np
from ..ops.windows import windows_with_hash
from ..utils import codec
from ..utils.mathutils import capacity_log2
from ..models.tiling import TileBatcher


def make_mesh(n_devices: int = 0, platform: str | None = None) -> Mesh:
    """1-D device mesh; falls back to the CPU backend when the default
    platform has fewer devices than requested (virtual-device testing)."""
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n and platform is None:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n:
            devs = cpu
    if n & (n - 1):
        raise ValueError(f"device count must be a power of two, got {n}")
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), ("d",))


@dataclasses.dataclass
class ShardedCounterConfig:
    k: int
    min_slots: int = 1 << 22
    mode: int = 2
    min_abundance: int = 2
    tile: int = 1 << 14
    batch_tiles: int = 64          # must be a multiple of the device count
    max_probes: int = 64

    @property
    def words(self) -> int:
        return codec.words_per_kmer(self.k)


def _routed_insert(tiles, tkeys, counts, *, k: int, cap_log2: int,
                   shard_log2: int, max_probes: int):
    """Per-device body (runs under shard_map).

    tiles:  (B/ndev, T+k-1) local input rows
    tkeys:  (C/ndev, W) local table shard
    counts: (C/ndev,)   local counts shard
    """
    ndev = jax.lax.axis_size("d")
    keys, valid, h = windows_with_hash(tiles, k)
    n = valid.shape[0]
    w = len(keys)

    slot_global = h & jnp.uint32((1 << cap_log2) - 1)
    owner = (slot_global >> jnp.uint32(shard_log2)).astype(jnp.int32)

    # position of each record within its owner's bucket
    onehot = (owner[:, None] == jnp.arange(ndev, dtype=jnp.int32)[None, :]) & valid[:, None]
    pos = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1
    pos = jnp.take_along_axis(pos, owner[:, None], axis=1)[:, 0]

    cap = n  # full capacity: routing can never drop (skew-proof)
    send = jnp.zeros((ndev * cap, w + 1), jnp.uint32)
    idx = jnp.where(valid, owner * cap + pos, ndev * cap)
    record = jnp.stack(list(keys) + [jnp.ones((n,), jnp.uint32)], axis=1)
    send = send.at[idx].set(record, mode="drop")
    send = send.reshape(ndev, cap, w + 1)

    recv = jax.lax.all_to_all(send, "d", split_axis=0, concat_axis=0, tiled=False)
    recv = recv.reshape(ndev * cap, w + 1)

    rkeys = tuple(recv[:, j] for j in range(w))
    amount = recv[:, w].astype(jnp.int32)
    rvalid = amount > 0
    rh = hash_words(rkeys)

    tkeys, counts, pending = table_ops.insert(
        tkeys, counts, rkeys, rvalid, rh, amount=amount, max_probes=max_probes
    )
    overflow = jax.lax.psum(jnp.sum(pending.astype(jnp.int32)), "d")
    return tkeys, counts, overflow


class ShardedKmerCounter:
    """Same pipeline surface as models.KmerCounter, over a device mesh."""

    def __init__(self, config: ShardedCounterConfig, mesh: Mesh | None = None):
        self.cfg = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.ndev = int(self.mesh.devices.size)
        if config.batch_tiles % self.ndev:
            raise ValueError("batch_tiles must be a multiple of the device count")
        self.cap_log2 = max(capacity_log2(config.min_slots),
                            (self.ndev - 1).bit_length() + 1)
        self.shard_log2 = self.cap_log2 - (self.ndev - 1).bit_length()
        c = 1 << self.cap_log2
        kspec = NamedSharding(self.mesh, P("d", None))
        cspec = NamedSharding(self.mesh, P("d"))
        self.tkeys = jax.device_put(jnp.zeros((c, config.words), jnp.uint32), kspec)
        self.counts = jax.device_put(jnp.zeros((c,), jnp.int32), cspec)
        self._batcher = TileBatcher(config.k, config.tile, config.batch_tiles)
        self.stats = {"windows_processed": 0, "batches": 0}

        body = partial(
            _routed_insert,
            k=config.k,
            cap_log2=self.cap_log2,
            shard_log2=self.shard_log2,
            max_probes=config.max_probes,
        )
        mapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P("d", None), P("d", None), P("d")),
            out_specs=(P("d", None), P("d"), P()),
        )
        self._step = jax.jit(mapped, donate_argnums=(1, 2))

    # -- streaming (same surface as KmerCounter) ---------------------------

    def add_codes(self, codes: np.ndarray):
        for tiles in self._batcher.add(codes):
            self._flush(tiles)

    def finish(self):
        for tiles in self._batcher.finish():
            self._flush(tiles)

    def count_codes(self, codes: np.ndarray):
        self.add_codes(np.asarray(codes, np.uint8))
        self.finish()
        return self

    def count_file(self, path: str, **kw):
        from ..io import reader as io_reader

        for codes in io_reader.CodeChunkReader(path, **kw):
            self.add_codes(codes)
        self.finish()
        return self

    def _flush(self, tiles_np: np.ndarray):
        tiles = jax.device_put(
            jnp.asarray(tiles_np), NamedSharding(self.mesh, P("d", None))
        )
        self.tkeys, self.counts, overflow = self._step(tiles, self.tkeys, self.counts)
        if int(overflow):
            raise RuntimeError(
                "sharded table overflow: raise min_slots (sharded growth is "
                "not implemented yet)"
            )
        self.stats["batches"] += 1
        self.stats["windows_processed"] += tiles_np.shape[0] * self.cfg.tile

    # -- output --------------------------------------------------------------

    def _clip(self, counts: np.ndarray) -> np.ndarray:
        if self.cfg.mode == 0:
            return counts & 0xFFFF
        return np.minimum(counts, 16383)

    def dump(self):
        cn = np.asarray(self.counts)
        occ = cn > 0
        return np.asarray(self.tkeys)[occ], cn[occ]

    def as_dict(self) -> dict:
        tk, cn = self.dump()
        cn = self._clip(cn)
        keep = cn >= self.cfg.min_abundance
        names = codec.unpack_kmers(tk[keep], self.cfg.k) if keep.any() else []
        return dict(zip(names, cn[keep].tolist()))

    def occupancy(self):
        cn = np.asarray(self.counts)
        return int((cn > 0).sum()), int(cn.shape[0])

    # -- queries ---------------------------------------------------------------

    def find(self, kmers) -> list:
        """Host-side point lookups: route by hash prefix, emulate the
        shard-local probe sequence in NumPy (bit-for-bit the device hash)."""
        if isinstance(kmers, str):
            kmers = [kmers]
        tk = np.asarray(self.tkeys)
        cn = np.asarray(self.counts)
        shard_slots = 1 << self.shard_log2
        out = []
        for s in kmers:
            if len(s) != self.cfg.k or any(ch not in "ACGTacgt" for ch in s):
                out.append(-1)
                continue
            packed = codec.pack_kmer(codec.canonical(s.upper()))
            h = int(hash_words_np(tuple(np.uint32(x) for x in packed)))
            owner = (h & ((1 << self.cap_log2) - 1)) >> self.shard_log2
            base = owner * shard_slots
            cnt = 0
            for i in range(self.cfg.max_probes):
                local = (h + (i * (i + 1) // 2)) % shard_slots
                slot = base + local
                if cn[slot] <= 0:
                    break
                if (tk[slot] == packed).all():
                    cnt = int(cn[slot])
                    break
            out.append(int(self._clip(np.asarray([cnt]))[0]))
        return out
