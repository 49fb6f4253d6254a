"""Prefix-sharded index over a TPU device mesh (SPMD via shard_map).

The reference is single-process/single-thread (its OpenMP merge path is
commented out — src/file_io.c:1022-1462, src/merge.c:3-400).  This module is
the scaling story SURVEY §2's parallelism table calls for:

  * TP analogue:  the index is sharded by k-mer **prefix** — the top
    ``log2(n_shards)`` bits of the first packed word.  (The reference trie's
    first 9-char level is exactly such a partition of key space.)  Shard
    ranges are contiguous in sort order, so the global sorted table is the
    concatenation of shard tables.
  * DP analogue:  every device ingests its own slice of the input batch
    (one genome file subset per host in a pod — see parallel/multihost.py).
  * EP analogue:  k-mers are routed to their owner shard with
    ``lax.all_to_all`` over ICI, MoE-style with a fixed per-destination
    capacity (genomic k-mer prefixes are near-uniform; overflow is counted
    on device, checked once per flush, and healed by an idempotent
    re-insert at doubled capacity — never silently wrong).
  * Queries skip routing entirely: the query batch is replicated, each shard
    answers for its own range, and results combine with ``psum``/``max``
    (exactly one shard can own any k-mer, so sums never double-count).

Insert path (mirrors the single-chip buffer-and-flush design in
models/table.py): each global batch is routed once (all_to_all) and appended
raw to a per-shard run buffer; ALL insert work — dedup sort, table probe,
color update, merge, Bloom — happens once per genome in a single shard_mapped
``flush_genome``.  No host round trip happens between batches.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from bloomfiltertrie_tpu.config import BFTConfig
from bloomfiltertrie_tpu.models import graph as graph_ops
from bloomfiltertrie_tpu.models import table as tbl
from bloomfiltertrie_tpu.models.cdbg import BFTAnnotation, _next_pow2
from bloomfiltertrie_tpu.ops import bloom as bloom_ops
from bloomfiltertrie_tpu.ops import codec
from bloomfiltertrie_tpu.ops import sortedset as ss

AXIS = "shards"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def shard_of_keys(keys: jnp.ndarray, shard_bits: int) -> jnp.ndarray:
    """Owner shard = top ``shard_bits`` bits of the first packed word."""
    if shard_bits == 0:
        return jnp.zeros(keys.shape[:-1], dtype=jnp.int32)
    return (keys[..., 0] >> jnp.uint32(32 - shard_bits)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# SPMD bodies (run inside shard_map; leading shard axis is size 1 per device)
# ---------------------------------------------------------------------------

def _route_to_owners(batch, valid, shard_bits: int, capacity: int):
    """all_to_all routing of a local batch to owner shards.

    Returns (recv_keys [n*capacity, W], recv_valid [n*capacity], dropped).
    """
    n = jax.lax.axis_size(AXIS)
    b, w = batch.shape
    shard = jnp.where(valid, shard_of_keys(batch, shard_bits), n)
    # Stable sort by destination shard to make segments contiguous.
    order = jnp.argsort(shard, stable=True).astype(jnp.int32)
    shard_sorted = shard[order]
    batch_sorted = batch[order]
    counts = jnp.bincount(jnp.minimum(shard, n), length=n + 1)[:n]
    start = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                             jnp.cumsum(counts)[:-1]])
    slot = jnp.arange(b, dtype=jnp.int32) - start[jnp.minimum(shard_sorted, n - 1)].astype(jnp.int32)
    ok = (shard_sorted < n) & (slot < capacity)
    dest = jnp.where(ok, shard_sorted * capacity + slot, n * capacity)
    send_keys = jnp.full((n * capacity, w), ss.SENTINEL, dtype=jnp.uint32)
    send_keys = send_keys.at[dest].set(batch_sorted, mode="drop")
    send_valid = jnp.zeros((n * capacity,), dtype=jnp.int32).at[dest].set(
        ok.astype(jnp.int32), mode="drop")
    dropped = jnp.sum((shard < n).astype(jnp.int32)) - jnp.sum(ok.astype(jnp.int32))

    recv_keys = jax.lax.all_to_all(
        send_keys.reshape(n, capacity, w), AXIS, split_axis=0, concat_axis=0,
        tiled=False).reshape(n * capacity, w)
    recv_valid = jax.lax.all_to_all(
        send_valid.reshape(n, capacity), AXIS, split_axis=0, concat_axis=0,
        tiled=False).reshape(n * capacity) == 1
    return recv_keys, recv_valid, dropped


def _route_buffer_body(run_keys, run_valid, run_used, drop_acc, batch, valid,
                       *, shard_bits: int, capacity: int):
    """Per-batch step: route to owners, append raw to the local run buffer.

    No table/color work and no host sync — the analogue of the single-chip
    ``buffer_batch`` with an all_to_all in front.
    """
    recv_keys, recv_valid, dropped = _route_to_owners(
        batch, valid, shard_bits, capacity)
    used = run_used[0]
    rk = jax.lax.dynamic_update_slice(run_keys[0], recv_keys[None],
                                      (used, 0, 0))
    rv = jax.lax.dynamic_update_slice(run_valid[0], recv_valid[None],
                                      (used, 0))
    dtot = jax.lax.psum(dropped, AXIS)
    return rk[None], rv[None], (used + 1)[None], (drop_acc[0] + dtot)[None]


def _flush_body(keys, cref, flags, n, starts, rows, d, bloom_bits,
                run_keys, run_valid, run_used, drop_acc, gid, singleton,
                seeds, *, log2_bloom: int, use_pallas: bool,
                use_bloom: bool = True):
    table = tbl.KmerTable(keys=keys[0], color_ref=cref[0], flags=flags[0],
                          n=n[0], bucket_starts=starts[0])
    colors = tbl.ColorDict(rows=rows[0], d=d[0])
    runs = tbl.PendingRuns(keys=run_keys[0], valid=run_valid[0],
                           used=run_used[0])
    table, colors, bloom, runs, stats = tbl.flush_genome_impl(
        table, colors, runs, bloom_bits[0], gid, singleton[0],
        log2_bloom, seeds[0], seeds[1], use_pallas=use_pallas,
        use_bloom=use_bloom)
    totals = {
        "new": jax.lax.psum(stats["new"], AXIS),
        "colored": jax.lax.psum(stats["colored"], AXIS),
        "dropped": drop_acc[0],
    }
    return (table.keys[None], table.color_ref[None], table.flags[None],
            table.n[None], table.bucket_starts[None], colors.rows[None],
            colors.d[None], bloom[None], runs.keys[None], runs.valid[None],
            runs.used[None], jnp.zeros_like(drop_acc), totals)


def _query_body(keys, cref, rows, n, starts, queries, valid):
    found, idx = ss.lookup(keys[0], n[0], queries, starts[0])
    found = found & valid
    cls = jnp.where(found, cref[0][idx], -1)
    bitmap = jnp.where(found[:, None], rows[0][jnp.maximum(cls, 0)], 0)
    found = jax.lax.psum(found.astype(jnp.int32), AXIS) > 0
    bitmap = jax.lax.psum(bitmap, AXIS)
    return found, bitmap


def _branching_body(keys, n, starts, queries, valid, *, k: int):
    m = queries.shape[0]
    succ, pred = graph_ops.neighbor_candidates(queries, k)
    cand = jnp.concatenate([succ.reshape(m * 4, -1), pred.reshape(m * 4, -1)])
    found, _ = ss.lookup(keys[0], n[0], cand, starts[0])
    found = jax.lax.psum(found.astype(jnp.int32), AXIS)
    sf = found[: m * 4].reshape(m, 4).sum(axis=1)
    pf = found[m * 4:].reshape(m, 4).sum(axis=1)
    return ((sf > 1) | (pf > 1)) & valid


def _flags_body(keys, n, starts, flags, queries, valid, flag):
    """Set 2-bit marks on owned query rows (reference src/marking.c)."""
    found, idx = ss.lookup(keys[0], n[0], queries, starts[0])
    found = found & valid
    dest = jnp.where(found, idx, keys.shape[1])
    return flags[0].at[dest].set(flag.astype(jnp.uint8), mode="drop")[None]


def _get_flags_body(keys, n, starts, flags, queries, valid):
    found, idx = ss.lookup(keys[0], n[0], queries, starts[0])
    found = found & valid
    local = jnp.where(found, flags[0][idx], 0).astype(jnp.int32)
    return jax.lax.psum(local, AXIS)


def _prefix_range_body(keys, n, lo_key, hi_key):
    """Per-shard [lo, hi) row range of keys within [lo_key, hi_key]."""
    lo = ss.searchsorted(keys[0], lo_key[None], side="left")[0]
    hi = ss.searchsorted(keys[0], hi_key[None], side="right")[0]
    lo = jnp.minimum(lo, n[0])
    hi = jnp.minimum(hi, n[0])
    return lo[None], hi[None]


def _compress_body(keys, cref, flags, n, starts, rows, d):
    table = tbl.KmerTable(keys=keys[0], color_ref=cref[0], flags=flags[0],
                          n=n[0], bucket_starts=starts[0])
    colors = tbl.ColorDict(rows=rows[0], d=d[0])
    table, colors = tbl.compress_colors(table, colors)
    return (table.color_ref[None], colors.rows[None], colors.d[None])


def _rebuild_bloom_body(keys, n, seeds, *, log2_bloom: int):
    valid = jnp.arange(keys.shape[1], dtype=jnp.int32) < n[0]
    bits = bloom_ops.empty_bits(log2_bloom)
    return bloom_ops.add(bits, keys[0], valid, log2_bloom,
                         seeds[0], seeds[1])[None]


def _append_singletons(rows, d, gid):
    colors = tbl.ColorDict(rows=rows[0], d=d[0])
    colors, cls = tbl.append_singleton_class(colors, gid)
    return colors.rows[None], colors.d[None], cls[None]


# ---------------------------------------------------------------------------
# Host-side sharded index
# ---------------------------------------------------------------------------

class ShardedCDBG:
    """Prefix-sharded ColoredDBG across a 1-D device mesh.

    State mirrors ColoredDBG but with a leading shard axis, sharded over the
    mesh; the host mirrors per-shard counts for capacity management.
    ``capacity_factor`` scales the all_to_all per-destination buffer
    (send slots per shard = batch/n_shards * factor).
    """

    def __init__(self, config: BFTConfig, mesh: Mesh | None = None,
                 capacity_factor: float = 2.0):
        self.mesh = mesh or make_mesh()
        n_shards = self.mesh.devices.size
        if n_shards & (n_shards - 1):
            raise ValueError("number of devices must be a power of two")
        self.config = dataclasses.replace(
            config, shard_bits=int(math.log2(n_shards)))
        self.capacity_factor = capacity_factor
        self.genome_names: list[str] = []
        w = self.config.words
        cap = self.config.initial_capacity
        dcap = self.config.initial_color_capacity

        self._shardit = lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(self.mesh, P(AXIS)))
        shardit = self._shardit

        self.keys = shardit(np.full((n_shards, cap, w), 0xFFFFFFFF, np.uint32))
        self.color_ref = shardit(np.full((n_shards, cap), -1, np.int32))
        self.flags = shardit(np.zeros((n_shards, cap), np.uint8))
        self.n = shardit(np.zeros((n_shards,), np.int32))
        self.starts = shardit(np.zeros((n_shards, ss.NB_BUCKETS + 1), np.int32))
        self.rows = shardit(np.zeros((n_shards, dcap, 1), np.uint32))
        self.d = shardit(np.zeros((n_shards,), np.int32))
        self.bloom = shardit(np.zeros(
            (n_shards, 1 << (self.config.bloom_log2_bits - 5)), np.uint32))
        # Run buffers (created lazily once the route capacity is known).
        self.run_keys = None
        self.run_valid = None
        self.run_used = None
        self.drop_acc = shardit(np.zeros((n_shards,), np.int32))
        self._route_cap = None
        self._pending_used = 0
        self._since_flush: list = []   # (chunk, vchunk) since last flush
        self._n_max = 0          # max per-shard count (host mirror)
        self._d_max = 0
        self._singletons = None  # per-shard class id of {current genome}
        self.total_dropped = 0
        self._fn_cache: dict = {}
        self.use_pallas = jax.default_backend() == "tpu"

    def _pallas_eligible(self) -> bool:
        from bloomfiltertrie_tpu.ops import pallas_kernels as pk
        cap = self.keys.shape[1]
        return self.use_pallas and cap % pk.TILE == 0 and cap >= pk.TILE

    def _cached(self, kind: str, key, builder):
        full_key = (kind,) + tuple(key)
        fn = self._fn_cache.get(full_key)
        if fn is None:
            fn = jax.jit(builder())
            self._fn_cache[full_key] = fn
        return fn

    # -- properties ------------------------------------------------------
    @property
    def k(self) -> int:
        return self.config.k

    @property
    def n_shards(self) -> int:
        return self.mesh.devices.size

    @property
    def nb_genomes(self) -> int:
        return len(self.genome_names)

    @property
    def nb_kmers(self) -> int:
        self.flush()
        return int(np.asarray(jax.device_get(self.n)).sum())

    @property
    def nb_color_classes(self) -> int:
        return int(np.asarray(jax.device_get(self.d)).sum())

    # -- capacity --------------------------------------------------------
    def _pad_axis(self, arr, new_cap, axis, fill):
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (0, new_cap - arr.shape[axis])
        host = np.asarray(jax.device_get(arr))
        host = np.pad(host, pad, constant_values=fill)
        return self._shardit(host)

    def _ensure_capacity(self, extra_per_shard: int):
        cap = self.keys.shape[1]
        need = self._n_max + extra_per_shard
        if need > cap:
            new_cap = _next_pow2(need)
            self.keys = self._pad_axis(self.keys, new_cap, 1, 0xFFFFFFFF)
            self.color_ref = self._pad_axis(self.color_ref, new_cap, 1, -1)
            self.flags = self._pad_axis(self.flags, new_cap, 1, 0)

    def _ensure_colors(self, extra_per_shard: int):
        dcap = self.rows.shape[1]
        width = max(1, _next_pow2(math.ceil(max(self.nb_genomes, 1) / 32)))
        need = self._d_max + extra_per_shard
        if need > dcap or width > self.rows.shape[2]:
            host = np.asarray(jax.device_get(self.rows))
            host = np.pad(host, ((0, 0),
                                 (0, max(_next_pow2(need), dcap) - dcap),
                                 (0, max(width, host.shape[2]) - host.shape[2])))
            self.rows = self._shardit(host)

    # -- insertion -------------------------------------------------------
    def start_genome(self, name: str) -> int:
        gid = len(self.genome_names)
        self.genome_names.append(name)
        self._ensure_colors(1)
        fn = self._cached(
            "singleton", (self.rows.shape,),
            lambda: jax.shard_map(
                _append_singletons, mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS), P(AXIS), P()),
                out_specs=(P(AXIS), P(AXIS), P(AXIS))))
        self.rows, self.d, singles = fn(
            self.rows, self.d, jnp.asarray(gid, dtype=jnp.int32))
        self._singletons = singles
        self._d_max += 1
        return gid

    def _ensure_runs(self, bsz: int):
        n = self.n_shards
        per_dev = bsz // n
        route_cap = min(per_dev, max(
            int(math.ceil(per_dev / n * self.capacity_factor)), 32))
        if self._route_cap == route_cap and self.run_keys is not None:
            return
        self._route_cap = route_cap
        r = self.config.pending_runs
        m_loc = n * route_cap
        w = self.config.words
        self.run_keys = self._shardit(
            np.full((n, r, m_loc, w), 0xFFFFFFFF, np.uint32))
        self.run_valid = self._shardit(np.zeros((n, r, m_loc), bool))
        self.run_used = self._shardit(np.zeros((n,), np.int32))

    def insert_kmers_packed(self, packed: np.ndarray, valid=None):
        """Buffer-and-route batches; all insert work happens at flush.

        No host<->device round trip per batch: routing overflow is counted
        on device and handled at flush by an idempotent re-insert.
        """
        if self._singletons is None:
            raise RuntimeError("call start_genome() first")
        packed = np.asarray(packed, dtype=np.uint32)
        if valid is None:
            valid = np.ones(packed.shape[0], dtype=bool)
        n = self.n_shards
        bsz = self.config.batch_size  # global batch (split over devices)
        bsz = max(n, (bsz // n) * n)
        for off in range(0, packed.shape[0], bsz):
            chunk = packed[off: off + bsz]
            vchunk = valid[off: off + bsz]
            if chunk.shape[0] < bsz:
                pad = bsz - chunk.shape[0]
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
                vchunk = np.pad(vchunk, (0, pad))
            self._buffer_chunk(chunk, vchunk)

    def _buffer_chunk(self, chunk: np.ndarray, vchunk: np.ndarray):
        self._ensure_runs(chunk.shape[0])
        if self._pending_used >= self.config.pending_runs:
            self.flush()
        fn = self._cached(
            "route", (self.run_keys.shape, chunk.shape, self._route_cap),
            lambda: jax.shard_map(
                functools.partial(
                    _route_buffer_body, shard_bits=self.config.shard_bits,
                    capacity=self._route_cap),
                mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS))))
        self.run_keys, self.run_valid, self.run_used, self.drop_acc = fn(
            self.run_keys, self.run_valid, self.run_used, self.drop_acc,
            jnp.asarray(chunk), jnp.asarray(vchunk))
        self._pending_used += 1
        self._since_flush.append((chunk, vchunk))

    def flush(self, _depth: int = 0):
        """Flush run buffers into the shard tables (read barrier).

        One shard_mapped ``flush_genome`` per genome; the single host sync of
        the insert path.  If the all_to_all capacity overflowed since the
        last flush, the inserted state is healed by re-inserting the saved
        chunks at doubled ``capacity_factor`` (idempotent: set semantics +
        the same-genome color no-op, reference src/retrieveAnnotation.c:278).
        """
        if not self._pending_used or self.run_keys is None:
            return
        r, m_loc = self.run_keys.shape[1], self.run_keys.shape[2]
        self._ensure_capacity(r * m_loc)
        self._ensure_colors(self._d_max + 1)
        gid = len(self.genome_names) - 1
        seeds = jnp.asarray(
            [self.config.bloom_seed1, self.config.bloom_seed2],
            dtype=jnp.uint32)
        fn = self._cached(
            "flush", (self.keys.shape, self.rows.shape, self.run_keys.shape,
                      self._pallas_eligible()),
            lambda: jax.shard_map(
                functools.partial(
                    _flush_body, log2_bloom=self.config.bloom_log2_bits,
                    use_pallas=self._pallas_eligible(),
                    use_bloom=self.config.bloom_enabled),
                mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS),) * 12 + (P(), P(AXIS), P()),
                out_specs=((P(AXIS),) * 11 + (P(AXIS), P()))))
        (self.keys, self.color_ref, self.flags, self.n, self.starts,
         self.rows, self.d, self.bloom, self.run_keys, self.run_valid,
         self.run_used, self.drop_acc, totals) = fn(
            self.keys, self.color_ref, self.flags, self.n, self.starts,
            self.rows, self.d, self.bloom, self.run_keys, self.run_valid,
            self.run_used, self.drop_acc,
            jnp.asarray(gid, dtype=jnp.int32), self._singletons, seeds)
        self._pending_used = 0
        t = jax.device_get(totals)
        self._n_max = int(np.asarray(jax.device_get(self.n)).max())
        self._d_max = int(np.asarray(jax.device_get(self.d)).max())
        dropped = int(np.asarray(t["dropped"]).max())
        retry = self._since_flush
        self._since_flush = []
        if dropped:
            if _depth > 8:
                raise RuntimeError(
                    f"all_to_all capacity overflow persists after {_depth} "
                    f"retries ({dropped} k-mers dropped)")
            self.total_dropped += dropped  # telemetry; retry makes it whole
            self.capacity_factor = min(self.capacity_factor * 2,
                                       float(self.n_shards))
            self._route_cap = None  # force run-buffer rebuild
            for chunk, vchunk in retry:
                self._buffer_chunk(chunk, vchunk)
            self.flush(_depth + 1)

    def end_genome(self):
        self.flush()
        self._singletons = None

    def insert_genome(self, name, packed, valid=None):
        self.start_genome(name)
        self.insert_kmers_packed(packed, valid)
        self.end_genome()

    def compress_colors(self):
        """Per-shard color-class dedup + GC (shard dictionaries are
        independent: a k-mer lives on exactly one shard)."""
        self.flush()
        fn = self._cached(
            "compress", (self.keys.shape, self.rows.shape),
            lambda: jax.shard_map(
                _compress_body, mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS),) * 7,
                out_specs=(P(AXIS), P(AXIS), P(AXIS))))
        self.color_ref, self.rows, self.d = fn(
            self.keys, self.color_ref, self.flags, self.n, self.starts,
            self.rows, self.d)
        self._d_max = int(np.asarray(jax.device_get(self.d)).max())

    # -- queries ---------------------------------------------------------
    def query_kmers_packed(self, packed, valid=None):
        self.flush()
        packed = np.asarray(packed, dtype=np.uint32)
        if valid is None:
            valid = np.ones(packed.shape[0], dtype=bool)
        fn = self._cached(
            "query", (self.keys.shape, self.rows.shape, packed.shape),
            lambda: jax.shard_map(
                _query_body, mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                          P(), P()),
                out_specs=(P(), P())))
        found, bitmap = fn(self.keys, self.color_ref, self.rows, self.n,
                           self.starts, jnp.asarray(packed),
                           jnp.asarray(valid))
        return np.asarray(found), np.asarray(bitmap)

    def contains(self, kmer: str) -> bool:
        packed, valid = codec.encode_strings([kmer], self.k)
        found, _ = self.query_kmers_packed(packed, valid)
        return bool(found[0])

    def get_colors(self, kmer: str):
        packed, valid = codec.encode_strings([kmer], self.k)
        found, bitmap = self.query_kmers_packed(packed, valid)
        if not found[0]:
            return None
        return BFTAnnotation(bitmap[0], self.nb_genomes)

    def query_sequence(self, sequence, threshold: float,
                       canonical: bool | None = None):
        if canonical is None:
            canonical = self.config.canonical
        seq = sequence.encode() if isinstance(sequence, str) else sequence
        nb_windows = len(seq) - self.k + 1
        if nb_windows <= 0:
            return np.zeros((0,), dtype=np.uint32)
        need = math.ceil(nb_windows * threshold)
        packed, valid = codec.kmerize_sequence(seq, self.k)
        if canonical:
            packed = codec.canonical_packed(packed, self.k)
        _, bitmap = self.query_kmers_packed(packed, valid)
        bits = np.unpackbits(bitmap.view(np.uint8).reshape(bitmap.shape[0], -1),
                             axis=1, bitorder="little")
        counts = bits.sum(axis=0)
        return np.nonzero(counts[: self.nb_genomes] >= need)[0].astype(np.uint32)

    def branching_count_packed(self, packed, valid=None) -> int:
        self.flush()
        packed = np.asarray(packed, dtype=np.uint32)
        if valid is None:
            valid = np.ones(packed.shape[0], dtype=bool)
        fn = self._cached(
            "branching", (self.keys.shape, packed.shape),
            lambda: jax.shard_map(
                functools.partial(_branching_body, k=self.k), mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P()),
                out_specs=P()))
        mask = fn(self.keys, self.n, self.starts, jnp.asarray(packed),
                  jnp.asarray(valid))
        return int(np.asarray(mask).sum())

    # -- marking (reference src/marking.c; sharded parity) ----------------
    def set_flags_packed(self, packed, flag: int, valid=None):
        self.flush()
        if not (0 <= flag <= 3):
            raise ValueError("flags are 2-bit (4 states), like marking.c")
        packed = np.asarray(packed, dtype=np.uint32)
        if valid is None:
            valid = np.ones(packed.shape[0], dtype=bool)
        fn = self._cached(
            "set_flags", (self.keys.shape, packed.shape),
            lambda: jax.shard_map(
                _flags_body, mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P()),
                out_specs=P(AXIS)))
        self.flags = fn(self.keys, self.n, self.starts, self.flags,
                        jnp.asarray(packed), jnp.asarray(valid),
                        jnp.asarray(flag, dtype=jnp.int32))

    def get_flags_packed(self, packed, valid=None) -> np.ndarray:
        self.flush()
        packed = np.asarray(packed, dtype=np.uint32)
        if valid is None:
            valid = np.ones(packed.shape[0], dtype=bool)
        fn = self._cached(
            "get_flags", (self.keys.shape, packed.shape),
            lambda: jax.shard_map(
                _get_flags_body, mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P()),
                out_specs=P()))
        out = fn(self.keys, self.n, self.starts, self.flags,
                 jnp.asarray(packed), jnp.asarray(valid))
        return np.asarray(out).astype(np.uint8)

    # -- extraction / iteration ------------------------------------------
    def extract_kmers_packed(self) -> np.ndarray:
        """Global sorted table = concat of shard tables (prefix ranges)."""
        self.flush()
        keys = np.asarray(jax.device_get(self.keys))
        ns = np.asarray(jax.device_get(self.n))
        return np.concatenate([keys[s, : ns[s]] for s in range(self.n_shards)])

    def extract_kmer_strings(self) -> list[str]:
        return codec.decode_strings(self.extract_kmers_packed(), self.k)

    def iterate_over_kmers(self, fn):
        """Call ``fn(kmer_str, BFTAnnotation, flag)`` for every k-mer
        (reference iterate_over_kmers bft.c:1051; sharded parity)."""
        self.flush()
        keys = np.asarray(jax.device_get(self.keys))
        ns = np.asarray(jax.device_get(self.n))
        cref = np.asarray(jax.device_get(self.color_ref))
        flags = np.asarray(jax.device_get(self.flags))
        rows = np.asarray(jax.device_get(self.rows))
        for s in range(self.n_shards):
            c = int(ns[s])
            if not c:
                continue
            strs = codec.decode_strings(keys[s, :c], self.k)
            bm = rows[s][np.maximum(cref[s, :c], 0)]
            for i, st in enumerate(strs):
                fn(st, BFTAnnotation(bm[i], self.nb_genomes),
                   int(flags[s, i]))

    def prefix_matching(self, prefix: str) -> np.ndarray:
        """Packed k-mers with the given prefix (reference bft.c:1096).

        Each shard's range is contiguous; the global result is the
        shard-order concatenation (shards partition the sorted key space).
        """
        self.flush()
        p = len(prefix)
        if p > self.k:
            raise ValueError("prefix longer than k")
        lo_s = prefix + "A" * (self.k - p)
        hi_s = prefix + "T" * (self.k - p)
        packed, valid = codec.encode_strings([lo_s, hi_s], self.k)
        if not valid.all():
            raise ValueError("prefix contains non-ACGT characters")
        fn = self._cached(
            "prefix_range", (self.keys.shape,),
            lambda: jax.shard_map(
                _prefix_range_body, mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS), P(AXIS), P(), P()),
                out_specs=(P(AXIS), P(AXIS))))
        lo, hi = fn(self.keys, self.n, jnp.asarray(packed[0]),
                    jnp.asarray(packed[1]))
        lo = np.asarray(jax.device_get(lo))
        hi = np.asarray(jax.device_get(hi))
        keys = np.asarray(jax.device_get(self.keys))
        parts = [keys[s, lo[s]: hi[s]] for s in range(self.n_shards)
                 if hi[s] > lo[s]]
        if not parts:
            return np.zeros((0, self.config.words), dtype=np.uint32)
        return np.concatenate(parts)

    # -- persistence (sharded checkpoint; mesh-size independent) ---------
    def save(self, path: str):
        """Checkpoint as a GLOBAL view so any mesh size can reload.

        Reference analogue: write_BFT_Root (src/write_to_disk.c:21); the
        sharded twist is that per-shard color-class ids are rebased and the
        dictionary rows are DEDUPLICATED into one global dictionary, so
        save->load->save is idempotent regardless of shard count.
        """
        import json
        self.flush()
        keys = np.asarray(jax.device_get(self.keys))
        ns = np.asarray(jax.device_get(self.n))
        ds = np.asarray(jax.device_get(self.d))
        cref = np.asarray(jax.device_get(self.color_ref))
        flags = np.asarray(jax.device_get(self.flags))
        rows = np.asarray(jax.device_get(self.rows))
        g_keys, g_cref, g_flags, g_rows = [], [], [], []
        offset = 0
        for s in range(self.n_shards):
            g_keys.append(keys[s, : ns[s]])
            g_cref.append(cref[s, : ns[s]] + offset)
            g_flags.append(flags[s, : ns[s]])
            g_rows.append(rows[s, : ds[s]])
            offset += int(ds[s])
        all_rows = (np.concatenate(g_rows) if g_rows
                    else np.zeros((0, rows.shape[2]), np.uint32))
        all_cref = (np.concatenate(g_cref) if g_cref
                    else np.zeros((0,), np.int32))
        # Global dedup: identical class rows across shards collapse to one.
        from bloomfiltertrie_tpu.models import colors_codec
        uniq, inverse = np.unique(all_rows, axis=0, return_inverse=True)
        all_cref = inverse.astype(np.int32)[all_cref] if len(all_cref) else all_cref
        enc = colors_codec.encode_classes(uniq, max(self.nb_genomes, 1))
        np.savez_compressed(
            path if path.endswith(".npz") else path + ".npz",
            keys=np.concatenate(g_keys), color_ref=all_cref,
            flags=np.concatenate(g_flags),
            color_modes=enc["modes"], color_offsets=enc["offsets"],
            color_data=enc["data"],
            manifest=np.frombuffer(json.dumps({
                "config": dataclasses.asdict(
                    dataclasses.replace(self.config, shard_bits=0)),
                "genome_names": self.genome_names,
                "d": int(uniq.shape[0]), "cw": int(rows.shape[2]),
                "sharded": True,
            }).encode(), dtype=np.uint8))

    @classmethod
    def load(cls, path: str, mesh: Mesh | None = None,
             capacity_factor: float = 2.0) -> "ShardedCDBG":
        import json
        import os
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        z = np.load(path)
        manifest = json.loads(z["manifest"].tobytes().decode())
        config = BFTConfig.from_dict(manifest["config"])
        self = cls(config, mesh=mesh, capacity_factor=capacity_factor)
        self.genome_names = list(manifest["genome_names"])
        keys, cref, flags = z["keys"], z["color_ref"], z["flags"]
        if "rows" in z:  # legacy uncompressed dictionary
            rows = z["rows"]
        else:
            from bloomfiltertrie_tpu.models import colors_codec
            rows = colors_codec.decode_classes(
                {"modes": z["color_modes"], "offsets": z["color_offsets"],
                 "data": z["color_data"]},
                max(len(manifest["genome_names"]), 1), manifest.get("cw", 1))
        n_shards = self.n_shards
        sb = self.config.shard_bits
        shard_of = ((keys[:, 0] >> np.uint32(32 - sb)).astype(np.int64)
                    if sb else np.zeros(len(keys), np.int64))
        counts = np.bincount(shard_of, minlength=n_shards)
        cap = max(_next_pow2(int(counts.max()) if len(keys) else 1),
                  config.initial_capacity)
        d = rows.shape[0]
        dcap = max(_next_pow2(d + 1), config.initial_color_capacity)
        cw = rows.shape[1] if d else 1
        w = self.config.words
        keys_s = np.full((n_shards, cap, w), 0xFFFFFFFF, np.uint32)
        cref_s = np.full((n_shards, cap), -1, np.int32)
        flags_s = np.zeros((n_shards, cap), np.uint8)
        n_s = np.zeros((n_shards,), np.int32)
        # Global dictionary replicated per shard; the per-shard
        # compress_colors below GC's unreferenced rows immediately so
        # repeated save/load cycles don't grow state.
        rows_s = np.zeros((n_shards, dcap, cw), np.uint32)
        starts_np = np.zeros((n_shards, ss.NB_BUCKETS + 1), np.int32)
        off = 0
        for s in range(n_shards):
            c = int(counts[s])
            keys_s[s, :c] = keys[off: off + c]
            cref_s[s, :c] = cref[off: off + c]
            flags_s[s, :c] = flags[off: off + c]
            n_s[s] = c
            rows_s[s, :d] = rows
            # per-shard prefix index, built host-side
            top16 = (keys[off: off + c, 0] >> np.uint32(16)).astype(np.int64)
            starts_np[s, :-1] = np.searchsorted(
                top16, np.arange(ss.NB_BUCKETS), side="left")
            starts_np[s, -1] = c
            off += c

        shardit = self._shardit
        self.keys = shardit(keys_s)
        self.color_ref = shardit(cref_s)
        self.flags = shardit(flags_s)
        self.n = shardit(n_s)
        self.starts = shardit(starts_np)
        self.rows = shardit(rows_s)
        self.d = shardit(np.full((n_shards,), d, np.int32))
        self._n_max = int(n_s.max()) if n_shards else 0
        self._d_max = d
        # Rebuild the per-shard Bloom plane from the loaded keys (the plane
        # is shard-layout dependent, so it is reconstructed, not serialized).
        seeds = jnp.asarray([config.bloom_seed1, config.bloom_seed2],
                            dtype=jnp.uint32)
        fn = self._cached(
            "rebuild_bloom", (self.keys.shape,),
            lambda: jax.shard_map(
                functools.partial(_rebuild_bloom_body,
                                  log2_bloom=config.bloom_log2_bits),
                mesh=self.mesh, check_vma=False,
                in_specs=(P(AXIS), P(AXIS), P()),
                out_specs=P(AXIS)))
        self.bloom = fn(self.keys, self.n, seeds)
        # GC replicated-but-unreferenced dictionary rows per shard.
        self.compress_colors()
        return self

    def to_single(self) -> "object":
        """Materialize the sharded index as one ColoredDBG.

        Whole-graph algorithms (models/graph_batch.py, models/snippets.py)
        operate on one table; connectivity crosses shard boundaries, so the
        honest way to run them on a sharded build is to gather the (already
        globally sorted) shard ranges into a single-device index.  Cost: one
        host round trip of keys/refs/flags + the deduplicated dictionary.
        """
        import json
        import os
        import tempfile
        from bloomfiltertrie_tpu.models.cdbg import ColoredDBG
        self.flush()
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "gather")
            self.save(p)
            z = np.load(p + ".npz")
            manifest = json.loads(z["manifest"].tobytes().decode())
            from bloomfiltertrie_tpu.models import colors_codec
            rows = colors_codec.decode_classes(
                {"modes": z["color_modes"], "offsets": z["color_offsets"],
                 "data": z["color_data"]},
                max(len(manifest["genome_names"]), 1), manifest.get("cw", 1))
            dbg = ColoredDBG(BFTConfig.from_dict(manifest["config"]))
            dbg.genome_names = list(manifest["genome_names"])
            n, d = z["keys"].shape[0], rows.shape[0]
            cap = max(_next_pow2(max(n, 1)), dbg.config.initial_capacity)
            dcap = max(_next_pow2(max(d, 1)), dbg.config.initial_color_capacity)
            w = dbg.config.words
            keys = np.full((cap, w), 0xFFFFFFFF, np.uint32)
            keys[:n] = z["keys"]
            cref = np.full((cap,), -1, np.int32)
            cref[:n] = z["color_ref"]
            flags = np.zeros((cap,), np.uint8)
            flags[:n] = z["flags"]
            rows_full = np.zeros((dcap, rows.shape[1] if d else 1), np.uint32)
            rows_full[:d] = rows
            keys_d = jnp.asarray(keys)
            n_d = jnp.asarray(n, dtype=jnp.int32)
            dbg.table = tbl.KmerTable(
                keys=keys_d, color_ref=jnp.asarray(cref),
                flags=jnp.asarray(flags), n=n_d,
                bucket_starts=ss.build_bucket_starts(keys_d, n_d))
            dbg.colors = tbl.ColorDict(rows=jnp.asarray(rows_full),
                                       d=jnp.asarray(d, dtype=jnp.int32))
            dbg._n, dbg._d = n, d
        return dbg

    # -- observability ----------------------------------------------------
    def memory_stats(self) -> dict:
        self.flush()
        return {
            "nb_kmers": self.nb_kmers,
            "nb_color_classes": self.nb_color_classes,
            "nb_genomes": self.nb_genomes,
            "n_shards": self.n_shards,
            "table_capacity_per_shard": self.keys.shape[1],
            "bytes_keys": self.keys.size * 4,
            "bytes_color_ref": self.color_ref.size * 4,
            "bytes_flags": self.flags.size,
            "bytes_colors": self.rows.size * 4,
            "bytes_bloom": self.bloom.size * 4,
            "total_dropped_then_retried": self.total_dropped,
        }
