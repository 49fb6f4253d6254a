"""ColoredDBG — the public colored de Bruijn graph index (bft.h parity).

This is the TPU-native equivalent of the reference's public API surface
(``include/bft.h`` / ``src/bft.c``): one host-side object owning device-side
state (sorted k-mer table, color-class dictionary, Bloom plane) and exposing
create / insert / query / neighbors / iterate / mark / save / load.

API mapping (reference -> here):
  create_cdbg (bft.c:12)                 -> ColoredDBG(BFTConfig(k=...))
  insert_genomes_from_files (bft.c)      -> drivers in utils/drivers.py
  insert_kmers_new_genome (bft.c)        -> insert_genome / start_genome+insert
  get_kmer (bft.c:216)                   -> query_kmers / find
  is_kmer_in_cdbg (bft.c:246)            -> contains
  get_annotation (bft.c:363)             -> get_colors (bitmap row)
  get_list_id_genomes (bft.c:622)        -> list_id_genomes
  get_count_id_genomes                   -> count_id_genomes
  intersection/union/sym_difference_annotations -> annotation_* (bitwise)
  query_sequence (bft.c:1241)            -> query_sequence
  get_neighbors/successors/predecessors (bft.c:804) -> successors/predecessors
  iterate_over_kmers (bft.c:1051)        -> iterate_over_kmers
  prefix_matching (bft.c:1096)           -> prefix_matching
  set_marking/set_flag_kmer (bft.c)      -> set_flags/get_flags
  extract_kmers_to_disk (bft.c:255)      -> utils/drivers.py
  write_BFT/load_BFT (bft.c)             -> save / ColoredDBG.load
  create_cdbg_from_bft_kmers (bft.c:1353)-> subgraph
"""

from __future__ import annotations

import functools
import json
import math
import os
import warnings


def _debug_invariants() -> bool:
    """Env-gated debug invariant mode (SURVEY §5 sanitizers row)."""
    return os.environ.get("BFT_DEBUG_INVARIANTS", "") not in ("", "0")

import jax
import jax.numpy as jnp
import numpy as np

from bloomfiltertrie_tpu.config import BFTConfig
from bloomfiltertrie_tpu.models import graph as graph_ops
from bloomfiltertrie_tpu.models import table as tbl
from bloomfiltertrie_tpu.ops import bloom as bloom_ops
from bloomfiltertrie_tpu.ops import codec
from bloomfiltertrie_tpu.ops import sortedset as ss


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length() if x > 1 else 1


@functools.partial(jax.jit,
                   static_argnames=("use_pallas", "queries_sorted"))
def _query_colors(table_keys, n, starts, color_ref, colors, queries, valid,
                  use_pallas=False, queries_sorted=False):
    """found[M], class id[M], color bitmap uint32[M, cw]."""
    found, idx = _lookup(table_keys, n, starts, queries, valid, use_pallas,
                         queries_sorted)
    cls = jnp.where(found, color_ref[idx], -1)
    bitmap = tbl.class_bitmap(colors, cls)
    return found, idx, cls, bitmap


@jax.jit
def _color_counts_per_kmer(color_ref, colors, n):
    """Number of genomes of every table row's class, int32[cap] (0 past n)."""
    cap = color_ref.shape[0]
    live = jnp.arange(cap, dtype=jnp.int32) < n
    return jnp.where(live, tbl.class_sizes(colors, color_ref), 0)


@jax.jit
def _has_genome_per_kmer(color_ref, colors, n, genome_id):
    """bool[cap]: table row's class contains genome_id (False past n)."""
    cap = color_ref.shape[0]
    live = jnp.arange(cap, dtype=jnp.int32) < n
    return live & tbl.class_has_genome(colors, color_ref, genome_id)


def _lookup(table_keys, n, starts, queries, valid, use_pallas,
            queries_sorted=False):
    if use_pallas:
        from bloomfiltertrie_tpu.ops import pallas_kernels as pk
        if queries_sorted:
            return pk.lookup_sorted(table_keys, n, queries, valid)
        return pk.lookup_unsorted(table_keys, n, queries, valid)
    found, idx = ss.lookup(table_keys, n, queries, starts)
    return found & valid, idx


@functools.partial(jax.jit,
                   static_argnames=("use_pallas", "queries_sorted"))
def _presence_only(table_keys, n, starts, queries, valid, use_pallas=False,
                   queries_sorted=False):
    return _lookup(table_keys, n, starts, queries, valid, use_pallas,
                   queries_sorted)


@functools.partial(jax.jit, static_argnames=("use_pallas", "block"))
def _seq_query_counts(table_keys, n, starts, color_ref, colors, packed,
                      valid, seq_starts, seq_ends, use_pallas=False,
                      block=1):
    """Per-(sequence, genome) k-mer hit counts in ONE device program.

    ``packed``/``valid`` hold the CONCATENATED windows of many sequences
    (sequence s owns rows [seq_starts[s], seq_ends[s])); the counts come
    from an exclusive cumulative sum of the per-window color bits read at
    the segment boundaries — contiguous segments need no scatter-add.
    ``block > 1`` requires block-aligned boundaries (the batcher pads with
    invalid rows) and block-reduces the count chain
    (:func:`table.segment_bit_counts`).  Returns int32[S, cw*32].  The
    batched redesign of the reference's per-sequence probe loop
    (src/bft.c:1241, src/file_io.c:1464).
    """
    found, idx = _lookup(table_keys, n, starts, packed, valid, use_pallas)
    cls = jnp.where(found, color_ref[idx], -1)
    bitmap = tbl.class_bitmap(colors, cls)          # [M, cw]
    return tbl.segment_bit_counts(bitmap, seq_starts, seq_ends, block)


@jax.jit
def _color_counts(bitmap):
    """Per-genome-bit counts over a batch of color bitmaps [M, cw] -> [cw*32]."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (bitmap[:, :, None] >> shifts[None, None, :]) & 1
    return jnp.sum(bits.astype(jnp.int32), axis=0).reshape(-1)


def _seq_block_size(k: int, sequences) -> int:
    """Count-chain block size for :func:`_seq_batch_blocks`: large blocks
    make the device count pass ~block times cheaper but pad every sequence
    to a block multiple, so scale with the average sequence length (three
    values keep the compile count bounded)."""
    nw = [len(s) - k + 1 for s in sequences]
    nw = [x for x in nw if x > 0]
    avg = (sum(nw) / len(nw)) if nw else 0
    return 64 if avg >= 256 else (8 if avg >= 16 else 1)


def _seq_batch_blocks(k: int, words: int, sequences, canonical: bool,
                      max_windows: int, block: int = 1):
    """Host-side batching for the multi-sequence query (shared by
    ColoredDBG and ShardedCDBG): kmerize every sequence, group into blocks
    of <= max_windows concatenated windows, pow2-pad block shapes (bounded
    compile count).  Each sequence's rows are padded (invalid, zero
    contribution) to a multiple of ``block`` so every segment boundary is
    block-aligned — the contract of the block-reduced device count
    (:func:`table.segment_bit_counts`).  Yields (seq_indices, packed,
    valid, starts, ends, nwins) per block; sequences shorter than k are
    skipped (their rows stay all-zero, reference empty/IUPAC row
    semantics)."""

    def pad_to_block(x):
        return -(-x // block) * block

    def finish(blk):
        nwins = np.array([b[3] for b in blk], dtype=np.int64)
        pwins = np.array([pad_to_block(int(x)) for x in nwins],
                         dtype=np.int64)
        ends_raw = np.cumsum(pwins)
        starts_raw = ends_raw - pwins
        m = int(ends_raw[-1])
        mp = max(_next_pow2(m), block)
        packed = np.zeros((mp, words), np.uint32)
        valid = np.zeros((mp,), bool)
        for (_, p, v, nwin), st in zip(blk, starts_raw):
            packed[st: st + nwin] = p
            valid[st: st + nwin] = v
        s_pad = _next_pow2(len(blk))
        starts = np.zeros((s_pad,), np.int32)
        ends = np.zeros((s_pad,), np.int32)
        starts[: len(blk)] = starts_raw
        ends[: len(blk)] = ends_raw
        return ([b[0] for b in blk], packed, valid, starts, ends, nwins)

    blk = []
    blk_rows = 0
    for si, s in enumerate(sequences):
        seq = s.encode() if isinstance(s, str) else s
        nwin = len(seq) - k + 1
        if nwin <= 0:
            continue
        packed, valid = codec.kmerize_sequence(seq, k)
        if canonical:
            packed = codec.canonical_packed(packed, k)
        if blk and blk_rows + pad_to_block(nwin) > max_windows:
            yield finish(blk)
            blk, blk_rows = [], 0
        blk.append((si, np.asarray(packed), np.asarray(valid), nwin))
        blk_rows += pad_to_block(nwin)
    if blk:
        yield finish(blk)


class BFTAnnotation:
    """A decoded color set (reference ``BFT_annotation``): a genome bitmap."""

    __slots__ = ("bitmap", "nb_genomes")

    def __init__(self, bitmap: np.ndarray, nb_genomes: int):
        self.bitmap = np.asarray(bitmap, dtype=np.uint32)
        self.nb_genomes = nb_genomes

    def list_id_genomes(self) -> np.ndarray:
        """Sorted genome ids (reference get_list_id_genomes bft.c:622)."""
        bits = np.unpackbits(
            self.bitmap.view(np.uint8), bitorder="little")[: self.nb_genomes]
        return np.nonzero(bits)[0].astype(np.uint32)

    def count_id_genomes(self) -> int:
        return int(self.list_id_genomes().size)

    def presence_genome(self, gid: int) -> bool:
        if gid >= self.nb_genomes:
            return False
        return bool((self.bitmap[gid >> 5] >> (gid & 31)) & 1)


class ColoredDBG:
    _pending_stats = None  # class default: getters safe before __init__ runs

    def __init__(self, config: BFTConfig):
        self.config = config
        self.genome_names: list[str] = []
        w = config.words
        self.table = tbl.empty_table(config.initial_capacity, w)
        self.colors = tbl.empty_colors(config.initial_color_capacity,
                                       config.initial_dense_color_capacity,
                                       config.color_small_width, 1)
        self.bloom = bloom_ops.empty_bits(config.bloom_log2_bits)
        self._n = 0           # host mirror of table.n
        self._sd = 0          # host mirror of colors.sd (small classes)
        self._dd = 0          # host mirror of colors.dd (dense classes)
        self._small_full = 0  # live small classes at exactly S genomes
        # (the four mirrors above are draining properties: reading one
        # first fetches any stage-B stats still pending on device)
        self._genomes_since_compress = 0
        # Window-buffered insert state (tbl.PendingBuffer); created lazily on
        # the first insert so the chunk size can adapt to the input scale.
        # Rows from up to ``config.genome_window`` consecutive genomes share
        # ONE flush (the multi-genome window flush, tbl.flush_stage_a/b).
        self.buf = None
        self._buf_used = 0        # host-tracked rows in use
        self._chunk = None        # append chunk row size
        self._head_frac = None    # last flush's n_heads/used (split pick)
        self._last_heads = None   # last flush's n_heads (speculative A2 h)
        self._last_pairs = None   # last flush's n_pairs (speculative B
        #                           budget; BFT_SPEC_FLUSH=0 disables)
        self._window_start = None  # absolute gid of the window's 1st genome
        self._cur_gid = None      # open genome id (None between genomes)
        self._poisoned = False    # set if a flush contract check ever fails
        self._pending_stats = None  # (device stats, n_pairs) of the last
        #                             stage B, fetched lazily (one fewer
        #                             host<->device round trip per flush)
        self.marking_enabled = False
        # Streaming Pallas kernels need a TPU backend and TILE-aligned
        # capacity (pow2 >= 2048 is always TILE-aligned).
        self.use_pallas = jax.default_backend() == "tpu"
        self._warned_pallas = None  # capacity value last warned about

    def _pallas_eligible(self) -> bool:
        from bloomfiltertrie_tpu.ops import pallas_kernels as pk
        aligned = (self.table.capacity % pk.TILE == 0
                   and self.table.capacity >= pk.TILE)
        if self.use_pallas and not aligned \
                and self._warned_pallas != self.table.capacity:
            # Eligibility is re-evaluated per call: a later growth to a
            # TILE-aligned capacity re-enables the kernel.  Key the one-shot
            # warning on the offending capacity so a new misaligned capacity
            # warns again.
            self._warned_pallas = self.table.capacity
            warnings.warn(
                f"capacity {self.table.capacity} is not a multiple of the "
                f"Pallas TILE ({pk.TILE}); until the table grows to a "
                "TILE-aligned capacity, the streaming rank kernel is "
                "disabled and lookups fall back to the slower XLA bucketed "
                "search. Use a power-of-two capacity >= 2048.",
                RuntimeWarning, stacklevel=3)
        return self.use_pallas and aligned

    # ------------------------------------------------------------------
    # basics
    # ------------------------------------------------------------------
    @property
    def k(self) -> int:
        return self.config.k

    # Host count mirrors as DRAINING PROPERTIES: stage B's stats are
    # fetched lazily (self._pending_stats), so any host read of a mirror
    # must drain first.  Routing every read through these properties makes
    # staleness impossible by construction (no call-site audit).
    @property
    def _n(self) -> int:
        self._drain_stats()
        return self._n_host

    @_n.setter
    def _n(self, v):
        self._n_host = v

    @property
    def _sd(self) -> int:
        self._drain_stats()
        return self._sd_host

    @_sd.setter
    def _sd(self, v):
        self._sd_host = v

    @property
    def _dd(self) -> int:
        self._drain_stats()
        return self._dd_host

    @_dd.setter
    def _dd(self, v):
        self._dd_host = v

    @property
    def _small_full(self) -> int:
        self._drain_stats()
        return self._small_full_host

    @_small_full.setter
    def _small_full(self, v):
        self._small_full_host = v

    @property
    def nb_genomes(self) -> int:
        return len(self.genome_names)

    @property
    def nb_kmers(self) -> int:
        self.flush()
        return self._n

    @property
    def nb_color_classes(self) -> int:
        return self._sd + self._dd

    @property
    def _d(self) -> int:  # legacy alias: total class count
        return self._sd + self._dd

    # ------------------------------------------------------------------
    # capacity management (replaces the reference's realloc/burst logic)
    # ------------------------------------------------------------------
    def _ensure_table(self, extra: int):
        need = self._n + extra
        if need > self.table.capacity:
            self.table = tbl.grow_table(self.table, _next_pow2(need))

    def _ensure_colors(self, small_extra: int, dense_extra: int,
                       genomes: int | None = None):
        g = self.nb_genomes if genomes is None else genomes
        width = max(1, _next_pow2(math.ceil(max(g, 1) / 32)))
        need_s = self._sd + small_extra
        need_d = self._dd + dense_extra
        scap = self.colors.small_capacity
        dcap = self.colors.capacity
        if need_s > scap or need_d > dcap or width > self.colors.width:
            self.colors = tbl.grow_colors(
                self.colors,
                max(_next_pow2(need_s), scap),
                max(_next_pow2(max(need_d, 1)), dcap),
                max(width, self.colors.width))

    # ------------------------------------------------------------------
    # genome insertion (reference insert path, SURVEY §4.1)
    # ------------------------------------------------------------------
    def start_genome(self, name: str) -> int:
        """Open a new genome; id = insertion order (src/file_io.c:124-125).

        Pure host bookkeeping — no device call.  If the pending window would
        exceed ``config.genome_window`` genomes, the buffer flushes first
        (the flush's genome-set masks are ``genome_window`` bits wide).
        """
        gid = len(self.genome_names)
        if (self._window_start is not None
                and gid - self._window_start >= self.config.genome_window):
            self.flush()
        self.genome_names.append(name)
        self._ensure_colors(0, 0, genomes=gid + 1)
        self._cur_gid = gid
        return gid

    def _ensure_buffer(self, first_batch_rows: int):
        if self.buf is None:
            self._chunk = min(self.config.batch_size,
                              max(_next_pow2(first_batch_rows), 256))
            self.buf = tbl.empty_buffer(
                self.config.pending_runs * self._chunk, self.config.words)
            self._buf_used = 0

    def _append_chunk(self, chunk, vchunk):
        """Append one fixed-shape chunk of the CURRENT genome at the
        host-tracked offset (flushing first if the buffer would overflow —
        a mid-genome flush restarts the window at the current genome)."""
        if self._buf_used + chunk.shape[0] > self.buf.capacity:
            self.flush()
            self._ensure_buffer(chunk.shape[0])
        if self._window_start is None:
            self._window_start = self._cur_gid
        rel = self._cur_gid - self._window_start
        self.buf = tbl.buffer_append(
            self.buf, jnp.asarray(chunk), jnp.asarray(vchunk),
            jnp.asarray(rel, jnp.int32),
            jnp.asarray(self._buf_used, jnp.int32))
        self._buf_used += chunk.shape[0]

    def insert_kmers_packed(self, packed, valid=None, sync_stats: bool = True):
        """Insert packed k-mers [M, W] into the current genome, batched.

        Window-buffered fast path: each batch is a raw append into the
        pending buffer (three dynamic_update_slices — microseconds), tagged
        with the window-relative genome id; ALL insert work (dedup, probe,
        color update, merge) happens once per ``config.genome_window``
        genomes / full buffer in :meth:`flush`.  Every read API flushes
        first, so observable semantics are identical to immediate insertion
        (the reference's per-k-mer loop, src/insertNode.c:18).

        ``packed`` may be a NumPy array or a device-resident jax array (the
        latter avoids host->device transfer — important when PCIe/tunnel
        bandwidth is the bottleneck).  ``sync_stats`` is accepted for
        backward compatibility and ignored: the buffered path has no
        per-batch host sync or capacity hazard by construction.
        """
        del sync_stats
        if self._cur_gid is None:
            raise RuntimeError("call start_genome() before inserting k-mers")
        on_device = isinstance(packed, jax.Array)
        if not on_device:
            packed = np.asarray(packed, dtype=np.uint32)
        if valid is None:
            valid = (jnp if on_device else np).ones(packed.shape[0], dtype=bool)
        self._ensure_buffer(packed.shape[0])
        bsz = self._chunk
        n_in = packed.shape[0]
        # Bulk fast path: a device-resident batch appends in ONE dispatch
        # (pow2-padded to bound compiles; the per-chunk loop costs one
        # dispatch per chunk — ~25 ms each over a remote device link).
        # Gate on the PADDED size: capacity = pending_runs * chunk need not
        # be a power of two, so a batch that fits pre-padding could exceed
        # it post-padding and corrupt the dynamic_update_slice append.
        if on_device and _next_pow2(n_in) <= self.buf.capacity:
            pad = _next_pow2(n_in) - n_in
            if pad:
                packed = jnp.pad(packed, ((0, pad), (0, 0)))
                valid = jnp.pad(jnp.asarray(valid, dtype=bool), (0, pad))
            self._append_chunk(packed, valid)
            return
        for off in range(0, n_in, bsz):
            if on_device and off + bsz <= n_in:
                # Traced-offset slice: one compiled program for every offset
                # (a Python-int slice would compile per distinct offset).
                chunk = jax.lax.dynamic_slice_in_dim(
                    packed, jnp.asarray(off, jnp.int32), bsz)
                vchunk = jax.lax.dynamic_slice_in_dim(
                    valid, jnp.asarray(off, jnp.int32), bsz)
            else:
                xp = jnp if on_device else np
                chunk = packed[off: off + bsz]
                vchunk = valid[off: off + bsz]
                if chunk.shape[0] < bsz:  # pad for a stable jit shape
                    pad = bsz - chunk.shape[0]
                    chunk = xp.pad(chunk, ((0, pad), (0, 0)))
                    vchunk = xp.pad(vchunk, (0, pad))
            self._append_chunk(chunk, vchunk)

    def insert_genomes_bulk(self, names: list[str], packed, row_gid,
                            valid=None):
        """Register ``names`` and append ALL their rows in one device call.

        ``row_gid`` int[M]: per-row index into ``names`` (0-based).  The bulk
        analogue of the reference's per-genome file loop
        (insert_Genomes_from_KmerFiles src/file_io.c:89) for callers that
        already hold many genomes' k-mers device-resident — one dispatch
        ingests up to ``genome_window`` genomes.
        """
        if len(names) > self.config.genome_window:
            raise ValueError("insert_genomes_bulk: more names than "
                             "genome_window; split the call")
        base = len(self.genome_names)
        if (self._window_start is not None
                and base + len(names) - self._window_start
                > self.config.genome_window):
            self.flush()
        self.genome_names.extend(names)
        self._ensure_colors(0, 0, genomes=base + len(names))
        self._cur_gid = base + len(names) - 1
        packed = jnp.asarray(packed, dtype=jnp.uint32)
        n_in = packed.shape[0]
        if valid is None:
            valid = jnp.ones((n_in,), dtype=bool)
        self._ensure_buffer(n_in)
        if self._buf_used + n_in > self.buf.capacity:
            self.flush()
            self._ensure_buffer(n_in)
        if n_in > self.buf.capacity:
            raise ValueError("bulk batch exceeds buffer capacity; raise "
                             "pending_runs/batch_size or split the call")
        if self._window_start is None:
            self._window_start = base
        self.buf = tbl.buffer_append_rows(
            self.buf, packed, jnp.asarray(valid, dtype=bool),
            jnp.asarray(row_gid, dtype=jnp.int32),
            jnp.asarray(base - self._window_start, jnp.int32),
            jnp.asarray(self._buf_used, jnp.int32))
        self._buf_used += n_in
        self._genomes_since_compress += len(names)

    def _apply_flush_stats(self, st, n_pairs):
        self._n = int(st["n"])
        self._sd = int(st["sd"])
        self._dd = int(st["dd"])
        self._small_full = int(st["small_full"])
        if int(st["colored_small"]) + int(st["colored_dense"]) > n_pairs:
            # Detected only after stage B ran on donated buffers: the
            # in-memory index may be corrupt, so poison the instance — every
            # later flush (and hence every read API) refuses to proceed.
            self._poisoned = True
            raise RuntimeError(
                f"window-flush contract violated: "
                f"{int(st['colored_small']) + int(st['colored_dense'])} new "
                f"classes > {n_pairs} distinct pairs (corruption)")

    def _drain_stats(self):
        """Fetch the previous stage B's deferred stats (host mirrors +
        contract check).  Runs before any host code that consumes the
        mirrors — the start of every flush, including the early-return read
        barrier — so observable state is identical to the eager fetch, one
        round trip later."""
        if self._pending_stats is None:
            return
        stats, n_pairs = self._pending_stats
        self._pending_stats = None
        self._apply_flush_stats(jax.device_get(stats), n_pairs)

    def flush(self):
        """Flush the pending window into the table (read barrier).

        Once predictions from a previous flush exist, the whole flush
        dispatches with ZERO blocking host round trips: stage B runs
        speculatively on device copies at a predicted budget and the one
        scalar sync only verifies the exact contracts afterwards (see the
        comment at the speculation site below).

        Exact (first-flush) flow — three jitted stages
        (tbl.flush_stage_a1/a2/b) with two host syncs:
        stage A1 sorts the buffer, builds per-key genome-set masks, probes
        the table and counts the EXACT number of distinct keys (heads) and
        new keys; the host sizes the table and A2's compact width h from
        those counts; stage A2 compacts the head rows to h and group-sorts
        the distinct (class, mask) pairs — duplicate-heavy pan-genome
        windows run the whole pair machinery at h << T; stage B builds the
        child classes, rewrites color refs and merges — one fixed cost per
        ``genome_window`` genomes instead of per genome.
        """
        if self._poisoned:
            raise RuntimeError(
                "this ColoredDBG is unusable: a previous flush detected a "
                "capacity-contract violation after donated buffers were "
                "consumed (in-memory state may be corrupt); rebuild or "
                "reload from a checkpoint")
        if not self._buf_used or self.buf is None:
            self._drain_stats()
            return
        self._drain_stats()
        cfg = self.config
        g0 = self._window_start
        t_rows = self.buf.capacity
        used = self._buf_used
        # Speculative fusion: the compaction only pays when heads (distinct
        # keys) fill <= ~1/3 of the buffer (measured: a 0.89-ratio window
        # lost ~0.16 s to the extra pass + dispatch).  The exact ratio is
        # only known after stage A1, so predict from the LAST flush's
        # observed fraction: dense (or first-flush unknown) windows take the
        # fused single-program stage A — one dispatch, one sync, zero
        # compaction, bit-identical to the pre-split path — and
        # duplicate-heavy windows take the A1/A2 split.  A wrong guess
        # costs only time for one flush, never correctness, and the
        # fraction re-learns every flush.
        split = (self._head_frac is not None
                 and _next_pow2(max(int(self._head_frac * used * 1.25), 1024))
                 <= t_rows // 2)
        pallas = self._pallas_eligible()

        def dispatch_b(table, colors, bloom, groups, budget):
            return tbl.flush_stage_b(
                table, colors, bloom,
                skeys, groups["cls2"], groups["mask2"], groups["keep2"],
                groups["fidx2"], groups["src2"],
                jnp.asarray(g0, jnp.int32),
                cfg.bloom_log2_bits,
                jnp.asarray(cfg.bloom_seed1, dtype=jnp.uint32),
                jnp.asarray(cfg.bloom_seed2, dtype=jnp.uint32),
                budget=budget, window=cfg.genome_window,
                use_bloom=cfg.bloom_enabled,
                use_pallas=pallas)

        # SPECULATIVE stage B (zero host round trips per flush): when the
        # previous flush's counts are known, stage B is dispatched right
        # behind stage A at a budget predicted from the last flush — on
        # DEVICE COPIES of (table, colors, bloom), so the donating program
        # is reused (no extra compile) while the originals stay alive.  The
        # single scalar sync then VERIFIES the exact contracts (budget >=
        # n_pairs, table/pool headroom, and h >= n_heads on the split
        # path); a mis-prediction discards the speculative outputs and
        # reruns stage B exactly on the originals — time lost, never
        # correctness.  BFT_SPEC_FLUSH=0 disables the speculation.
        spec_b = (self._last_pairs is not None
                  and os.environ.get("BFT_SPEC_FLUSH", "1") != "0")
        h = t_rows
        if not split:
            a_out = tbl.flush_stage_a(
                self.table, self.buf,
                jnp.asarray(used, jnp.int32),
                window=cfg.genome_window,
                use_pallas=pallas)
            self.buf = None  # donated
            self._buf_used = 0
            self._window_start = None
            skeys = a_out["skeys"]
            groups = a_out
            scalars = (a_out["n_heads"], a_out["n_new"], a_out["n_pairs"])
        else:
            a1 = tbl.flush_stage_a1(
                self.table, self.buf,
                jnp.asarray(used, jnp.int32),
                window=cfg.genome_window,
                use_pallas=pallas)
            self.buf = None  # donated to stage A1
            self._buf_used = 0
            self._window_start = None
            skeys = a1["skeys"]
            if self._last_heads is not None:
                # SPECULATIVE h: dispatch A2 at a width predicted from the
                # last flush without waiting for A1's scalars — the A1 sync
                # and A2 sync collapse into one round trip (~20-25 ms each
                # over a tunneled link).  A2 does not donate here, so a
                # mis-prediction (n_heads > h) just reruns it at the exact
                # width — time lost, never correctness.
                h = min(_next_pow2(max(int(self._last_heads * 1.25), 1024)),
                        t_rows)
                groups = tbl.flush_stage_a2_spec(
                    self.table.color_ref, a1["keep_key"], a1["masks"],
                    a1["fidx"], h=h, use_pallas=pallas)
                scalars = (a1["n_heads"], a1["n_new"], groups["n_pairs"])
            else:
                groups = None
                spec_b = False
                scalars = None
        spec_out = None
        if spec_b and groups is not None:
            budget_pred = max(1024, _next_pow2(max(self._last_pairs, 1)))
            spec_out = dispatch_b(
                jax.tree_util.tree_map(lambda x: x.copy(), self.table),
                jax.tree_util.tree_map(lambda x: x.copy(), self.colors),
                self.bloom.copy(), groups, budget_pred)
        if scalars is not None:
            n_heads, n_new, n_pairs = (int(x) for x in
                                       jax.device_get(scalars))
        else:
            # first flush of the split path: exact two-sync flow
            n_heads, n_new = (int(x) for x in jax.device_get(
                (a1["n_heads"], a1["n_new"])))
            self._ensure_table(n_new)
            h = min(_next_pow2(max(n_heads, 1024)), t_rows)
            groups = tbl.flush_stage_a2(
                self.table.color_ref, a1["keep_key"], a1["masks"],
                a1["fidx"], h=h, use_pallas=pallas)
            n_pairs = int(jax.device_get(groups["n_pairs"]))
        self._head_frac = n_heads / max(used, 1)
        self._last_heads = n_heads
        budget = max(1024, _next_pow2(max(n_pairs, 1)))
        spec_ok = (
            spec_out is not None
            and n_heads <= h
            and budget_pred >= n_pairs
            and self.table.capacity - self._n >= n_new
            and self.colors.small_capacity - self._sd >= n_pairs
            and self.colors.capacity - self._dd >= n_pairs)
        if spec_ok:
            self.table, self.colors, self.bloom, stats = spec_out
        else:
            spec_out = None  # discard mispredicted outputs (copies donated)
            if split and n_heads > h:
                # the speculative A2 dropped heads past h, so its n_pairs is
                # an undercount — rerun at the exact width and re-sync
                h = min(_next_pow2(max(n_heads, 1024)), t_rows)
                groups = tbl.flush_stage_a2(
                    self.table.color_ref, a1["keep_key"], a1["masks"],
                    a1["fidx"], h=h, use_pallas=pallas)
                n_pairs = int(jax.device_get(groups["n_pairs"]))
                budget = max(1024, _next_pow2(max(n_pairs, 1)))
            self._ensure_table(n_new)
            # Each distinct (class, mask) pair spawns at most one child
            # class, in either pool — the stage-A count makes the contract
            # exact.
            self._ensure_colors(n_pairs, n_pairs)
            self.table, self.colors, self.bloom, stats = dispatch_b(
                self.table, self.colors, self.bloom, groups, budget)
        self._last_pairs = n_pairs
        self._pending_stats = (stats, n_pairs)
        if _debug_invariants():
            self._check_invariants()
        if (cfg.treshold_compression > 0 and
                self._genomes_since_compress >= cfg.treshold_compression):
            self.compress_colors()

    def sync_counts(self):
        """Refresh host count mirrors after deferred-sync insertion."""
        self.flush()
        self._n = int(jax.device_get(self.table.n))
        self._sd = int(jax.device_get(self.colors.sd))
        self._dd = int(jax.device_get(self.colors.dd))
        self._small_full = int(jax.device_get(
            tbl.count_small_full(self.colors)))

    def _check_invariants(self):
        """Debug mode (BFT_DEBUG_INVARIANTS=1): verify structural contracts.

        SURVEY §5 "race detection/sanitizers" row: sortedness of the key
        table, sentinel padding, and color_ref range — the invariants the
        reference enforces via its ERROR aborts (include/useful_macros.h:33).
        """
        self.flush()  # no-op when called from flush() itself (buffer empty)
        keys = np.asarray(jax.device_get(self.table.keys))
        n = self._n
        live = keys[:n]
        as_tuple = [tuple(row) for row in live]
        if as_tuple != sorted(as_tuple):
            raise AssertionError("invariant violated: table keys not sorted")
        if len(set(as_tuple)) != n:
            raise AssertionError("invariant violated: duplicate keys")
        if not (keys[n:] == 0xFFFFFFFF).all():
            raise AssertionError("invariant violated: non-sentinel padding")
        cref = np.asarray(jax.device_get(self.table.color_ref))[:n]
        dense = (cref & tbl.DENSE_TAG) != 0
        if n and not (cref >= 0).all():
            raise AssertionError("invariant violated: negative color_ref")
        if n and not ((cref[~dense] < self._sd).all()
                      and ((cref[dense] & ~tbl.DENSE_TAG) < self._dd).all()):
            raise AssertionError(
                "invariant violated: color_ref out of pool range")
        ids = np.asarray(jax.device_get(self.colors.ids))[: self._sd]
        live = ids != tbl.EMPTY_ID
        # EMPTY_ID is INT32_MAX, so ascending row order also proves padding
        # trails the live ids.
        if self._sd and not (np.diff(ids.astype(np.int64), axis=1) >= 0).all():
            raise AssertionError(
                "invariant violated: small color rows not sorted")
        if self._sd and not live[:, 0].all():
            raise AssertionError("invariant violated: empty small class")

    def end_genome(self):
        """Close the current genome (host bookkeeping only).

        The reference compresses annotations every ``treshold_compression``
        genomes (src/file_io.c:192-193, Node.h:116); here the dictionary
        dedup is observationally invisible (classes are interned ids), so it
        is DEFERRED to the next window flush — per-genome work stays zero.
        """
        self._cur_gid = None
        self._genomes_since_compress += 1

    def insert_genome(self, name: str, packed: np.ndarray,
                      valid: np.ndarray | None = None):
        self.start_genome(name)
        self.insert_kmers_packed(packed, valid)
        self.end_genome()

    def insert_kmer_strings(self, name: str, kmers: list[str]):
        packed, valid = codec.encode_strings(kmers, self.k)
        self.insert_genome(name, packed, valid)

    def compress_colors(self):
        # Must flush first: the dedup walks table.color_ref, which does not
        # cover pending buffered rows yet.  (flush() itself calls back in at
        # the compression cadence — at that point the buffer is empty and
        # the inner flush is a no-op, so there is no recursion.)
        self.flush()
        self.table, self.colors, stats = tbl.compress_colors(
            self.table, self.colors)
        pend = self._pending_stats
        self._pending_stats = None
        if pend is not None:
            # one round trip fetches the deferred flush stats AND ours
            st_p, st = jax.device_get((pend[0], stats))
            self._apply_flush_stats(st_p, pend[1])
        else:
            st = jax.device_get(stats)
        self._sd = int(st["sd"])
        self._dd = int(st["dd"])
        self._small_full = int(st["small_full"])
        self._genomes_since_compress = 0

    # ------------------------------------------------------------------
    # point queries
    # ------------------------------------------------------------------
    def query_kmers_packed(self, packed, valid=None,
                           use_bloom_prefilter: bool = False):
        """(found bool[M], color bitmaps uint32[M, cw]) for packed queries.

        ``use_bloom_prefilter`` masks Bloom-negative queries before the exact
        search (reference probe order, src/presenceNode.c:1335-1362).
        Results are identical either way (the Bloom filter has no false
        negatives); on TPU the streaming rank kernel is already cheaper than
        two random-gather probes, so this is off by default — it exists for
        parity and for miss-heavy workloads on gather-friendly backends.
        """
        self.flush()
        packed = jnp.asarray(packed, dtype=jnp.uint32)
        if valid is None:
            valid = jnp.ones(packed.shape[0], dtype=bool)
        else:
            valid = jnp.asarray(valid, dtype=bool)
        if use_bloom_prefilter and self.config.bloom_enabled:
            cfg = self.config
            maybe = bloom_ops.probe(
                self.bloom, packed, cfg.bloom_log2_bits,
                jnp.asarray(cfg.bloom_seed1, dtype=jnp.uint32),
                jnp.asarray(cfg.bloom_seed2, dtype=jnp.uint32))
            valid = valid & maybe
        found, _, _, bitmap = _query_colors(
            self.table.keys, self.table.n, self.table.bucket_starts,
            self.table.color_ref, self.colors, packed, valid,
            use_pallas=self._pallas_eligible())
        return np.asarray(found), np.asarray(bitmap)

    def query_kmers_device(self, packed, valid=None,
                           queries_sorted: bool = False,
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Device-resident variant of :meth:`query_kmers_packed`.

        Returns (found bool[M], bitmap uint32[M, cw]) as jax arrays WITHOUT
        transferring them to the host — the production path when results
        feed further device work (set ops, counts, routing).  The
        transfer-inclusive wrapper costs ~4*cw+1 bytes/query of host
        bandwidth, which dominates end-to-end query time over slow links.

        ``queries_sorted=True`` promises rows ascend (invalid rows sorted
        to the end as sentinel) — the streaming rank kernel then runs with
        NO M-row sort in front and NO unsort scatter behind (the common
        bulk case: extraction-ordered, routed, or pre-sorted batches).
        """
        self.flush()
        packed = jnp.asarray(packed, dtype=jnp.uint32)
        if valid is None:
            valid = jnp.ones(packed.shape[0], dtype=bool)
        else:
            valid = jnp.asarray(valid, dtype=bool)
        found, _, _, bitmap = _query_colors(
            self.table.keys, self.table.n, self.table.bucket_starts,
            self.table.color_ref, self.colors, packed, valid,
            use_pallas=self._pallas_eligible(),
            queries_sorted=queries_sorted)
        return found, bitmap

    def contains(self, kmer: str) -> bool:
        self.flush()
        packed, valid = codec.encode_strings([kmer], self.k)
        found, _ = _presence_only(self.table.keys, self.table.n,
                                  self.table.bucket_starts,
                                  jnp.asarray(packed), jnp.asarray(valid),
                                  use_pallas=self._pallas_eligible())
        return bool(jax.device_get(found)[0])

    def get_colors(self, kmer: str) -> BFTAnnotation | None:
        """Reference get_annotation (bft.c:363): None if k-mer absent."""
        packed, valid = codec.encode_strings([kmer], self.k)
        found, bitmap = self.query_kmers_packed(packed, np.asarray(valid))
        if not found[0]:
            return None
        return BFTAnnotation(bitmap[0], self.nb_genomes)

    def export_color_rows(self) -> tuple[np.ndarray, np.ndarray]:
        """Host export: (bitmap rows uint32[d, cw], unified cref int32[n]).

        Classes are unified into one id space [small pool | dense pool] with
        small classes expanded to bitmaps — the bridge for host-side
        consumers (merge, snippets) that want a flat dictionary.  O(d*cw)
        host memory; fine for offline maintenance, not for config-5 hot
        paths (those use the device pools directly).
        """
        from bloomfiltertrie_tpu.models import colors_codec
        self.flush()
        sd, dd = self._sd, self._dd
        cw = self.colors.width
        ids = np.asarray(jax.device_get(self.colors.ids))[:sd]
        small_rows = colors_codec.ids_rows_to_bitmaps(ids, cw)
        dense_rows = np.asarray(jax.device_get(self.colors.rows))[:dd]
        rows = np.concatenate([small_rows, dense_rows]) if sd + dd else \
            np.zeros((0, cw), np.uint32)
        cref = np.asarray(jax.device_get(self.table.color_ref))[: self._n]
        dense = (cref & tbl.DENSE_TAG) != 0
        unified = np.where(cref < 0, -1,
                           np.where(dense, (cref & ~tbl.DENSE_TAG) + sd, cref))
        return rows, unified.astype(np.int32)

    def get_color_csr(self):
        """CSR view of the class dictionary: (offsets int64[d+1], ids int32).

        Class c's genome ids are ``ids[offsets[c]:offsets[c+1]]``, sorted —
        the decoded form of the reference's mode-2 lists
        (src/annotation.c:2086 get_id_genomes_from_annot), batch-exported.
        Class order is the unified [small pool | dense pool] space of
        :meth:`export_color_rows`.
        """
        from bloomfiltertrie_tpu.models import colors_codec
        rows, _ = self.export_color_rows()
        d = rows.shape[0]
        bits = colors_codec.unpack_rows(rows, max(self.nb_genomes, 1))
        cls, gid = np.nonzero(bits)
        counts = np.bincount(cls, minlength=d)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        return offsets, gid.astype(np.int32)

    # annotation set ops (reference intersection/union/sym_difference_annotations)
    def annotation_intersection(self, *annots: BFTAnnotation) -> BFTAnnotation:
        out = annots[0].bitmap.copy()
        for a in annots[1:]:
            out &= a.bitmap
        return BFTAnnotation(out, self.nb_genomes)

    def annotation_union(self, *annots: BFTAnnotation) -> BFTAnnotation:
        out = annots[0].bitmap.copy()
        for a in annots[1:]:
            out |= a.bitmap
        return BFTAnnotation(out, self.nb_genomes)

    def annotation_sym_difference(self, *annots: BFTAnnotation) -> BFTAnnotation:
        out = annots[0].bitmap.copy()
        for a in annots[1:]:
            out ^= a.bitmap
        return BFTAnnotation(out, self.nb_genomes)

    # ------------------------------------------------------------------
    # sequence query (reference query_sequence bft.c:1241)
    # ------------------------------------------------------------------
    def query_sequence(self, sequence: str | bytes, threshold: float,
                       canonical_search: bool | None = None,
                       chunk_windows: int = 16384) -> np.ndarray:
        """Genome ids whose k-mer hit count >= ceil(threshold * (L-k+1)).

        Early abort (reference bft.c:1283-1320), batched: windows are scanned
        in device-sized chunks and the scan stops as soon as every genome is
        decided — its count already reached the threshold, or the remaining
        windows cannot lift it there.  Observationally identical to the full
        count; for long low-hit queries it skips most of the scan.

        ``canonical_search=None`` uses ``config.canonical``.
        """
        if not (0 < threshold <= 1):
            raise ValueError("threshold must be in (0, 1]")
        if canonical_search is None:
            canonical_search = self.config.canonical
        seq = sequence.encode() if isinstance(sequence, str) else sequence
        nb_windows = len(seq) - self.k + 1
        if nb_windows <= 0:
            return np.zeros((0,), dtype=np.uint32)
        need = math.ceil(nb_windows * threshold)
        packed, valid = codec.kmerize_sequence(seq, self.k)
        if canonical_search:
            packed = codec.canonical_packed(packed, self.k)
        g = self.nb_genomes
        counts = np.zeros((max(g, 1),), dtype=np.int64)
        done = 0
        for off in range(0, nb_windows, chunk_windows):
            hi = min(off + chunk_windows, nb_windows)
            # Pad to the next power of two: one compiled program per size
            # class instead of one per distinct sequence length.
            s = hi - off
            pad = _next_pow2(s) - s
            chunk_p = np.pad(packed[off:hi], ((0, pad), (0, 0)))
            valid_p = np.pad(valid[off:hi], (0, pad))
            _, bitmap = self.query_kmers_packed(chunk_p, valid_p)
            counts += np.asarray(
                _color_counts(jnp.asarray(bitmap)))[: counts.shape[0]]
            done = hi
            remaining = nb_windows - done
            decided = (counts[:g] >= need) | (counts[:g] + remaining < need)
            if decided.all():
                break  # early abort: no remaining window changes the answer
        hits = np.nonzero(counts[:g] >= need)[0]
        return hits.astype(np.uint32)

    def query_sequences_batch(self, sequences, threshold: float,
                              canonical_search: bool | None = None,
                              max_windows: int = 1 << 20) -> np.ndarray:
        """Score MANY sequences in one device program per block.

        Returns uint8[S, nb_genomes]: row s, genome j = 1 iff >=
        ceil(threshold * (L_s - k + 1)) of sequence s's k-mers are present
        with color j — identical semantics (incl. IUPAC-window and
        empty-sequence zero rows) to per-sequence :meth:`query_sequence`,
        but the reference's per-sequence probe loop (src/bft.c:1241,
        src/file_io.c:1464) becomes ONE membership+color+segment-count
        program over the concatenated windows of up to ``max_windows``
        rows — the TPU-first shape for bulk sequence classification.
        """
        if not (0 < threshold <= 1):
            raise ValueError("threshold must be in (0, 1]")
        if canonical_search is None:
            canonical_search = self.config.canonical
        self.flush()
        g = self.nb_genomes
        rows = np.zeros((len(sequences), max(g, 1)), dtype=np.uint8)
        block = _seq_block_size(self.k, sequences)
        for sis, packed, valid, starts, ends, nwins in _seq_batch_blocks(
                self.k, self.config.words, sequences, canonical_search,
                max_windows, block):
            counts = np.asarray(jax.device_get(_seq_query_counts(
                self.table.keys, self.table.n, self.table.bucket_starts,
                self.table.color_ref, self.colors,
                jnp.asarray(packed), jnp.asarray(valid),
                jnp.asarray(starts), jnp.asarray(ends),
                use_pallas=self._pallas_eligible(), block=block)))
            need = np.ceil(nwins * threshold).astype(np.int64)
            hit = counts[: len(sis), : rows.shape[1]] >= need[:, None]
            rows[np.asarray(sis)] = hit.astype(np.uint8)
        return rows[:, :g] if g else rows[:, :0]

    # ------------------------------------------------------------------
    # graph topology (reference branchingNode.c / presenceNode.c)
    # ------------------------------------------------------------------
    def neighbor_presence_packed(self, packed, valid=None):
        self.flush()
        packed = jnp.asarray(packed, dtype=jnp.uint32)
        if valid is None:
            valid = jnp.ones(packed.shape[0], dtype=bool)
        else:
            valid = jnp.asarray(valid, dtype=bool)
        sf, si, pf, pi = graph_ops.neighbor_presence(
            self.table.keys, self.table.n, self.table.bucket_starts,
            packed, valid, self.k, use_pallas=self._pallas_eligible())
        return (np.asarray(sf), np.asarray(si), np.asarray(pf), np.asarray(pi))

    def successors(self, kmer: str) -> list[str]:
        packed, valid = codec.encode_strings([kmer], self.k)
        sf, _, _, _ = self.neighbor_presence_packed(packed, np.asarray(valid))
        succ, _ = graph_ops.neighbor_candidates(jnp.asarray(packed), self.k)
        cands = np.asarray(succ)[0]
        return [codec.decode_strings(cands[b:b + 1], self.k)[0]
                for b in range(4) if sf[0, b]]

    def predecessors(self, kmer: str) -> list[str]:
        packed, valid = codec.encode_strings([kmer], self.k)
        _, _, pf, _ = self.neighbor_presence_packed(packed, np.asarray(valid))
        _, pred = graph_ops.neighbor_candidates(jnp.asarray(packed), self.k)
        cands = np.asarray(pred)[0]
        return [codec.decode_strings(cands[b:b + 1], self.k)[0]
                for b in range(4) if pf[0, b]]

    def neighbors(self, kmer: str) -> list[str]:
        return self.predecessors(kmer) + self.successors(kmer)

    def neighbors_with_colors_packed(self, packed, valid=None):
        """Batched neighbors WITH their color bitmaps, one round trip.

        Reference parity: ``get_neighbors`` (src/bft.c:804) returns 4-slot
        BFT_kmer records per direction whose annotations are immediately
        queryable (the container pointers travel with the result,
        src/branchingNode.c:112) — here the annotation decode is fused into
        the same device program as the membership probe.

        Returns a dict with, per direction ('succ', 'pred'):
          found  bool[M, 4], packed uint32[M, 4, W], bitmap uint32[M, 4, cw].
        """
        self.flush()
        packed = jnp.asarray(packed, dtype=jnp.uint32)
        m = packed.shape[0]
        w = packed.shape[1]
        if valid is None:
            valid = jnp.ones((m,), dtype=bool)
        else:
            valid = jnp.asarray(valid, dtype=bool)
        succ, pred = graph_ops.neighbor_candidates(packed, self.k)
        cand = jnp.concatenate([succ.reshape(m * 4, w),
                                pred.reshape(m * 4, w)])
        cvalid = jnp.concatenate([jnp.repeat(valid, 4)] * 2)
        found, _, _, bitmap = _query_colors(
            self.table.keys, self.table.n, self.table.bucket_starts,
            self.table.color_ref, self.colors, cand, cvalid,
            use_pallas=self._pallas_eligible())
        cw = bitmap.shape[1]
        found = np.asarray(found)
        bitmap = np.asarray(bitmap)
        return {
            "succ": {"found": found[: m * 4].reshape(m, 4),
                     "packed": np.asarray(succ),
                     "bitmap": bitmap[: m * 4].reshape(m, 4, cw)},
            "pred": {"found": found[m * 4:].reshape(m, 4),
                     "packed": np.asarray(pred),
                     "bitmap": bitmap[m * 4:].reshape(m, 4, cw)},
        }

    def neighbors_with_colors(self, kmer: str):
        """Single-k-mer convenience over the batched variant: two lists
        (successors, predecessors) of (kmer_str, BFTAnnotation)."""
        packed, valid = codec.encode_strings([kmer], self.k)
        out = self.neighbors_with_colors_packed(packed, np.asarray(valid))
        res = []
        for d in ("succ", "pred"):
            lst = []
            for b in range(4):
                if out[d]["found"][0, b]:
                    s = codec.decode_strings(
                        out[d]["packed"][0, b:b + 1], self.k)[0]
                    lst.append((s, BFTAnnotation(out[d]["bitmap"][0, b],
                                                 self.nb_genomes)))
            res.append(lst)
        return res[0], res[1]

    def branching_count_packed(self, packed, valid=None) -> int:
        """Count branching query k-mers (reference file_io.c:943-948)."""
        self.flush()
        packed = jnp.asarray(packed, dtype=jnp.uint32)
        if valid is None:
            valid = jnp.ones(packed.shape[0], dtype=bool)
        else:
            valid = jnp.asarray(valid, dtype=bool)
        mask = graph_ops.branching_mask(
            self.table.keys, self.table.n, self.table.bucket_starts,
            packed, valid, self.k, use_pallas=self._pallas_eligible())
        return int(jax.device_get(jnp.sum(mask.astype(jnp.int32))))

    # ------------------------------------------------------------------
    # iteration / extraction (reference iterate_over_kmers bft.c:1051)
    # ------------------------------------------------------------------
    def extract_kmers_packed(self) -> np.ndarray:
        """All k-mers, sorted, packed [n, W].  (Set-equal to reference DFS.)"""
        self.flush()
        return np.asarray(jax.device_get(self.table.keys))[: self._n]

    def extract_kmer_strings(self) -> list[str]:
        return codec.decode_strings(self.extract_kmers_packed(), self.k)

    def iterate_over_kmers(self, fn, chunk: int = 65536):
        """Call ``fn(kmer_str, annotation, flag)`` for every k-mer.

        Early-termination contract (reference ``iterate_over_kmers``
        doc block, src/bft.c:1051, and ``prefix_matching`` src/bft.c:1096):
        if ``fn`` returns a FALSY value other than None (e.g. 0 or False,
        matching the C "returns 0" convention), the walk stops immediately.
        A plain Python callback that returns nothing (None) iterates to the
        end, so set-building lambdas keep working unchanged.

        Host-side per-k-mer Python callback loop — parity with the
        reference's callback iteration (bft.c:1051), NOT a device-scale
        path: at millions of rows prefer the batched exports
        (:meth:`extract_kmers_packed`, :meth:`export_color_rows`,
        :meth:`color_counts`) which do the same work as dense array ops.
        """
        self.flush()
        for off in range(0, self._n, chunk):
            hi = min(off + chunk, self._n)
            keys = np.asarray(self.table.keys[off:hi])
            cls = self.table.color_ref[off:hi]
            flags = np.asarray(self.table.flags[off:hi])
            rows = np.asarray(tbl.class_bitmap(self.colors, cls))
            strs = codec.decode_strings(keys, self.k)
            for i, s in enumerate(strs):
                r = fn(s, BFTAnnotation(rows[i], self.nb_genomes),
                       int(flags[i]))
                if r is not None and not r:
                    return

    def color_counts(self) -> np.ndarray:
        """Genome count of every k-mer's class, table order, int32[n] —
        the batched core/dispensable/singleton predicate input
        (reference snippets.c:10,35,60)."""
        self.flush()
        return np.asarray(jax.device_get(_color_counts_per_kmer(
            self.table.color_ref, self.colors, self.table.n)))[: self._n]

    def has_genome_mask(self, genome_id: int) -> jnp.ndarray:
        """Device bool[cap]: row's class contains ``genome_id`` (the color-
        subgraph eligibility mask, reference BFS_subgraph snippets.c:667)."""
        self.flush()
        return _has_genome_per_kmer(self.table.color_ref, self.colors,
                                    self.table.n,
                                    jnp.asarray(genome_id, jnp.int32))

    def _prefix_range(self, prefix: str) -> tuple[int, int]:
        """Row range [lo, hi) of k-mers with the given prefix (sorted order
        makes it contiguous: [prefix+A..A, prefix+T..T])."""
        self.flush()
        p = len(prefix)
        if p > self.k:
            raise ValueError("prefix longer than k")
        lo_s = prefix + "A" * (self.k - p)
        hi_s = prefix + "T" * (self.k - p)
        packed, valid = codec.encode_strings([lo_s, hi_s], self.k)
        if not valid.all():
            raise ValueError("prefix contains non-ACGT characters")
        lo = int(jax.device_get(ss.searchsorted(
            self.table.keys, jnp.asarray(packed[:1]), side="left"))[0])
        hi = int(jax.device_get(ss.searchsorted(
            self.table.keys, jnp.asarray(packed[1:]), side="right"))[0])
        return lo, min(hi, self._n)

    def prefix_matching(self, prefix: str,
                        with_annotations: bool = False):
        """Packed k-mers with the given prefix (reference bft.c:1096).

        With ``with_annotations=True``, also returns the color bitmaps
        uint32[m, cw] and flags uint8[m] of the matched rows — the batched
        form of the reference's (k-mer, annotation) prefix callbacks
        (``iterate_over_prefixes`` src/extract_kmers.c:599,
        ``v_prefix_matching_custom`` src/presenceNode.c:2451).
        """
        lo, hi = self._prefix_range(prefix)
        keys = np.asarray(self.table.keys[lo:hi])
        if not with_annotations:
            return keys
        cls = self.table.color_ref[lo:hi]
        bitmaps = np.asarray(tbl.class_bitmap(self.colors, cls))
        flags = np.asarray(self.table.flags[lo:hi])
        return keys, bitmaps, flags

    def iterate_over_prefix(self, prefix: str, fn, chunk: int = 65536):
        """Call ``fn(kmer_str, BFTAnnotation, flag)`` for every k-mer with
        the given prefix (reference iterate_over_prefixes
        src/extract_kmers.c:599) — callback parity; batched callers should
        prefer :meth:`prefix_matching` with annotations.

        Early-termination contract as :meth:`iterate_over_kmers` (reference
        src/bft.c:1096): a non-None falsy return stops the walk."""
        lo, hi = self._prefix_range(prefix)
        for off in range(lo, hi, chunk):
            top = min(off + chunk, hi)
            keys = np.asarray(self.table.keys[off:top])
            cls = self.table.color_ref[off:top]
            rows = np.asarray(tbl.class_bitmap(self.colors, cls))
            flags = np.asarray(self.table.flags[off:top])
            for i, s in enumerate(codec.decode_strings(keys, self.k)):
                r = fn(s, BFTAnnotation(rows[i], self.nb_genomes),
                       int(flags[i]))
                if r is not None and not r:
                    return

    # ------------------------------------------------------------------
    # marking (reference src/marking.c 2-bit flag planes)
    # ------------------------------------------------------------------
    def set_marking(self):
        self.marking_enabled = True

    def unset_marking(self):
        self.marking_enabled = False
        self.table.flags = jnp.zeros_like(self.table.flags)

    def set_flags_packed(self, packed, flag: int, valid=None):
        self.flush()
        if not (0 <= flag <= 3):
            raise ValueError("flags are 2-bit (4 states), like marking.c")
        packed = jnp.asarray(packed, dtype=jnp.uint32)
        if valid is None:
            valid = jnp.ones(packed.shape[0], dtype=bool)
        else:
            valid = jnp.asarray(valid, dtype=bool)
        found, idx = _presence_only(self.table.keys, self.table.n,
                                    self.table.bucket_starts, packed, valid,
                                    use_pallas=self._pallas_eligible())
        dest = jnp.where(found, idx, self.table.capacity)
        self.table.flags = self.table.flags.at[dest].set(
            jnp.uint8(flag), mode="drop")

    def get_flags_packed(self, packed, valid=None) -> np.ndarray:
        self.flush()
        packed = jnp.asarray(packed, dtype=jnp.uint32)
        if valid is None:
            valid = jnp.ones(packed.shape[0], dtype=bool)
        else:
            valid = jnp.asarray(valid, dtype=bool)
        found, idx = _presence_only(self.table.keys, self.table.n,
                                    self.table.bucket_starts, packed, valid,
                                    use_pallas=self._pallas_eligible())
        return np.asarray(jnp.where(found, self.table.flags[idx], 0))

    # ------------------------------------------------------------------
    # subgraph (reference create_cdbg_from_bft_kmers bft.c:1353)
    # ------------------------------------------------------------------
    def subgraph(self, packed, add_colors: bool = True) -> "ColoredDBG":
        packed = np.asarray(packed, dtype=np.uint32)
        found, bitmap = self.query_kmers_packed(packed)
        keep = packed[found]
        sub = ColoredDBG(self.config)
        if add_colors:
            bm = bitmap[found]
            # Re-insert per genome so ids rebuild in the same insertion order.
            for gid, name in enumerate(self.genome_names):
                has = ((bm[:, gid >> 5] >> np.uint32(gid & 31)) & 1) == 1
                sub.insert_genome(name, keep[has])
        else:
            sub.insert_genome("subgraph", keep)
        return sub

    # ------------------------------------------------------------------
    # persistence (reference write_BFT_Root/read_BFT_Root write_to_disk.c:21,260)
    # ------------------------------------------------------------------
    def save(self, path: str):
        """Checkpoint: keys/refs/flags + the color dictionary in compact
        best-mode encodings (models/colors_codec.py — the reference's
        annotation modes 0/1/2 applied at the serialization boundary).
        Classes serialize in unified [small pool | dense pool] order;
        color_ref is rebased into that space."""
        from bloomfiltertrie_tpu.models import colors_codec
        self.flush()
        n, sd, dd = self._n, self._sd, self._dd
        ids = np.asarray(jax.device_get(self.colors.ids))[:sd]
        dense_rows = np.asarray(jax.device_get(self.colors.rows))[:dd]
        enc = colors_codec.encode_hybrid(ids, dense_rows,
                                         max(self.nb_genomes, 1))
        cref = np.asarray(self.table.color_ref)[:n]
        dense = (cref & tbl.DENSE_TAG) != 0
        unified = np.where(cref < 0, -1,
                           np.where(dense, (cref & ~tbl.DENSE_TAG) + sd, cref))
        np.savez_compressed(
            path if path.endswith(".npz") else path + ".npz",
            keys=np.asarray(self.table.keys)[:n],
            color_ref=unified.astype(np.int32),
            flags=np.asarray(self.table.flags)[:n],
            color_modes=enc["modes"], color_offsets=enc["offsets"],
            color_data=enc["data"],
            bloom=np.asarray(self.bloom),
            manifest=np.frombuffer(json.dumps({
                "config": self.config.to_dict(),
                "genome_names": self.genome_names,
                "n": n, "d": sd + dd, "cw": self.colors.width,
            }).encode(), dtype=np.uint8),
        )

    @classmethod
    def load(cls, path: str) -> "ColoredDBG":
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        z = np.load(path)
        manifest = json.loads(z["manifest"].tobytes().decode())
        config = BFTConfig.from_dict(manifest["config"])
        self = cls(config)
        self.genome_names = list(manifest["genome_names"])
        # sharded checkpoints (parallel/sharded.py save) carry no "n" — the
        # global key tensor's row count is it; either engine loads either
        # format (the CLI's --shards flag picks the engine, not the file).
        n, d = manifest.get("n", int(z["keys"].shape[0])), manifest["d"]
        cap = max(_next_pow2(n), config.initial_capacity)
        w = config.words
        keys = np.full((cap, w), 0xFFFFFFFF, dtype=np.uint32)
        keys[:n] = z["keys"]
        flags = np.zeros((cap,), dtype=np.uint8)
        flags[:n] = z["flags"]
        from bloomfiltertrie_tpu.models import colors_codec
        g = max(len(manifest["genome_names"]), 1)
        s_w = config.color_small_width
        cw = manifest.get("cw", 1)
        if "rows" in z:  # legacy uncompressed dictionary
            rows_all = z["rows"] if d else np.zeros((0, 1), np.uint32)
            ids_p, rows_p, remap = colors_codec.pools_from_bitmap_rows(
                rows_all, g, s_w)
            cw = rows_all.shape[1] if d else 1
        else:
            ids_p, rows_p, remap = colors_codec.decode_to_pools(
                {"modes": z["color_modes"], "offsets": z["color_offsets"],
                 "data": z["color_data"]}, g, s_w, cw)
        sd, dd = ids_p.shape[0], rows_p.shape[0]
        scap = max(_next_pow2(max(sd, 1)), config.initial_color_capacity)
        dcap = max(_next_pow2(max(dd, 1)),
                   config.initial_dense_color_capacity)
        ids_full = np.full((scap, s_w), tbl.EMPTY_ID, dtype=np.int32)
        ids_full[:sd] = ids_p
        rows_full = np.zeros((dcap, cw), dtype=np.uint32)
        rows_full[:dd] = rows_p
        cref_in = z["color_ref"]
        if n and (np.asarray(cref_in)[:n] >= max(d, 1)).any():
            raise ValueError(
                "corrupt checkpoint: color_ref out of range "
                f"(max {int(np.asarray(cref_in)[:n].max())} >= d={d})")
        cref = np.full((cap,), -1, dtype=np.int32)
        cref[:n] = np.where(cref_in < 0, -1,
                            remap[np.maximum(cref_in, 0)] if d else -1)
        keys_d = jnp.asarray(keys)
        n_d = jnp.asarray(n, dtype=jnp.int32)
        self.table = tbl.KmerTable(
            keys=keys_d, color_ref=jnp.asarray(cref),
            flags=jnp.asarray(flags), n=n_d,
            bucket_starts=ss.build_bucket_starts(keys_d, n_d))
        self.colors = tbl.ColorStore(
            ids=jnp.asarray(ids_full), rows=jnp.asarray(rows_full),
            sd=jnp.asarray(sd, dtype=jnp.int32),
            dd=jnp.asarray(dd, dtype=jnp.int32))
        if "bloom" in z:
            self.bloom = jnp.asarray(z["bloom"])
        else:  # sharded checkpoint: the plane is layout-dependent — rebuild
            self.bloom = bloom_ops.add(
                bloom_ops.empty_bits(config.bloom_log2_bits), keys_d,
                jnp.arange(cap, dtype=jnp.int32) < n_d,
                config.bloom_log2_bits,
                jnp.asarray(config.bloom_seed1, dtype=jnp.uint32),
                jnp.asarray(config.bloom_seed2, dtype=jnp.uint32))
        self._n, self._sd, self._dd = n, sd, dd
        self._small_full = int(np.sum(
            (ids_p != tbl.EMPTY_ID).sum(axis=1) == s_w)) if sd else 0
        return self

    # ------------------------------------------------------------------
    # observability (reference printMemory.c / getRSS.c)
    # ------------------------------------------------------------------
    def class_size_stats(self) -> dict:
        """Per-class-size structure stats (reference printMemory.c:68: the
        per-container-class counts and "biggest annotation" diagnostic).

        Returns {"biggest_class": int, "histogram": np.ndarray} where
        histogram[s] = number of live color classes with exactly s genomes.
        """
        self.flush()
        sd, dd = self._sd, self._dd
        sizes = []
        if sd:
            ids = np.asarray(jax.device_get(self.colors.ids))[:sd]
            sizes.append((ids != tbl.EMPTY_ID).sum(axis=1))
        if dd:
            rows = np.ascontiguousarray(
                np.asarray(jax.device_get(self.colors.rows))[:dd])
            bits = np.unpackbits(rows.view(np.uint8), axis=1,
                                 bitorder="little")
            sizes.append(bits.sum(axis=1))
        if not sizes:
            return {"biggest_class": 0,
                    "histogram": np.zeros((1,), dtype=np.int64)}
        allsz = np.concatenate(sizes).astype(np.int64)
        return {"biggest_class": int(allsz.max()),
                "histogram": np.bincount(allsz)}

    def memory_stats(self) -> dict:
        self.flush()
        t, c = self.table, self.colors
        bytes_colors = c.ids.size * 4 + c.rows.size * 4
        css = self.class_size_stats()
        return {
            "biggest_class": css["biggest_class"],
            "class_size_histogram": css["histogram"],
            "nb_kmers": self._n,
            "nb_color_classes": self._d,
            "nb_small_classes": self._sd,
            "nb_dense_classes": self._dd,
            "nb_genomes": self.nb_genomes,
            "table_capacity": t.capacity,
            "color_small_capacity": c.small_capacity,
            "color_capacity": c.capacity,
            "bytes_keys": t.keys.size * 4,
            "bytes_color_ref": t.color_ref.size * 4,
            "bytes_flags": t.flags.size,
            "bytes_colors_small": c.ids.size * 4,
            "bytes_colors_dense": c.rows.size * 4,
            "bytes_colors": bytes_colors,
            "bytes_bloom": self.bloom.size * 4,
            "bytes_total": (t.keys.size * 4 + t.color_ref.size * 4
                            + t.flags.size + bytes_colors
                            + self.bloom.size * 4),
        }
