"""The sorted k-mer table — TPU-native replacement for the burst trie.

The reference stores k-mers in a trie of compressed/uncompressed containers
(``Node`` include/Node.h:55-58, ``CC`` include/CC.h, ``UC`` include/UC.h) and
walks pointers per k-mer.  Here the whole shard is **one sorted, sentinel
-padded tensor of packed k-mer keys** plus parallel payload columns:

  keys      uint32[cap, W]   sorted rows; empty rows = 0xFFFFFFFF sentinel
  color_ref int32[cap]       color-class id per k-mer (models/colors.py)
  flags     uint8[cap]       2-bit marking states (reference src/marking.c)
  n         int32 scalar     number of live rows

Insertion becomes: sort+unique the batch, split found/new by batched binary
search, update color classes for found rows, rank-merge new rows — each step a
dense XLA op over the entire batch (SURVEY §7 design stance).  The UC->CC
"burst" (src/insertNode.c:196-223 -> transform2CC src/CC.c:40) has no analogue
because the table is always in its "burst" (sorted, packed) form; capacity
growth (host-side doubling) replaces pointer reallocation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bloomfiltertrie_tpu.ops import bloom as bloom_ops
from bloomfiltertrie_tpu.ops import sortedset as ss

# numpy scalar: module import must stay backend-free (see ops/sortedset.py)
INT32_MAX = np.int32(2**31 - 1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KmerTable:
    keys: jnp.ndarray           # uint32[cap, W]
    color_ref: jnp.ndarray      # int32[cap]
    flags: jnp.ndarray          # uint8[cap]
    n: jnp.ndarray              # int32 scalar
    bucket_starts: jnp.ndarray  # int32[65537]: prefix index (ops/sortedset)

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def words(self) -> int:
        return self.keys.shape[1]


def empty_table(capacity: int, words: int) -> KmerTable:
    return KmerTable(
        keys=jnp.full((capacity, words), ss.SENTINEL, dtype=jnp.uint32),
        color_ref=jnp.full((capacity,), -1, dtype=jnp.int32),
        flags=jnp.zeros((capacity,), dtype=jnp.uint8),
        n=jnp.zeros((), dtype=jnp.int32),
        bucket_starts=jnp.zeros((ss.NB_BUCKETS + 1,), dtype=jnp.int32),
    )


def grow_table(table: KmerTable, new_capacity: int) -> KmerTable:
    pad = new_capacity - table.capacity
    return KmerTable(
        keys=jnp.concatenate([
            table.keys,
            jnp.full((pad, table.words), ss.SENTINEL, dtype=jnp.uint32)]),
        color_ref=jnp.pad(table.color_ref, (0, pad), constant_values=-1),
        flags=jnp.pad(table.flags, (0, pad)),
        n=table.n,
        bucket_starts=table.bucket_starts,
    )


# Class-reference tag: refs with bit 30 set index the dense bitmap pool,
# untagged refs index the small id-list pool.  (Caps each pool at 2^30
# classes; INT32_MAX stays the "no class / masked" sentinel — always test
# liveness before the tag, since INT32_MAX has bit 30 set too.)
DENSE_TAG = 1 << 30
EMPTY_ID = 2**31 - 1  # empty slot sentinel in small-pool id rows


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ColorStore:
    """Hybrid dictionary of color classes: small id-lists + dense bitmaps.

    This is the TPU redesign of the reference's annotation engine
    (src/annotation.c): every k-mer holds a pointer (color_ref) into one
    deduplicated dictionary (the reference's mode 3, ``compute_best_mode``
    src/annotation.c:416), and the dictionary itself keeps each class in the
    cheaper of two fixed-shape device forms — the in-memory analogue of the
    reference's per-annotation mode selection:

      * small pool ``ids`` int32[scap, S]: classes with <= S genomes as
        sorted genome-id rows padded with EMPTY_ID (mode 2, the sorted id
        list, src/annotation.c:20-156) — S*4 bytes/class regardless of G;
      * dense pool ``rows`` uint32[dcap, cw]: classes with > S genomes as
        presence bitmaps (mode 0) — ceil(G/32)*4 bytes/class.

    The split is canonical (a class lives in the small pool iff its size is
    <= S), so per-pool dedup is global dedup.  At pan-genome scale (G=1000,
    cw=32) the overwhelming majority of *distinct* classes are small
    (mutation-private k-mers), so memory is bounded by S words/class instead
    of G/32 — the property the reference gets from its byte encodings
    (src/annotation.c:416) and that makes config 5 fit in HBM.

    Per-genome insertion appends ``old | {g}`` classes without dedup (the
    greedy-local phase); :func:`compress_colors` dedups both pools — the
    JudySL compression analogue (``compress_annotations_disk``
    src/file_io.c:3-76, ``sort_annotations3`` src/annotation.c:1396) without
    the disk round trip.  Frequency ordering of the reference dictionary only
    shortened its varint pointers; with fixed int32 refs it is irrelevant.

    Invariant: small-pool rows are sorted ascending with EMPTY_ID padding.
    The insert path preserves it for free — genome ids are assigned in
    insertion order (src/file_io.c:124-125), so the added id is always the
    row maximum and lands in the first empty slot.
    """

    ids: jnp.ndarray   # int32[scap, S] sorted genome ids, EMPTY_ID padded
    rows: jnp.ndarray  # uint32[dcap, cw]: class c bit g => genome g present
    sd: jnp.ndarray    # int32 scalar: number of small classes
    dd: jnp.ndarray    # int32 scalar: number of dense classes

    @property
    def small_capacity(self) -> int:
        return self.ids.shape[0]

    @property
    def small_width(self) -> int:
        return self.ids.shape[1]

    @property
    def capacity(self) -> int:
        return self.rows.shape[0]

    @property
    def width(self) -> int:
        return self.rows.shape[1]


def empty_colors(small_capacity: int, dense_capacity: int,
                 small_width: int = 8, width: int = 1) -> ColorStore:
    return ColorStore(
        ids=jnp.full((small_capacity, small_width), EMPTY_ID, dtype=jnp.int32),
        rows=jnp.zeros((dense_capacity, width), dtype=jnp.uint32),
        sd=jnp.zeros((), dtype=jnp.int32),
        dd=jnp.zeros((), dtype=jnp.int32))


def grow_colors(colors: ColorStore, new_small_capacity: int,
                new_dense_capacity: int, new_width: int) -> ColorStore:
    return ColorStore(
        ids=jnp.pad(colors.ids,
                    ((0, new_small_capacity - colors.small_capacity), (0, 0)),
                    constant_values=EMPTY_ID),
        rows=jnp.pad(colors.rows,
                     ((0, new_dense_capacity - colors.capacity),
                      (0, new_width - colors.width))),
        sd=colors.sd, dd=colors.dd)


def append_singleton_class(colors: ColorStore, genome_id
                           ) -> tuple[ColorStore, jnp.ndarray]:
    """Create the class {genome_id} in the small pool; returns (colors, id)."""
    g = jnp.asarray(genome_id, dtype=jnp.int32)
    row = jnp.full((colors.small_width,), EMPTY_ID, dtype=jnp.int32)
    row = row.at[0].set(g)
    ids = jax.lax.dynamic_update_slice(colors.ids, row[None, :],
                                       (colors.sd, 0))
    return dataclasses.replace(colors, ids=ids, sd=colors.sd + 1), colors.sd


def ids_to_bitmap(ids: jnp.ndarray, cw: int) -> jnp.ndarray:
    """Expand small-pool id rows int32[m, S] -> uint32 bitmaps [m, cw].

    Compare-select construction: OR over S id slots of a one-hot word mask
    — S*cw fused elementwise VPU ops, NO scatters.  (A scatter-add variant
    measured ~100 ms per 1M rows on TPU — random-index scatters are
    latency-bound; these dense compares are bandwidth-bound and fuse.)
    """
    m, s_w = ids.shape
    word = ids >> 5                                        # [m, S]
    bit = jnp.where(ids != EMPTY_ID,
                    jnp.uint32(1) << (ids & 31).astype(jnp.uint32),
                    jnp.uint32(0))                         # [m, S]
    cols = jnp.arange(cw, dtype=jnp.int32)[None, :]        # [1, cw]
    out = jnp.zeros((m, cw), dtype=jnp.uint32)
    for s in range(s_w):   # [m, cw] per step; never an [m, S, cw] buffer
        out = out | jnp.where(word[:, s:s + 1] == cols,
                              bit[:, s:s + 1], jnp.uint32(0))
    return out


def class_has_genome(colors: ColorStore, cls: jnp.ndarray, g) -> jnp.ndarray:
    """Per-query genome membership: cls int32[m] (tagged, -1/INT32_MAX =
    none) -> bool[m].  The batched ``is_genome_present``
    (src/annotation.c:20)."""
    g = jnp.asarray(g, dtype=jnp.int32)
    valid = (cls >= 0) & (cls != INT32_MAX)
    is_dense = valid & ((cls & DENSE_TAG) != 0)
    is_small = valid & ~is_dense
    srow = colors.ids[jnp.where(is_small, cls, 0)]
    small_has = jnp.any(srow == g, axis=-1)
    word = colors.rows[jnp.where(is_dense, cls & ~DENSE_TAG, 0),
                       g >> 5]
    dense_has = ((word >> (g & 31).astype(jnp.uint32)) & 1) == 1
    return jnp.where(is_dense, dense_has, small_has & is_small)


def class_bitmap(colors: ColorStore, cls: jnp.ndarray) -> jnp.ndarray:
    """Materialize color bitmaps for tagged class refs: [m] -> uint32[m, cw].

    The batched decoder of the query path (reference
    ``get_id_genomes_from_annot`` src/annotation.c:2086): dense classes
    gather their row, small classes expand their id list on the fly.
    """
    cw = colors.rows.shape[1]
    valid = (cls >= 0) & (cls != INT32_MAX)
    is_dense = valid & ((cls & DENSE_TAG) != 0)
    is_small = valid & ~is_dense
    dense_bm = jnp.where(is_dense[:, None],
                         colors.rows[jnp.where(is_dense, cls & ~DENSE_TAG, 0)],
                         0)
    scap = colors.ids.shape[0]
    if cls.shape[0] >= scap:
        # Bulk batches: expand the WHOLE small pool once (scap*S*cw VPU
        # ops) and gather rows — per-row work drops from S*cw elementwise
        # ops to one [cw]-row gather (profile: 50 -> ~10 ms per 1M rows,
        # scripts/profile_seqquery.py).  Cheaper than per-row expansion
        # whenever m >= scap; both branches are exact.
        small_bits = ids_to_bitmap(colors.ids, cw)          # [scap, cw]
        small_bm = jnp.where(is_small[:, None],
                             small_bits[jnp.where(is_small, cls, 0)],
                             jnp.uint32(0))
    else:
        srow = jnp.where(is_small[:, None],
                         colors.ids[jnp.where(is_small, cls, 0)], EMPTY_ID)
        small_bm = ids_to_bitmap(srow, cw)
    return dense_bm | small_bm


def class_sizes(colors: ColorStore, cls: jnp.ndarray) -> jnp.ndarray:
    """Number of genomes in each class: tagged refs [m] -> int32[m]."""
    valid = (cls >= 0) & (cls != INT32_MAX)
    is_dense = valid & ((cls & DENSE_TAG) != 0)
    is_small = valid & ~is_dense
    srow = colors.ids[jnp.where(is_small, cls, 0)]
    small_n = jnp.sum((srow != EMPTY_ID).astype(jnp.int32), axis=-1)
    drow = colors.rows[jnp.where(is_dense, cls & ~DENSE_TAG, 0)]
    dense_n = jnp.sum(jax.lax.population_count(drow).astype(jnp.int32),
                      axis=-1)
    return jnp.where(is_dense, dense_n, jnp.where(is_small, small_n, 0))


def segment_bit_counts(bitmap: jnp.ndarray, starts: jnp.ndarray,
                       ends: jnp.ndarray, block: int = 1) -> jnp.ndarray:
    """Per-segment per-genome-bit counts over contiguous row segments.

    ``counts[s, g]`` = number of rows in ``[starts[s], ends[s])`` of
    ``bitmap`` (uint32[m, cw]) with genome bit ``g`` set — the count core of
    the batched sequence query (reference scores one sequence at a time,
    src/bft.c:1241; here S sequences' concatenated windows score in one
    pass).  Contiguous segments need no scatter: counts read off an
    exclusive cumulative sum at the boundaries.

    ``block > 1`` requires every boundary to be a multiple of ``block``
    (the host batcher pads each sequence's windows with invalid rows, which
    contribute zero): bits are summed within blocks first, so the
    cumulative-sum chain runs over m/block rows instead of m — measured
    113 -> ~30 ms per 1M x 1024-bit rows (scripts/profile_seqquery.py).
    """
    m, cw = bitmap.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    outs = []
    if block > 1:
        nb = m // block
        blk = bitmap.reshape(nb, block, cw)
        for c in range(cw):
            bits = ((blk[:, :, c][:, :, None] >> shifts[None, None, :]) & 1
                    ).astype(jnp.int32)
            part = jnp.sum(bits, axis=1)                       # [nb, 32]
            cum = jnp.concatenate(
                [jnp.zeros((1, 32), jnp.int32), jnp.cumsum(part, axis=0)])
            outs.append(cum[ends // block] - cum[starts // block])
    else:
        for c in range(cw):
            bits = ((bitmap[:, c: c + 1] >> shifts[None, :]) & 1
                    ).astype(jnp.int32)
            cum = jnp.concatenate(
                [jnp.zeros((1, 32), jnp.int32), jnp.cumsum(bits, axis=0)])
            outs.append(cum[ends] - cum[starts])
    return jnp.concatenate(outs, axis=1)


def count_small_full(colors: ColorStore) -> jnp.ndarray:
    """Number of live small classes at exactly S genomes (the only classes
    that can overflow into the dense pool on the next flush) — the host uses
    this for the dense-pool capacity contract."""
    scap, s_w = colors.ids.shape
    live = jnp.arange(scap, dtype=jnp.int32) < colors.sd
    counts = jnp.sum((colors.ids != EMPTY_ID).astype(jnp.int32), axis=1)
    return jnp.sum((live & (counts == s_w)).astype(jnp.int32))


# ---------------------------------------------------------------------------
# Multi-genome window flush.
#
# A per-genome flush pays the full fixed cost — batch sort, probe, color
# update, capacity-sized merge — once per genome.  A pan-genome build of
# many SMALL genomes (BASELINE config 5: 1000 strains) would therefore pay
# ~1000 fixed costs; the reference's per-genome loop
# (insert_Genomes_from_KmerFiles src/file_io.c:89) has no such fixed cost
# because its work is per-k-mer.
#
# The window flush amortizes: rows from up to ``window`` consecutive genomes
# accumulate in ONE flat buffer, each row tagged with its window-relative
# genome id, and a single flush inserts them all.  Each distinct k-mer in the
# buffer carries a ``window``-bit mask of the genomes that contain it (its
# "suffix genome set"); each distinct (existing class, mask) pair spawns at
# most one child class ``old | mask-genomes`` — the multi-genome
# generalization of ``modify_annotations`` (src/retrieveAnnotation.c:232)
# with the same per-class no-op rule (src/retrieveAnnotation.c:278) applied
# per genome bit.
#
# Window invariant (holds by construction, used for sorted small rows): at
# flush time every EXISTING class contains only genome ids <= g0, the
# absolute id of the window's first genome — a flush always drains the whole
# buffer, so ids > g0 can only have been introduced by this window's own
# rows.  Appended ids are >= g0 and already-present ids are excluded by the
# mask, so appending in mask-bit order preserves the sorted-row invariant.
#
# The flush runs in two jitted stages with one host sync between them:
# stage A (cheap, not donated) counts the exact number of distinct
# (class, mask) pairs and new keys, so the host can size pools/table and a
# per-class work budget EXACTLY — no capacity-contract guesswork; stage B
# (donating) does the per-class work at budget size and the merge.
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PendingBuffer:
    """Flat buffer of raw (key, window-relative genome id) rows.

    The row count in use is HOST-tracked (appends happen at host-known
    offsets), so there is no device scalar to sync.  Keys MAY repeat within
    and across genomes — the flush sort deduplicates (key, gid) pairs.
    """

    keys: jnp.ndarray   # uint32[cap, W] raw rows
    gid: jnp.ndarray    # int32[cap] window-relative genome id (< window)
    valid: jnp.ndarray  # bool[cap]

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]


def empty_buffer(capacity: int, words: int) -> PendingBuffer:
    return PendingBuffer(
        keys=jnp.full((capacity, words), ss.SENTINEL, dtype=jnp.uint32),
        gid=jnp.zeros((capacity,), dtype=jnp.int32),
        valid=jnp.zeros((capacity,), dtype=bool),
    )


def buffer_append_impl(buf: PendingBuffer, keys: jnp.ndarray,
                       valid: jnp.ndarray, gid_rel: jnp.ndarray,
                       offset: jnp.ndarray) -> PendingBuffer:
    """Append one batch at ``offset`` with a SCALAR relative genome id."""
    m = keys.shape[0]
    return PendingBuffer(
        keys=jax.lax.dynamic_update_slice(buf.keys, keys, (offset, 0)),
        gid=jax.lax.dynamic_update_slice(
            buf.gid, jnp.full((m,), gid_rel, dtype=jnp.int32), (offset,)),
        valid=jax.lax.dynamic_update_slice(buf.valid, valid, (offset,)),
    )


buffer_append = functools.partial(jax.jit, donate_argnums=(0,))(
    buffer_append_impl)


def buffer_append_rows_impl(buf: PendingBuffer, keys: jnp.ndarray,
                            valid: jnp.ndarray, gid_rel: jnp.ndarray,
                            base_rel: jnp.ndarray,
                            offset: jnp.ndarray) -> PendingBuffer:
    """Append a MULTI-genome batch: per-row ids ``gid_rel + base_rel`` in one
    device call — the bulk ingestion path (one dispatch per many genomes,
    which matters on high-latency device links)."""
    return PendingBuffer(
        keys=jax.lax.dynamic_update_slice(buf.keys, keys, (offset, 0)),
        gid=jax.lax.dynamic_update_slice(
            buf.gid, gid_rel.astype(jnp.int32) + base_rel, (offset,)),
        valid=jax.lax.dynamic_update_slice(buf.valid, valid, (offset,)),
    )


buffer_append_rows = functools.partial(jax.jit, donate_argnums=(0,))(
    buffer_append_rows_impl)


def _probe_main(table: KmerTable, skeys, svalid, use_pallas: bool):
    """Membership+row of a KEY-SORTED batch against the main table.

    The TPU path streams the whole table once through the Pallas rank kernel
    (ops/pallas_kernels.py, density-adaptive chunking) — random gathers are
    latency-bound on TPU, so the streaming pass beats the bucketed binary
    search by ~10x at scale.  The XLA path (CPU tests) uses the
    prefix-bucketed search, whose bucket index is valid because probes
    always run against the last merged table state.
    """
    if use_pallas:
        from bloomfiltertrie_tpu.ops import pallas_kernels as pk
        found, rank = pk.rank_sorted(table.keys, table.n, skeys, svalid)
        idx = jnp.minimum(rank, table.capacity - 1)
    else:
        found, idx = ss.lookup(table.keys, table.n, skeys, table.bucket_starts)
        found = found & svalid
    return found, idx


def _suffix_segment_or(head: jnp.ndarray, bits: tuple):
    """Per-row OR of ``bits`` over [row .. end of row's run].

    ``head`` marks run starts in a sorted array; at a head row the result is
    the full run's OR.  Implemented as a log-step shift-OR (Hillis-Steele
    over suffixes with a run-id guard) — pure elementwise/slice ops, no
    gathers/scatters (an associative_scan variant produced a recursive
    program the TPU compile helper choked on at T~20M).

    Rounds are bounded by the LONGEST RUN, not T: shifts >= the longest
    run change nothing, and runs are key-multiplicity (how often one
    (key, *) row repeats in the window buffer) — e.g. a 128-genome
    pan-genome window needs ceil(log2 128) = 7 rounds, not log2 T = 23.
    One cummax pass computes the bound and a while_loop stops there
    (measured: the fixed-round scan was ~295 ms of a 9.4M-row config-5
    flush — the single largest stage).
    """
    t_rows = head.shape[0]
    run = jnp.cumsum(head.astype(jnp.int32))   # run id per row (monotonic)
    iota = jnp.arange(t_rows, dtype=jnp.int32)
    last_head = jax.lax.cummax(jnp.where(head, iota, -1))
    maxrun = jnp.max(iota - last_head) + 1     # all-invalid => t_rows: safe

    def cond(state):
        s, _ = state
        return s < maxrun

    def body(state):
        s, vals = state
        in_range = iota + s < t_rows
        run_s = jnp.roll(run, -s)
        same = in_range & (run_s == run)
        new = tuple(v | jnp.where(same, jnp.roll(v, -s), 0) for v in vals)
        return s * 2, new

    _, vals = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, jnp.int32), tuple(bits)))
    return vals


def flush_sort1(buf: PendingBuffer, used: jnp.ndarray, window: int):
    """Sort 1 of the window flush: order buffer rows by (key words..., gid).

    Invalid rows mask to sentinel keys AND gid = window, so they sort after
    every valid row — including a genuine all-T key (sentinel bit pattern
    when k == 16*W), whose gid is < window; validity is recovered from the
    gid column downstream, saving a whole sort operand.

    Split out of stage A so the SHARDED flush can route rows to owner
    shards BETWEEN the local sort and the rest of stage A
    (parallel/sharded.py — sorted order is shard order, so routing needs no
    extra sort of its own).  Returns (skeys [T, W], sgid [T]).
    """
    t_rows, w = buf.keys.shape
    live = buf.valid & (jnp.arange(t_rows, dtype=jnp.int32) < used)
    masked = jnp.where(live[:, None], buf.keys,
                       jnp.full_like(buf.keys, ss.SENTINEL))
    gid_m = jnp.where(live, buf.gid, window)
    out = jax.lax.sort(tuple(masked[:, i] for i in range(w)) + (gid_m,),
                       num_keys=w + 1)
    return jnp.stack(out[:w], axis=-1), out[w]


def flush_stage_a_sorted(table: KmerTable, skeys: jnp.ndarray,
                         sgid: jnp.ndarray, window: int,
                         use_pallas: bool = False):
    """Stage A of the window flush AFTER sort 1: mask-build, probe,
    pair-group sort.  ``skeys``/``sgid`` must be globally sorted by
    (key, gid) with invalid rows as (sentinel, gid == window).

    Returns a dict of T-sized arrays consumed by stage B plus two exact
    scalars the host syncs: ``n_pairs`` (distinct (class, mask) pairs — the
    per-class work budget and the upper bound on new classes per pool) and
    ``n_new`` (new distinct keys — the exact table growth).
    """
    t_rows, w = skeys.shape
    mw = window // 32
    svalid = sgid < window
    key_bound = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        ~ss.mw_equal(skeys[1:], skeys[:-1])])
    keep_key = key_bound & svalid                     # head of each key run
    pair_bound = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        key_bound[1:] | (sgid[1:] != sgid[:-1])])
    keep_pair = pair_bound & svalid                   # distinct (key, gid)

    # Per-key suffix genome mask: OR of (1 << gid) over the key's run, read
    # at the run head via a reversed segmented scan.
    bits = tuple(
        jnp.where(keep_pair & ((sgid >> 5) == j),
                  jnp.uint32(1) << (sgid & 31).astype(jnp.uint32),
                  jnp.uint32(0))
        for j in range(mw))
    masks = _suffix_segment_or(keep_key, bits)

    found, idx = _probe_main(table, skeys, svalid, use_pallas)
    found = found & keep_key

    # Group key of each head row: (existing class | -1 if new, mask).
    # Non-head/invalid rows get class INT32_MAX and sort last.  ``found``
    # rides in the top bit of the idx payload (table rows < 2^31) — one
    # fewer 4B sort operand.
    cls = jnp.where(keep_key,
                    jnp.where(found, table.color_ref[idx], -1),
                    INT32_MAX)
    mask_h = tuple(jnp.where(keep_key, mj, jnp.uint32(0)) for mj in masks)
    fidx = idx.astype(jnp.uint32) | (found.astype(jnp.uint32) << 31)
    pos1 = jnp.arange(t_rows, dtype=jnp.int32)
    out2 = jax.lax.sort((cls,) + mask_h + (fidx, pos1), num_keys=1 + mw)
    cls2 = out2[0]
    mask2 = jnp.stack(out2[1:1 + mw], axis=-1)
    fidx2 = out2[1 + mw]
    src2 = out2[2 + mw]
    pair_neq = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        (cls2[1:] != cls2[:-1]) | jnp.any(mask2[1:] != mask2[:-1], axis=-1)])
    keep2 = pair_neq & (cls2 != INT32_MAX)
    n_pairs = jnp.sum(keep2.astype(jnp.int32))
    n_new = jnp.sum((keep_key & ~found).astype(jnp.int32))
    n_heads = jnp.sum(keep_key.astype(jnp.int32))
    return {"skeys": skeys, "cls2": cls2, "mask2": mask2, "keep2": keep2,
            "fidx2": fidx2, "src2": src2,
            "n_pairs": n_pairs, "n_new": n_new, "n_heads": n_heads}


def flush_stage_a_impl(table: KmerTable, buf: PendingBuffer,
                       used: jnp.ndarray, window: int,
                       use_pallas: bool = False):
    """Stage A of the window flush: sort 1 + mask-build, probe, pair sort."""
    skeys, sgid = flush_sort1(buf, used, window)
    return flush_stage_a_sorted(table, skeys, sgid, window,
                                use_pallas=use_pallas)


flush_stage_a = functools.partial(
    jax.jit, static_argnames=("window", "use_pallas"), donate_argnums=(1,)
)(flush_stage_a_impl)


# ---------------------------------------------------------------------------
# Split stage A: A1 (mask-build + probe + exact head/new counts) then A2
# (compact the head rows to a HOST-SIZED h, group-sort at h).
#
# Rationale (VERDICT r4 next #2): only the head rows — one per distinct key
# — carry information into the pair machinery, yet the single-program stage
# A group-sorts ALL T buffer rows with the non-heads riding along as
# INT32_MAX.  Duplicate-heavy pan-genome windows (BASELINE config 5: ~9.4M
# rows over ~1.6M distinct keys) pay ~6x the necessary sort-2 width, and
# stage B then pays T-sized group broadcasts and a T-row unsort.  The split
# syncs the exact head count after A1, compacts the heads to
# h = next_pow2(n_heads) rows (Pallas stream compaction at bandwidth on
# TPU), and everything downstream of the compaction runs at h.
# ---------------------------------------------------------------------------

def flush_stage_a1_sorted(table: KmerTable, skeys: jnp.ndarray,
                          sgid: jnp.ndarray, window: int,
                          use_pallas: bool = False):
    """Mask-build + probe over the sorted rows; exact counts for the host.

    Returns T-sized per-row columns consumed by stage A2 (``keep_key``,
    ``masks`` [T, mw], ``fidx``) plus ``skeys`` (stage B's merge input) and
    two scalars to sync: ``n_heads`` (distinct keys — sizes A2's compact
    arrays) and ``n_new`` (new distinct keys — exact table growth).
    """
    t_rows, w = skeys.shape
    mw = window // 32
    svalid = sgid < window
    key_bound = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        ~ss.mw_equal(skeys[1:], skeys[:-1])])
    keep_key = key_bound & svalid
    pair_bound = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        key_bound[1:] | (sgid[1:] != sgid[:-1])])
    keep_pair = pair_bound & svalid
    bits = tuple(
        jnp.where(keep_pair & ((sgid >> 5) == j),
                  jnp.uint32(1) << (sgid & 31).astype(jnp.uint32),
                  jnp.uint32(0))
        for j in range(mw))
    masks = _suffix_segment_or(keep_key, bits)
    found, idx = _probe_main(table, skeys, svalid, use_pallas)
    found = found & keep_key
    fidx = idx.astype(jnp.uint32) | (found.astype(jnp.uint32) << 31)
    mask_h = jnp.stack(
        [jnp.where(keep_key, mj, jnp.uint32(0)) for mj in masks], axis=-1)
    n_heads = jnp.sum(keep_key.astype(jnp.int32))
    n_new = jnp.sum((keep_key & ~found).astype(jnp.int32))
    return {"skeys": skeys, "keep_key": keep_key, "masks": mask_h,
            "fidx": fidx, "n_heads": n_heads, "n_new": n_new}


def flush_stage_a1_impl(table: KmerTable, buf: PendingBuffer,
                        used: jnp.ndarray, window: int,
                        use_pallas: bool = False):
    skeys, sgid = flush_sort1(buf, used, window)
    return flush_stage_a1_sorted(table, skeys, sgid, window,
                                 use_pallas=use_pallas)


flush_stage_a1 = functools.partial(
    jax.jit, static_argnames=("window", "use_pallas"), donate_argnums=(1,)
)(flush_stage_a1_impl)


def flush_stage_a1_masked(table: KmerTable, skeys: jnp.ndarray,
                          masks: jnp.ndarray, valid: jnp.ndarray,
                          use_pallas: bool = False):
    """Stage A1 for rows that ALREADY carry their window-genome masks.

    The device-side index merge (models/merge.py merge_into_sharded) feeds
    b's DISTINCT sorted keys with masks computed straight from b's color
    classes — no (k-mer, genome) pair expansion ever exists, on host or
    device (VERDICT r4 #6).  ``skeys`` must be sorted with invalid rows as
    sentinel at the end; keys unique among valid rows.  Rows whose mask is
    all-zero carry no window genome and drop out (their genomes live in
    another window).  Returns the same dict as flush_stage_a1_sorted.
    """
    svalid = valid & jnp.any(masks != 0, axis=-1)
    found, idx = _probe_main(table, skeys, valid, use_pallas)
    found = found & svalid
    fidx = idx.astype(jnp.uint32) | (found.astype(jnp.uint32) << 31)
    mask_h = jnp.where(svalid[:, None], masks, jnp.uint32(0))
    n_heads = jnp.sum(svalid.astype(jnp.int32))
    n_new = jnp.sum((svalid & ~found).astype(jnp.int32))
    return {"skeys": skeys, "keep_key": svalid, "masks": mask_h,
            "fidx": fidx, "n_heads": n_heads, "n_new": n_new}


def flush_stage_a2_impl(color_ref: jnp.ndarray, keep_key: jnp.ndarray,
                        masks: jnp.ndarray, fidx: jnp.ndarray,
                        h: int, use_pallas: bool = False):
    """Compact the head rows to ``h`` slots and group-sort by (class, mask).

    Caller contract: ``h`` >= the n_heads scalar A1 reported (heads past
    ``h`` would be silently dropped).  When ``h == t_rows`` the compaction
    is skipped entirely and the group sort runs over all rows with
    non-heads riding as INT32_MAX — bit-identical to the fused stage A (the
    right call for low-duplication windows, where compaction buys nothing).
    Returns h-sized group arrays for stage B plus the exact ``n_pairs``.
    """
    t_rows, mw = masks.shape
    cap = color_ref.shape[0]
    if h >= t_rows:
        h = t_rows
        live_c = keep_key
        mask_c = masks
        fidx_c = fidx
        src_c = jnp.arange(t_rows, dtype=jnp.int32)
    else:
        from bloomfiltertrie_tpu.ops import pallas_kernels as pk
        if use_pallas and t_rows % pk.MTILE == 0:
            dead = (~keep_key).astype(jnp.uint32)
            core = jnp.concatenate([
                dead[None],
                masks.T,
                fidx[None],
                jnp.arange(t_rows, dtype=jnp.int32).astype(jnp.uint32)[None],
            ], axis=0)
            c_c = pk._tile_channels(mw + 4)
            stacked = jnp.concatenate(
                [pk._pad_channels(core, c_c - 1), dead[None]], axis=0)
            out, _ = pk.compact_rows(stacked)
            live_c = out[0, :h] == 0
            mask_c = out[1:1 + mw, :h].T
            fidx_c = out[1 + mw, :h]
            src_c = jnp.where(live_c, out[2 + mw, :h].astype(jnp.int32),
                              t_rows)
        else:
            run = jnp.cumsum(keep_key.astype(jnp.int32)) - 1
            dest = jnp.where(keep_key, run, h)
            mask_c = jnp.zeros((h, mw), jnp.uint32).at[dest].set(
                masks, mode="drop")
            fidx_c = jnp.full((h,), 0xFFFFFFFF, jnp.uint32).at[dest].set(
                fidx, mode="drop")
            src_c = jnp.full((h,), t_rows, jnp.int32).at[dest].set(
                jnp.arange(t_rows, dtype=jnp.int32), mode="drop")
            live_c = jnp.zeros((h,), bool).at[dest].set(True, mode="drop")
    found_c = live_c & ((fidx_c >> 31) == 1)
    idx_c = jnp.minimum((fidx_c & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32),
                        cap - 1)
    cls_c = jnp.where(live_c,
                      jnp.where(found_c, color_ref[idx_c], -1),
                      INT32_MAX)
    mask_cc = jnp.where(live_c[:, None], mask_c, jnp.uint32(0))
    out2 = jax.lax.sort(
        (cls_c,) + tuple(mask_cc[:, j] for j in range(mw))
        + (fidx_c, src_c), num_keys=1 + mw)
    cls2 = out2[0]
    mask2 = jnp.stack(out2[1:1 + mw], axis=-1)
    fidx2 = out2[1 + mw]
    src2 = out2[2 + mw]
    pair_neq = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        (cls2[1:] != cls2[:-1]) | jnp.any(mask2[1:] != mask2[:-1], axis=-1)])
    keep2 = pair_neq & (cls2 != INT32_MAX)
    n_pairs = jnp.sum(keep2.astype(jnp.int32))
    return {"cls2": cls2, "mask2": mask2, "keep2": keep2,
            "fidx2": fidx2, "src2": src2, "n_pairs": n_pairs}


flush_stage_a2 = functools.partial(
    jax.jit, static_argnames=("h", "use_pallas"), donate_argnums=(1, 2, 3)
)(flush_stage_a2_impl)

# Non-donating variant for the SPECULATIVE flush: the host dispatches A2 at
# a predicted h without waiting for A1's n_heads scalar (one host<->device
# round trip saved per flush); if the prediction was too small the inputs
# are still alive and A2 simply reruns at the exact h.
flush_stage_a2_spec = functools.partial(
    jax.jit, static_argnames=("h", "use_pallas"))(flush_stage_a2_impl)


def flush_stage_b_impl(table: KmerTable, colors: ColorStore,
                       bloom_bits: jnp.ndarray,
                       skeys, cls2, mask2, keep2, fidx2, src2,
                       g0: jnp.ndarray, log2_bloom: int, seed1, seed2,
                       budget: int, window: int, use_bloom: bool = True,
                       use_pallas: bool = False):
    """Stage B of the window flush: per-pair class construction (at budget
    size), color_ref rewrite, table merge, Bloom + prefix-index rebuild.

    ``g0``: absolute genome id of the window's first genome (mask bit b =
    genome g0+b).  Caller contract (exact, from stage A's scalars): table has
    >= n_new free rows; each pool has >= n_pairs free rows; budget >= n_pairs.

    ``cls2``/``mask2``/``keep2``/``fidx2``/``src2`` may be h-sized for any
    h <= T (stage A2's compacted head rows, ``src2`` = row in sort-1 order):
    all group work then runs at h, and the new-row class ids land back in
    sort-1 order through an h-sized scatter instead of a T-row sort.
    """
    t_rows = skeys.shape[0]
    h = cls2.shape[0]
    mw = window // 32
    a = budget
    s_w = colors.small_width
    cw = colors.width
    scap = colors.small_capacity
    dcap = colors.capacity
    g0 = jnp.asarray(g0, dtype=jnp.int32)
    w0 = g0 >> 5
    sh = (g0 & 31).astype(jnp.uint32)
    found2 = (fidx2 >> 31) == 1
    idx2 = (fidx2 & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)

    # ---- compact distinct (class, mask) pairs into [a] ----
    # hpos[g] = head row of pair g.  run2 = cumsum(keep2) - 1 is
    # non-decreasing and first reaches g exactly at pair g's head row, so
    # hpos is an a-width binary search over run2 — TPU scatters cost ~9 ns
    # PER UPDATE regardless of how many land (a serialized loop), so the
    # old h-update head-position scatter burned ~110 ms at h = 16M while
    # this searchsorted is sub-ms; every per-pair column then arrives via
    # an a-sized gather (scripts/profile_window_flush.py, /tmp knockouts).
    run2 = jnp.cumsum(keep2.astype(jnp.int32)) - 1
    hpos = jnp.minimum(
        jnp.searchsorted(run2, jnp.arange(a, dtype=jnp.int32),
                         side="left").astype(jnp.int32),
        h - 1)
    u_live_row = jnp.arange(a, dtype=jnp.int32) < run2[-1] + 1
    u_cls = jnp.where(u_live_row, cls2[hpos], INT32_MAX)
    u_mask = [jnp.where(u_live_row, mask2[hpos, j], jnp.uint32(0))
              for j in range(mw)]

    live_u = u_cls != INT32_MAX
    parent_dense = live_u & (u_cls >= 0) & ((u_cls & DENSE_TAG) != 0)
    parent_small = live_u & (u_cls >= 0) & ((u_cls & DENSE_TAG) == 0)
    base_small = jnp.where(
        parent_small[:, None],
        colors.ids[jnp.where(parent_small, u_cls, 0)], EMPTY_ID)   # [a, S]
    base_dense = jnp.where(
        parent_dense[:, None],
        colors.rows[jnp.where(parent_dense, u_cls & ~DENSE_TAG, 0)],
        jnp.uint32(0))                                             # [a, cw]

    # ---- parent's bits inside the window [g0, g0+window) ----
    rel = base_small - g0
    inwin = (base_small != EMPTY_ID) & (rel >= 0) & (rel < window)

    def sel_word(mat, widx):
        outv = jnp.zeros((a,), dtype=jnp.uint32)
        for c in range(cw):
            outv = jnp.where(widx == c, mat[:, c], outv)
        return outv

    add = []
    n_add = jnp.zeros((a,), dtype=jnp.int32)
    for j in range(mw):
        pj = jnp.zeros((a,), dtype=jnp.uint32)
        for t in range(s_w):
            pj = pj | jnp.where(
                inwin[:, t] & ((rel[:, t] >> 5) == j),
                jnp.uint32(1) << (rel[:, t] & 31).astype(jnp.uint32),
                jnp.uint32(0))
        lo = sel_word(base_dense, w0 + j)
        hi = sel_word(base_dense, w0 + j + 1)
        pj = pj | (lo >> sh) | jnp.where(
            sh > 0, hi << ((jnp.uint32(32) - sh) & 31), jnp.uint32(0))
        aj = u_mask[j] & ~pj
        add.append(aj)
        n_add = n_add + jax.lax.population_count(aj).astype(jnp.int32)

    pcount = jnp.where(
        parent_small,
        jnp.sum((base_small != EMPTY_ID).astype(jnp.int32), axis=1), 0)
    u_aff = live_u & (n_add > 0)
    smallish = live_u & ~parent_dense          # small parent or empty (new)
    child_small = u_aff & smallish & (pcount + n_add <= s_w)
    overflow = u_aff & smallish & (pcount + n_add > s_w)
    child_dense = u_aff & (parent_dense | overflow)
    r_small = jnp.cumsum(child_small.astype(jnp.int32)) - 1
    r_dense = jnp.cumsum(child_dense.astype(jnp.int32)) - 1
    n_new_small = jnp.sum(child_small.astype(jnp.int32))
    n_new_dense = jnp.sum(child_dense.astype(jnp.int32))

    # ---- positions of the first S set bits of ``add`` (bit-clear walk) ----
    poss = []
    ys = list(add)
    for _ in range(s_w):
        pos_r = jnp.full((a,), EMPTY_ID, dtype=jnp.int32)
        taken = jnp.zeros((a,), dtype=bool)
        nys = []
        for j in range(mw):
            yj = ys[j]
            nz = (yj != 0) & ~taken
            lsb = yj & (~yj + jnp.uint32(1))
            bitpos = jax.lax.population_count(lsb - 1).astype(jnp.int32)
            pos_r = jnp.where(nz, 32 * j + bitpos, pos_r)
            nys.append(jnp.where(nz, yj & (yj - 1), yj))
            taken = taken | (yj != 0)
        ys = nys
        poss.append(pos_r)

    # ---- small child rows: parent ids then appended window genomes ----
    # In the normal flow appended ids g0+pos are >= every parent id (a flush
    # drains the whole buffer, so classes never contain ids past the window
    # start), but a REPLAYED window (sharded overflow retry, index merge)
    # can meet parents that already hold window genomes — so the row is
    # explicitly re-sorted by an odd-even transposition network (S passes of
    # compare-exchange; EMPTY_ID = INT32_MAX pads sort to the end).
    child_cols = []
    for t in range(s_w):
        val = base_small[:, t]
        for r in range(s_w):
            val = jnp.where((pcount + r == t) & (r < n_add),
                            g0 + poss[r], val)
        child_cols.append(val)
    for p in range(s_w):
        for t in range(p % 2, s_w - 1, 2):
            lo = jnp.minimum(child_cols[t], child_cols[t + 1])
            hi = jnp.maximum(child_cols[t], child_cols[t + 1])
            child_cols[t], child_cols[t + 1] = lo, hi
    dest_small = jnp.where(child_small, colors.sd + r_small, scap)
    ids_out = colors.ids
    for t in range(s_w):
        ids_out = ids_out.at[dest_small, t].set(child_cols[t], mode="drop")

    # ---- dense child rows: parent bitmap (or expanded small) | window adds
    base_for_dense = base_dense | ids_to_bitmap(
        jnp.where(overflow[:, None], base_small, EMPTY_ID), cw)
    dest_dense = jnp.where(child_dense, colors.dd + r_dense, dcap)
    rows_out = colors.rows
    for c in range(cw):
        acc = base_for_dense[:, c]
        for j in range(mw):
            acc = acc | jnp.where(w0 + j == c, add[j] << sh, jnp.uint32(0))
            acc = acc | jnp.where((w0 + j + 1 == c) & (sh > 0),
                                  add[j] >> ((jnp.uint32(32) - sh) & 31),
                                  jnp.uint32(0))
        rows_out = rows_out.at[dest_dense, c].set(acc, mode="drop")

    new_id = jnp.where(
        u_aff,
        jnp.where(child_small, colors.sd + r_small,
                  (colors.dd + r_dense) | DENSE_TAG),
        u_cls)

    # ---- apply group results ----
    # Per-row group values WITHOUT a T-sized gather: scatter per-group
    # DELTAS at the (few) head positions and cumsum — the telescoping sum
    # reproduces each group's value on every row of its run (rows are
    # sorted by group).  An a-sized scatter + a bandwidth-bound cumsum
    # replaces a latency-bound 16M-row gather.
    n_pairs_d = jnp.sum(keep2.astype(jnp.int32))

    def bcast_groups(vals):
        prev = jnp.concatenate([jnp.zeros((1,), vals.dtype), vals[:-1]])
        delta = vals - prev
        live_a = jnp.arange(a, dtype=jnp.int32) < n_pairs_d
        d = jnp.zeros((h,), vals.dtype).at[
            jnp.where(live_a, hpos, h)].add(delta, mode="drop")
        return jnp.cumsum(d)

    per_row = bcast_groups(new_id)
    aff_row = bcast_groups(u_aff.astype(jnp.int32)) == 1
    live2 = cls2 != INT32_MAX
    changed2 = live2 & found2 & aff_row
    isnew2 = live2 & ~found2
    # FOUND rows: idx2 (the table row of each found head) is already in
    # sort-2 order, so the color_ref rewrite scatters directly — no need to
    # route ``changed``/``idx`` through the unsort.  The scatter costs ~9 ns
    # per UPDATE row (h of them) even when every index drops, so skip the
    # whole pass when no found pair gained a bit this window — true for
    # every first window of a build (the table is empty: nothing is found).
    cref = jax.lax.cond(
        jnp.any(changed2),
        lambda c: c.at[jnp.where(changed2, idx2, table.capacity)].set(
            per_row, mode="drop"),
        lambda c: c,
        table.color_ref)

    # NEW rows: their class id must align with skeys (sort-1 order) for the
    # merge payload.  Compacted inputs (h < T): one h-sized scatter through
    # src2.  Full-width inputs (h == T, src2 a permutation): a slim
    # 2-payload permutation sort — bandwidth-bound, cheaper than a T-sized
    # random scatter.
    if h < t_rows:
        newcls1 = jnp.full((t_rows,), -1, jnp.int32).at[
            jnp.where(isnew2, src2, t_rows)].set(per_row, mode="drop")
    else:
        newcls2 = jnp.where(isnew2, per_row, -1)
        out3 = jax.lax.sort((src2, newcls2), num_keys=1)
        newcls1 = out3[1]
    isnew1 = newcls1 >= 0

    from bloomfiltertrie_tpu.ops import pallas_kernels as pk
    if (use_pallas and table.capacity % pk.MTILE == 0
            and t_rows % pk.MTILE == 0):
        # streaming merge-path kernels: compact the new rows, then merge at
        # ~read+write bandwidth (vs the (cap+T)-row multi-operand sort)
        merged_keys, merged_n, merged_cref, merged_flags = \
            pk.merge_sorted_masked(table.keys, table.n, cref, table.flags,
                                   skeys, isnew1, newcls1)
    else:
        merged_keys, merged_n, (merged_cref, merged_flags) = \
            ss.merge_into_masked(
                table.keys, table.n, skeys, isnew1,
                table_payloads=(cref, table.flags),
                new_payloads=(newcls1, jnp.zeros((t_rows,), dtype=jnp.uint8)))

    if use_bloom:
        bloom_bits = bloom_ops.add(bloom_bits, skeys, isnew1,
                                   log2_bloom, seed1, seed2)
    if use_pallas and table.capacity % pk.TILE == 0:
        merged_starts = pk.bucket_starts_ranked(merged_keys, merged_n)
    else:
        merged_starts = ss.build_bucket_starts(merged_keys, merged_n)

    table = KmerTable(keys=merged_keys, color_ref=merged_cref,
                      flags=merged_flags, n=merged_n,
                      bucket_starts=merged_starts)
    colors = ColorStore(ids=ids_out, rows=rows_out,
                        sd=colors.sd + n_new_small,
                        dd=colors.dd + n_new_dense)
    stats = {"n": merged_n, "sd": colors.sd, "dd": colors.dd,
             "new": jnp.sum(isnew1.astype(jnp.int32)),
             "colored_small": n_new_small, "colored_dense": n_new_dense,
             "small_full": count_small_full(colors)}
    return table, colors, bloom_bits, stats


flush_stage_b = functools.partial(
    jax.jit,
    static_argnames=("log2_bloom", "budget", "window", "use_bloom",
                     "use_pallas"),
    donate_argnums=(0, 1, 2),
)(flush_stage_b_impl)


def _dedup_pool(mat: jnp.ndarray, live: jnp.ndarray, pad_value):
    """Dedup + GC the live rows of one pool, PRESERVING survivor order.

    Returns (new_mat, remap int32[cap] old->new (-1 dead), d_new).
    Duplicate content collapses onto the occurrence with the smallest old
    id; survivors keep their relative order, so when nothing died and
    nothing was duplicated the remap is the IDENTITY — the caller detects
    that and skips the O(table) color_ref rewrite entirely (the rewrite's
    16M-row gather costs ~170 ms; append-only genome flows hit the identity
    case almost every time).

    A leading "dead" sort key keeps dead rows strictly after live rows so a
    live all-sentinel row can never be swallowed by the dead-row run; the
    trailing old-id key makes the smallest old id each run's head.
    """
    cap, ncol = mat.shape
    dead = (~live).astype(jnp.uint32)
    old_id = jnp.arange(cap, dtype=jnp.int32)
    operands = (dead,) + tuple(mat[:, i] for i in range(ncol)) + (old_id,)
    out = jax.lax.sort(operands, num_keys=ncol + 2)
    dead_sorted = out[0]
    skeys = jnp.stack(out[1:1 + ncol], axis=-1)
    sid = out[1 + ncol]
    boundary = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        jnp.any(skeys[1:] != skeys[:-1], axis=-1)
        | (dead_sorted[1:] != dead_sorted[:-1]),
    ])
    keep_sorted = boundary & (dead_sorted == 0)
    # head_of[old] = old id of the content run head (the survivor a
    # duplicate collapses onto): runs are contiguous in sorted space, so
    # index heads by run number and forward-fill through run_idx.
    run_idx = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    head_by_run = jnp.full((cap,), -1, jnp.int32).at[
        jnp.where(keep_sorted, run_idx, cap)].set(sid, mode="drop")
    head_of_sorted = head_by_run[jnp.clip(run_idx, 0, cap - 1)]

    # survivors in OLD-id space
    keep_old = jnp.zeros((cap,), bool).at[
        jnp.where(keep_sorted, sid, cap)].set(True, mode="drop")
    new_id_old = jnp.cumsum(keep_old.astype(jnp.int32)) - 1   # rank by old id
    d_new = jnp.sum(keep_old.astype(jnp.int32))

    # remap[old] = new id of its content head (-1 dead)
    head_of = jnp.full((cap,), -1, jnp.int32).at[
        jnp.where(dead_sorted == 0, sid, cap)].set(head_of_sorted, mode="drop")
    remap = jnp.where(head_of >= 0,
                      new_id_old[jnp.clip(head_of, 0, cap - 1)], -1)

    # new pool: survivor c moves old row c -> new_id_old[c]
    old_of_new = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(keep_old, new_id_old, cap)].set(old_id, mode="drop")
    gathered = mat[old_of_new]
    new_mat = jnp.where(
        (jnp.arange(cap, dtype=jnp.int32) < d_new)[:, None],
        gathered, jnp.full_like(mat, pad_value))
    identity = jnp.all(jnp.where(live, remap == old_id, True))
    return new_mat, remap, d_new, identity


@jax.jit
def compress_colors(table: KmerTable, colors: ColorStore):
    """Global color-class dedup + garbage collection, per pool.

    Reference analogue: end-of-build annotation compression
    (``compress_annotations_disk`` src/file_io.c:3-76) which dedups all
    annotations through a JudySL map and rewrites them as dictionary
    pointers.  Here: mark referenced classes per pool, sort rows
    (unreferenced -> sentinel), unique, and remap every color_ref through
    the old->new permutations.  The small/dense split is canonical (small
    iff size <= S), so per-pool dedup is global dedup.
    """
    scap = colors.small_capacity
    dcap = colors.capacity

    cref = table.color_ref
    row_live = (cref >= 0) & (
        jnp.arange(table.capacity, dtype=jnp.int32) < table.n)
    ref_dense = row_live & ((cref & DENSE_TAG) != 0)
    ref_small = row_live & ~ref_dense
    live_small = jnp.zeros((scap,), dtype=bool).at[
        jnp.where(ref_small, cref, scap)].set(True, mode="drop")
    live_dense = jnp.zeros((dcap,), dtype=bool).at[
        jnp.where(ref_dense, cref & ~DENSE_TAG, dcap)].set(True, mode="drop")

    new_ids, remap_s, sd_new, id_s = _dedup_pool(colors.ids, live_small,
                                                 jnp.int32(EMPTY_ID))
    new_rows, remap_d, dd_new, id_d = _dedup_pool(colors.rows, live_dense,
                                                  jnp.uint32(0))

    # Identity fast path: nothing died, nothing duplicated (the common
    # append-only case) -> every live ref already points at its final id,
    # so skip the O(table) gather+rewrite of color_ref (~170 ms at 16M).
    def _rewrite(cref):
        return jnp.where(
            ref_dense,
            remap_d[jnp.where(ref_dense, cref & ~DENSE_TAG, 0)] | DENSE_TAG,
            jnp.where(ref_small, remap_s[jnp.where(ref_small, cref, 0)], -1))

    cref_new = jax.lax.cond(id_s & id_d, lambda c: c, _rewrite, cref)
    table = dataclasses.replace(table, color_ref=cref_new)
    colors = ColorStore(ids=new_ids, rows=new_rows, sd=sd_new, dd=dd_new)
    stats = {"sd": sd_new, "dd": dd_new,
             "small_full": count_small_full(colors)}
    return table, colors, stats
