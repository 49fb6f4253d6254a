"""Pallas TPU kernels for the hot paths.

``rank_sorted``: ranks (searchsorted-left insertion points) + membership of a
SORTED query batch against the sorted table — the engine's hottest operation
(reference analogue: the whole ``presenceKmer`` machinery,
src/presenceNode.c:1284).

Why a kernel: XLA's binary search costs log2(bucket) *random-gather* rounds,
and TPU random gathers run ~0.5 GB/s effective (latency-bound) — measured
186 ms for 1M queries over a 16M-row table.  This kernel instead streams the
table once: tile t of the table is DMA'd to VMEM (auto-pipelined), its query
window [qs[t], qs[t+1]) is DMA'd alongside, and an all-pairs lexicographic
compare on the VPU yields every query's in-tile rank and equality in one
pass.  Total traffic = table read + query read, at HBM bandwidth; total
compute ~ m * tile * W compares — VPU-bound, no latency rounds.

Tiling contract:
  * table stored transposed [W, cap] so the lane dimension is the tile.
  * queries transposed [W, M_pad], M_pad = M + QD sentinel padding.
  * qs[t] = number of queries whose global rank < t*TILE (computed with a
    cheap 16K-query XLA search over the *query* array).
  * query traffic rides a WINDOW CACHE: queries and outputs move between
    HBM and VMEM in QD-query windows that persist across grid steps (the
    tile ranges [qs[t], qs[t+1]) are monotone, so each window is loaded
    and written back exactly once per pass — ~m/QD DMA round trips total
    instead of one per 256-query chunk, which made the dense w=4 probe
    ~80% DMA-latency: 16K chunks x ~4.5 us).  Compute still runs in
    QC-query sub-chunks against the resident table tile.
  * output int32 packs (rank | found << 30).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bloomfiltertrie_tpu.ops import sortedset as ss

TILE = 2048     # max table rows per grid step (lane-dim friendly); the
#                 eligibility unit — smaller adaptive tiles all divide it
QD = 2048       # queries per DMA window (the VMEM-resident query cache)
QC = 256        # max queries per compute sub-chunk (see _pick_qc)
FOUND_BIT = 30


def _pick_tile(cap: int, m: int, w: int) -> int:
    """Table rows per grid step, adapted to query density.

    With query DMA amortized by the window cache, the trade is pure
    compute vs grid-step overhead: per-query compute is ~tile * W
    compares (DENSE probes want small tiles) while each grid step costs
    ~0.3 us fixed (SPARSE probes want few, large tiles).  Pick the tile
    minimizing n_steps * c_step + m * tile * W * c_cmp; constants fitted
    on v5e (window-cache kernel, 16M-row table).
    """
    best, best_cost = TILE, None
    for t in (512, 1024, 2048):
        if cap % t != 0:
            continue
        cost = (cap // t) * 0.3e-6 + m * t * w * 3.2e-12
        if best_cost is None or cost < best_cost:
            best, best_cost = t, cost
    return best


def _pick_qc(cap: int, m: int) -> int:
    """Compute sub-chunk size: the per-tile query-range width is ~m*tile/cap,
    and a sub-chunk boundary wastes ~qc/2 queries of all-pairs compute per
    tile, so halve the sub-chunk when ranges are narrower than QC*2
    (measured: the half-dense w=4 probe 89 -> 78 ms at qc 256 -> 128, while
    the fully dense w=2 probe prefers 256)."""
    return QC if m >= cap else QC // 2


def _rank_kernel(qs_ref, tile_ref, q_hbm, out_hbm, qbuf, obuf, wstate,
                 sem_q, sem_o, *, w: int, tile: int, n_tiles: int,
                 qc: int = QC):
    t = pl.program_id(0)
    start = qs_ref[t]
    end = qs_ref[t + 1]

    @pl.when(t == 0)
    def _():
        wstate[0] = -1

    # Windows are QD-aligned; tile ranges are monotone, so the window only
    # advances.  A window flushes (pure write — its lanes partition across
    # the tiles that touched it, each writing its own [start, end) slice
    # into the VMEM copy) when the next window loads.
    nwin = jnp.where(end > start, (end - 1) // QD - start // QD + 1, 0)

    def window(wi, carry):
        # wstate holds the window INDEX (offset // QD): Mosaic must prove
        # dynamic HBM slice offsets 128-divisible, which it can for
        # `idx * QD` but not for a raw offset loaded back from SMEM.
        widx = start // QD + wi
        wd = widx * QD
        cur = wstate[0]

        @pl.when(widx != cur)
        def _():
            @pl.when(cur >= 0)
            def _():
                cpo = pltpu.make_async_copy(
                    obuf, out_hbm.at[:, pl.ds(cur * QD, QD)], sem_o)
                cpo.start()
                cpo.wait()
            cpq = pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(wd, QD)], qbuf, sem_q)
            cpq.start()
            cpq.wait()
            wstate[0] = widx

        s = jnp.maximum(start, wd)
        e = jnp.minimum(end, wd + QD)

        # STATIC sub-chunk unroll: dynamic VMEM lane slices (pl.ds with a
        # traced offset) lower to expensive shift machinery in Mosaic —
        # static offsets with a pl.when predicate are ~free.
        for sc in range(QD // qc):
            qoff = sc * qc

            @pl.when((wd + qoff < e) & (wd + qoff + qc > s))
            def _(qoff=qoff):
                lt = jnp.zeros((qc, tile), dtype=jnp.bool_)
                eq = jnp.ones((qc, tile), dtype=jnp.bool_)
                for i in range(w):
                    trow = tile_ref[i, :][None, :]            # [1, tile]
                    qcol = qbuf[i, qoff:qoff + qc][:, None]   # [qc, 1]
                    lt = lt | (eq & (trow < qcol))
                    eq = eq & (trow == qcol)
                cnt = jnp.sum(lt.astype(jnp.int32), axis=1)   # rows < query
                found = jnp.any(eq, axis=1)
                packed = ((t * tile + cnt)
                          | (found.astype(jnp.int32) << FOUND_BIT))
                j = (wd + qoff
                     + jax.lax.broadcasted_iota(jnp.int32, (1, qc), 1))
                keep = (j >= start) & (j < end)
                obuf[:, qoff:qoff + qc] = jnp.where(
                    keep, packed[None, :], obuf[:, qoff:qoff + qc])

        return carry

    jax.lax.fori_loop(0, nwin, window, 0)

    @pl.when(t == n_tiles - 1)
    def _():
        cur = wstate[0]

        @pl.when(cur >= 0)
        def _():
            cpo = pltpu.make_async_copy(
                obuf, out_hbm.at[:, pl.ds(cur * QD, QD)], sem_o)
            cpo.start()
            cpo.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def rank_sorted(table_keys: jnp.ndarray, n: jnp.ndarray,
                queries: jnp.ndarray, valid: jnp.ndarray,
                interpret: bool = False):
    """Ranks + membership of sorted queries in the sorted sentinel table.

    Args:
      table_keys: uint32[cap, W], sorted, sentinel-padded; cap % TILE == 0.
      n: int32 scalar live-row count.
      queries: uint32[M, W] — MUST be sorted (invalid rows = sentinel, last).
      valid: bool[M].
    Returns:
      (found bool[M], rank int32[M]) with the same guard semantics as
      ``sortedset.lookup`` (sentinel aliasing excluded via rank < n).
    """
    cap, w = table_keys.shape
    m = queries.shape[0]
    tile = _pick_tile(cap, m, w)
    n_tiles = cap // tile

    # Query-side tile assignment: qs[t] = #queries with rank < t*tile
    #                                   = #queries q <= table[t*tile - 1].
    boundaries = table_keys[tile - 1::tile][: n_tiles - 1]
    qs_mid = ss.searchsorted(queries, boundaries, side="right")
    qs = jnp.concatenate([
        jnp.zeros((1,), jnp.int32), qs_mid.astype(jnp.int32),
        jnp.full((1,), m, jnp.int32)])

    q_pad = jnp.concatenate([
        queries, jnp.full((QD, w), ss.SENTINEL, dtype=jnp.uint32)])
    q_t = q_pad.T                      # [W, M+QD]
    table_t = table_keys.T             # [W, cap]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((w, tile), lambda t, qs: (0, t)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((w, QD), jnp.uint32),
            pltpu.VMEM((1, QD), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_rank_kernel, w=w, tile=tile, n_tiles=n_tiles,
                          qc=_pick_qc(cap, m)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, m + QD), jnp.int32),
        interpret=interpret,
    )(qs, table_t, q_t)

    packed = out[0, :m]
    rank = packed & ((1 << FOUND_BIT) - 1)
    found = ((packed >> FOUND_BIT) & 1) == 1
    found = found & (rank < n) & valid
    return found, rank


def bucket_starts_ranked(table_keys: jnp.ndarray, n: jnp.ndarray,
                         interpret: bool = False):
    """Prefix-bucket index rebuild through the streaming rank kernel.

    ``ss.build_bucket_starts`` binary-searches 65536 bucket bounds — ~24
    rounds of random gathers, measured ~53 ms at a 16M-row table on v5e.
    The bounds are a SORTED query batch, so the rank kernel computes every
    start in one table stream (~3 ms).  Same output contract as
    ss.build_bucket_starts; caller must check cap % TILE == 0.
    """
    cap, w = table_keys.shape
    bounds = jnp.zeros((ss.NB_BUCKETS, w), dtype=jnp.uint32)
    bounds = bounds.at[:, 0].set(
        jax.lax.broadcasted_iota(jnp.uint32, (ss.NB_BUCKETS, 1), 0)
        .squeeze(-1) << jnp.uint32(16))
    _, rank = rank_sorted(table_keys, n, bounds,
                          jnp.ones((ss.NB_BUCKETS,), bool),
                          interpret=interpret)
    starts = jnp.minimum(rank, n)
    return jnp.concatenate([starts, n[None].astype(jnp.int32)])


def supported(table_keys, queries) -> bool:
    """Static eligibility check for the Pallas fast path."""
    cap = table_keys.shape[0]
    return cap % TILE == 0 and cap >= TILE and queries.shape[0] >= 1


@jax.jit
def lookup_sorted(table_keys: jnp.ndarray, n: jnp.ndarray,
                  queries: jnp.ndarray, valid: jnp.ndarray):
    """Membership of an ALREADY-SORTED query batch: the streaming rank
    kernel alone — no M-row sort in front, no unsort scatter behind
    (VERDICT r4 #5; the common bulk case: extraction-ordered, routed, or
    pre-sorted batches).  Caller contract: rows ascend with invalid rows
    as sentinel at the end (i.e. sorted by ``where(valid, q, SENTINEL)``).
    Returns (found bool[M], clamped idx int32[M]) like ``lookup_unsorted``.
    """
    cap = table_keys.shape[0]
    found, rank = rank_sorted(table_keys, n, queries, valid)
    return found, jnp.minimum(rank, cap - 1)


@jax.jit
def lookup_unsorted(table_keys: jnp.ndarray, n: jnp.ndarray,
                    queries: jnp.ndarray, valid: jnp.ndarray):
    """Arbitrary-order membership via sort -> rank kernel -> unsort.

    Drop-in for ``sortedset.lookup`` (returns (found, clamped idx)); costs one
    M-row sort plus one M-element scatter on top of the streaming kernel —
    still far below log2(cap) random-gather rounds for large M.
    """
    m, w = queries.shape
    cap = table_keys.shape[0]
    keyed = jnp.where(valid[:, None], queries,
                      jnp.full_like(queries, ss.SENTINEL))
    ops = (tuple(keyed[:, i] for i in range(w))
           + (jnp.arange(m, dtype=jnp.int32), valid.astype(jnp.int32)))
    out = jax.lax.sort(ops, num_keys=w)
    q_sorted = jnp.stack(out[:w], axis=-1)
    orig = out[w]
    valid_sorted = out[w + 1] == 1
    f_s, r_s = rank_sorted(table_keys, n, q_sorted, valid_sorted)
    found = jnp.zeros((m,), bool).at[orig].set(f_s)
    idx = jnp.zeros((m,), jnp.int32).at[orig].set(
        jnp.minimum(r_s, cap - 1))
    return found, idx


# ---------------------------------------------------------------------------
# Merge-path kernels: sorted-table merge at streaming bandwidth.
#
# The XLA formulation of "merge new sorted rows into the sorted table"
# (ops/sortedset.py merge_into_masked) is one (cap+T)-row multi-operand
# lax.sort — measured ~235 ms at 16M+16M rows, the window flush's largest
# remaining cost.  Merging two ALREADY-SORTED lists needs only one linear
# pass: these kernels do it as (1) a stream COMPACTION of the masked new
# rows (live rows are interspersed with dead ones in key order) and (2) a
# tiled MERGE-PATH merge — per output tile, a TT-row window of each input
# (split points precomputed by binary search) is DMA'd to VMEM, and a
# bitonic MERGE network (concat(asc A, reversed B) is bitonic; log2(2TT)
# compare-exchange stages on the VPU) yields the tile's rows exactly.
# Total traffic = read A + read B + write out, at HBM bandwidth.
# ---------------------------------------------------------------------------

MTILE = 8192    # rows per merge/compaction tile (bigger tiles
#                 amortize the serialized per-tile DMA latency)
SENTINEL32 = np.uint32(0xFFFFFFFF)


def _cx_stage(x, w: int, j: int, k: int):
    """One bitonic compare-exchange stage on a [C, L] channel-stacked array.

    Partner of lane i is i XOR j — fetched with two static pltpu.rolls of
    the WHOLE [C, L] array and a parity select, so the C channels ride the
    sublanes together (per-channel [1, L] rows used 1/8 of the VPU).
    Mosaic supports neither vector reverse nor small-minor reshapes, hence
    the roll formulation; block direction alternates by bit ``k`` of the
    lane index (k == 0 => ascending everywhere, the bitonic-MERGE case).
    The first ``w`` channels are the lexicographic sort key.
    """
    l_len = x.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, l_len), 1)
    upper = (pos & j) != 0
    # roll shift must be non-negative: -j mod L == L - j
    part = jnp.where(upper, pltpu.roll(x, j, 1),
                     pltpu.roll(x, l_len - j, 1))
    lt = jnp.zeros((1, l_len), dtype=jnp.bool_)
    gt = jnp.zeros((1, l_len), dtype=jnp.bool_)
    eq = jnp.ones((1, l_len), dtype=jnp.bool_)
    for i in range(w):
        ci = x[i: i + 1, :]
        pi = part[i: i + 1, :]
        lt = lt | (eq & (ci < pi))
        gt = gt | (eq & (pi < ci))
        eq = eq & (ci == pi)
    # pure mask algebra (a select over i1 vectors does not lower in Mosaic)
    asc_take = (upper & lt) | (~upper & gt)
    if k:
        asc = (pos & k) == 0
        desc_take = (upper & gt) | (~upper & lt)
        take = (asc & asc_take) | (~asc & desc_take)
    else:
        take = asc_take
    return jnp.where(take, part, x)


def _bitonic_merge_chans(x, w: int):
    """Sort a BITONIC [C, L] array ascending by the first ``w`` key
    channels: log2(L) compare-exchange stages."""
    l_len = x.shape[-1]
    j = l_len // 2
    while j >= 1:
        x = _cx_stage(x, w, j, 0)
        j //= 2
    return x


def _bitonic_sort_chans(x, w: int):
    """Full bitonic sort (ascending) of a [C, L] channel-stacked array."""
    l_len = x.shape[-1]
    k = 2
    while k <= l_len:
        j = k // 2
        while j >= 1:
            x = _cx_stage(x, w, j, k if k < l_len else 0)
            j //= 2
        k *= 2
    return x


def _compact_kernel(offs_ref, x_hbm, out_hbm, buf, obuf, pbuf, sem_i,
                    sem_o, *, c: int):
    """Pack each tile's live rows (liveness channel c-1: 0 live, 1 dead)
    to the front IN ORDER and write them at this tile's global live
    offset.  Dynamic HBM slices must be 128-aligned, so the write is a
    read-modify-write of an aligned (MTILE+128)-wide window: the packed
    block rotates into place, the sub-alignment head keeps the previous
    content.  Consecutive tiles overlap-write each other's sentinel tails;
    the sequential TPU grid makes the RMW race-free and later (live)
    writes win, so the live prefix of the output is exactly the compacted
    stream."""
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(t * MTILE, MTILE)], buf,
                               sem_i)
    cp.start()
    off = offs_ref[t]
    off_al = (off // 128) * 128
    d = off - off_al
    wlen = MTILE + 128
    cp_o = pltpu.make_async_copy(out_hbm.at[:, pl.ds(off_al, wlen)], obuf,
                                 sem_o)
    cp_o.start()
    cp.wait()
    x = buf[:, :]
    dead = x[c - 1: c, :] == 1
    subl = jax.lax.broadcasted_iota(jnp.int32, (c, MTILE), 0)
    ndead = jnp.sum(dead.astype(jnp.int32))

    # Uniform tiles skip the ~91-stage in-tile bitonic sort entirely —
    # all-live is the identity partition, all-dead is pure sentinel (the
    # dominant case when compacting a few new rows out of a big batch).
    @pl.when(ndead == 0)
    def _():
        pbuf[:, :] = jnp.where(subl == 0, jnp.uint32(0), x)

    @pl.when(ndead == MTILE)
    def _():
        pbuf[:, :] = jnp.full((c, MTILE), 0xFFFFFFFF, jnp.uint32)

    @pl.when((ndead > 0) & (ndead < MTILE))
    def _():
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, MTILE), 1)
        key = jnp.where(dead, pos + MTILE, pos).astype(jnp.uint32)
        xm = jnp.where(dead, jnp.uint32(0xFFFFFFFF), x)
        # place the sort key into channel 0 via a sublane mask (row slicing
        # + re-concat leaves a sublane-offset layout Mosaic cannot
        # re-concat); channel 0 (the merge dead flag) is reconstructed from
        # the sorted key.
        xm = jnp.where(subl == 0, jnp.broadcast_to(key, (c, MTILE)), xm)
        xm = _bitonic_sort_chans(xm, 1)         # stable live-first order
        ch0 = jnp.where(xm[0:1, :] >= jnp.uint32(MTILE),
                        jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        pbuf[:, :] = jnp.where(subl == 0, jnp.broadcast_to(ch0, (c, MTILE)),
                               xm)

    padded = jnp.concatenate(
        [pbuf[:, :], jnp.full((c, 128), 0xFFFFFFFF, jnp.uint32)], axis=1)
    rolled = pltpu.roll(padded, d, 1)     # packed block lands at [d, d+MTILE)
    wpos = jax.lax.broadcasted_iota(jnp.int32, (1, wlen), 1)
    cp_o.wait()
    obuf[:, :] = jnp.where(wpos < d, obuf[:, :], rolled)
    cp2 = pltpu.make_async_copy(obuf, out_hbm.at[:, pl.ds(off_al, wlen)],
                                sem_o)
    cp2.start()
    cp2.wait()


def _merge_kernel(asplit_ref, a_hbm, brev_hbm, out_ref, abuf, bbuf, sem_a,
                  sem_b, *, w: int, lb: int, g: int):
    """asplit has g+1 entries: asplit[t+1]-asplit[t] = this tile's A rows,
    so pure-A tiles (the dominant case when few new rows merge into a big
    table) skip the log2(2*MTILE)-stage merge network and copy a_win."""
    """One output tile of the merge path: window of A (ascending) ++ window
    of pre-REVERSED B (descending) is bitonic; the merge network's first
    MTILE lanes are the tile's rows.  Windows load from 128-aligned
    offsets (dynamic HBM slice constraint) and rotate into place.

    Manually DOUBLE-BUFFERED: tile t waits on copies started by tile t-1
    and starts tile t+1's, so window DMAs overlap the merge-network
    compute (scratch persists across the sequential grid)."""
    t = pl.program_id(0)
    wlen = MTILE + 128
    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)

    def copies(tt, sl):
        a0 = asplit_ref[tt]
        a_al = (a0 // 128) * 128
        b0 = tt * MTILE - a0
        bs = lb - MTILE - b0
        b_al = (bs // 128) * 128
        return (pltpu.make_async_copy(a_hbm.at[:, pl.ds(a_al, wlen)],
                                      abuf.at[sl], sem_a.at[sl]),
                pltpu.make_async_copy(brev_hbm.at[:, pl.ds(b_al, wlen)],
                                      bbuf.at[sl], sem_b.at[sl]))

    @pl.when(t == 0)
    def _():
        ca, cb = copies(0, slot)
        ca.start()
        cb.start()

    @pl.when(t + 1 < g)
    def _():
        ca, cb = copies(t + 1, nslot)
        ca.start()
        cb.start()

    ca, cb = copies(t, slot)
    ca.wait()
    cb.wait()
    a0 = asplit_ref[t]
    a_al = (a0 // 128) * 128
    b0 = t * MTILE - a0
    bs = lb - MTILE - b0
    b_al = (bs // 128) * 128
    # rotate left by the sub-alignment delta: desired window lands at [0, MTILE)
    a_win = pltpu.roll(abuf[slot], (wlen - (a0 - a_al)) % wlen,
                       1)[:, :MTILE]
    take_a = asplit_ref[t + 1] - a0

    @pl.when(take_a == MTILE)
    def _():
        out_ref[:, :] = a_win

    @pl.when(take_a != MTILE)
    def _():
        b_win = pltpu.roll(bbuf[slot], (wlen - (bs - b_al)) % wlen,
                           1)[:, :MTILE]
        x = jnp.concatenate([a_win, b_win], axis=1)           # bitonic
        merged = _bitonic_merge_chans(x, w)
        out_ref[:, :] = merged[:, :MTILE]


def compact_rows(stacked: jnp.ndarray, interpret: bool = False):
    """Stable stream compaction of [C, T] channel-stacked rows.

    Channel C-1 is the liveness flag (0 live, 1 dead); channel 0 MUST be a
    dead-flag channel too (it is sacrificed for the in-tile sort key and
    reconstructed as 0 for live rows / 0xFFFFFFFF for the tail).  Returns
    ([C, T] with the live rows packed to the front IN ORDER and a
    0xFFFFFFFF sentinel tail, live count).  ``T`` must be a multiple of
    MTILE.
    """
    c, t_len = stacked.shape
    n_tiles = t_len // MTILE
    live = (stacked[c - 1].reshape(n_tiles, MTILE) == 0).sum(
        axis=1).astype(jnp.int32)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(live)[:-1]])
    out = pl.pallas_call(
        functools.partial(_compact_kernel, c=c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((c, MTILE), jnp.uint32),
                pltpu.VMEM((c, MTILE + 128), jnp.uint32),
                pltpu.VMEM((c, MTILE), jnp.uint32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ]),
        out_shape=jax.ShapeDtypeStruct((c, t_len + 128), jnp.uint32),
        interpret=interpret,
    )(offs, stacked)
    out = out[:, :t_len]
    # anything at/after the final write window's end is unwritten garbage;
    # force it to sentinel (rows in [nb, last_end) already hold the last
    # tiles' sentinel fill).
    nb = jnp.sum(live)
    last_end = offs[-1] + MTILE
    tail = jax.lax.broadcasted_iota(jnp.int32, (1, t_len), 1) >= last_end
    out = jnp.where(tail, jnp.uint32(0xFFFFFFFF), out)
    return out, nb


def merge_path(a_stacked: jnp.ndarray, b_stacked: jnp.ndarray,
               nb: jnp.ndarray, out_tiles: int, w: int,
               interpret: bool = False):
    """Merge-path merge of two sorted channel-stacked arrays.

    ``a_stacked`` [C, LA], ``b_stacked`` [C, LB]: first ``w`` channels are
    the lexicographic sort keys (ascending, sentinel-padded tails); both
    must be readable MTILE past any split (callers pad).  ``nb`` bounds
    the live B rows entering the union.  Returns [C, out_tiles*MTILE] =
    the first out_tiles*MTILE rows of the union of A[: LA] and B[: nb].
    """
    c, la = a_stacked.shape
    lb = b_stacked.shape[1]
    g = out_tiles
    # Padding preconditions: the split search clamps hi to la - MTILE - 128
    # and the B windows read MTILE+128 rows around any split of the REVERSED
    # array — both assume the caller padded sentinel past the live rows
    # (merge_sorted_masked pads MTILE+256).  The A-side bound is static:
    # fail loudly at trace time.  The B-side bound depends on the TRACED
    # ``nb``, so it cannot raise at trace time; instead ``nb`` is clamped to
    # the provable safe bound lb - MTILE - 256 — an honest caller is
    # unaffected (merge_sorted_masked has nb <= lb - MTILE - 256 by
    # construction) and a thin-padded caller can no longer read out of
    # bounds or mis-split.
    if la < g * MTILE + MTILE + 128:
        raise ValueError(
            f"merge_path: A too thin ({la} cols; need >= "
            f"{g * MTILE + MTILE + 128} = out_tiles*MTILE + MTILE + 128)")
    if lb < MTILE + 256:
        raise ValueError(
            f"merge_path: B too thin ({lb} cols; need >= {MTILE + 256})")
    nb = jnp.minimum(jnp.asarray(nb, jnp.int32), lb - MTILE - 256)
    # g+1 split points: entry t is the number of A rows among the first
    # t*MTILE output rows; the kernel reads t and t+1 to detect pure-A tiles
    o = jnp.arange(g + 1, dtype=jnp.int32) * MTILE
    lo = jnp.maximum(0, o - nb)
    # clamp so the 128-aligned-down window never reads past the padding
    hi = jnp.minimum(o, la - MTILE - 128)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        bidx = jnp.maximum(o - mid - 1, 0)
        a_lt = jnp.zeros((g + 1,), dtype=jnp.bool_)
        eq = jnp.ones((g + 1,), dtype=jnp.bool_)
        for i in range(w):
            av = a_stacked[i, mid]
            bv = b_stacked[i, bidx]
            a_lt = a_lt | (eq & (av < bv))
            eq = eq & (av == bv)
        go_right = (o - mid - 1 >= 0) & a_lt
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    steps = max(int(la).bit_length(), 1)
    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    asplit = lo
    b_rev = jnp.flip(b_stacked, axis=1)   # XLA-side reverse (Mosaic has none)
    # 128 slack columns: the aligned-down window [bs_al, bs_al+MTILE+128)
    # may extend past lb when bs is maximal; the slack is never selected
    # (the roll discards it) but must be in bounds.
    b_rev = jnp.concatenate(
        [b_rev, jnp.zeros((c, 128), jnp.uint32)], axis=1)

    out = pl.pallas_call(
        functools.partial(_merge_kernel, w=w, lb=lb, g=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((c, MTILE), lambda t, asplit: (0, t)),
            scratch_shapes=[
                pltpu.VMEM((2, c, MTILE + 128), jnp.uint32),
                pltpu.VMEM((2, c, MTILE + 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((c, g * MTILE), jnp.uint32),
        interpret=interpret,
    )(asplit, a_stacked, b_rev)
    return out


def _tile_channels(c: int) -> int:
    """Round a channel count up to an (8,128)-tiling-friendly value: HBM
    memref slices with 6-row views fail Mosaic's sublane tiling; 1/2/4 or a
    multiple of 8 are safe."""
    if c <= 4:
        return 1 << (c - 1).bit_length() if c > 1 else 1
    return ((c + 7) // 8) * 8


def _pad_channels(x: jnp.ndarray, c_target: int) -> jnp.ndarray:
    c = x.shape[0]
    if c == c_target:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((c_target - c, x.shape[1]), x.dtype)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_sorted_masked(table_keys: jnp.ndarray, table_n: jnp.ndarray,
                        cref: jnp.ndarray, flags: jnp.ndarray,
                        skeys: jnp.ndarray, isnew: jnp.ndarray,
                        newcls: jnp.ndarray, interpret: bool = False):
    """Streaming replacement for ``sortedset.merge_into_masked``.

    Compacts the ``isnew``-masked rows of the key-sorted batch with the
    stream-compaction kernel, then merge-path-merges them into the sorted
    table — total traffic ~ read A + read B + write out, vs the XLA
    formulation's (cap+T)-row multi-operand sort (~235 ms at 16M+16M).

    A leading DEAD-flag key channel orders live rows strictly before
    sentinel padding, so a genuine all-T key (bit-identical to the
    sentinel when k == 16*W) can never lose its payload to an unstable
    tie among dead rows.

    Preconditions: cap % MTILE == 0, T % MTILE == 0, live new keys unique
    and disjoint from live table keys, n + nb <= cap.
    Returns (merged_keys [cap, W], merged_n, merged_cref, merged_flags).
    """
    cap, w = table_keys.shape
    t_rows = skeys.shape[0]
    iota_cap = jnp.arange(cap, dtype=jnp.int32)

    c_m = _tile_channels(w + 3)           # merge channels, tiling-friendly

    # ---- B: compact the masked new rows (liveness channel LAST) ----
    dead_b = (~isnew).astype(jnp.uint32)
    b_core = jnp.concatenate([
        dead_b[None],
        skeys.T,
        newcls.astype(jnp.uint32)[None],
        jnp.zeros((1, t_rows), jnp.uint32),   # flags of new rows
    ], axis=0)
    c_c = _tile_channels(w + 4)
    b_in = jnp.concatenate([
        _pad_channels(b_core, c_c - 1), dead_b[None]], axis=0)
    b_c, nb = compact_rows(b_in, interpret=interpret)
    b_pad = jnp.concatenate([
        _pad_channels(b_c[: w + 3], c_m),
        jnp.full((c_m, MTILE + 256), SENTINEL32, dtype=jnp.uint32)],
        axis=1)

    # ---- A: stacked table channels, MTILE sentinel pad ----
    a_dead = (iota_cap >= table_n).astype(jnp.uint32)
    a_st = _pad_channels(jnp.concatenate([
        a_dead[None],
        table_keys.T,
        cref.astype(jnp.uint32)[None],
        flags.astype(jnp.uint32)[None],
    ], axis=0), c_m)
    a_pad = jnp.concatenate([
        a_st, jnp.full((c_m, MTILE + 256), SENTINEL32, dtype=jnp.uint32)],
        axis=1)

    out = merge_path(a_pad, b_pad, nb, cap // MTILE, w + 1,
                     interpret=interpret)
    merged_n = table_n + nb
    live = iota_cap < merged_n
    merged_keys = jnp.where(live[:, None], out[1: 1 + w].T,
                            jnp.full_like(table_keys, SENTINEL32))
    merged_cref = jnp.where(live, out[1 + w].astype(jnp.int32), -1)
    merged_flags = jnp.where(live, out[2 + w], 0).astype(jnp.uint8)
    return merged_keys, merged_n, merged_cref, merged_flags
