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
compute = cap * QMAX compares — VPU-bound, no latency rounds.

Tiling contract:
  * table stored transposed [W, cap] so the lane dimension is the tile.
  * queries transposed [W, M_pad], M_pad = M + QMAX sentinel padding.
  * qs[t] = number of queries whose global rank < t*TILE (computed with a
    cheap 16K-query XLA search over the *query* array).  A tile's chunks may
    overwrite the head of the next tile's output range; the sequential TPU
    grid guarantees tile t+1 rewrites those slots correctly afterwards.
  * output int32 packs (rank | found << 30).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bloomfiltertrie_tpu.ops import sortedset as ss

TILE = 2048     # table rows per grid step (lane-dim friendly)
QMAX = 256      # default queries per chunk; see _pick_qmax
FOUND_BIT = 30


def _pick_qmax(cap: int, m: int) -> int:
    """Queries per kernel chunk, adapted to query density.

    Bigger chunks amortize the per-chunk DMA latency — at m ~ cap the
    16Mx16M rank pass went ~155 -> ~5 ms moving 256 -> 1024 — but every
    tile scans at least ONE chunk, so a large chunk over-scans sparse
    batches (m << cap): clamp to the average per-tile query count.
    """
    per_tile = max(m * TILE // max(cap, 1), 1)
    q = 1 << (per_tile - 1).bit_length()
    return max(128, min(q, 1024))


def _rank_kernel(qs_ref, tile_ref, q_hbm, out_hbm, qbuf, obuf, sem_q, sem_o,
                 *, w: int, qmax: int):
    t = pl.program_id(0)
    start = qs_ref[t]
    end = qs_ref[t + 1]
    # Chunk windows are QMAX-aligned (DMA/layout constraint); the head of the
    # first window may cover queries of earlier tiles, so output writes are
    # read-modify-write with a [start, end) mask.  The sequential TPU grid
    # makes the RMW race-free.
    c_start = (start // qmax) * qmax
    nchunks = (end - c_start + qmax - 1) // qmax

    def chunk(c, carry):
        off = c_start + c * qmax
        cp = pltpu.make_async_copy(q_hbm.at[:, pl.ds(off, qmax)], qbuf, sem_q)
        cp.start()
        cp_o = pltpu.make_async_copy(out_hbm.at[:, pl.ds(off, qmax)], obuf,
                                     sem_o)
        cp_o.start()
        cp.wait()
        lt = jnp.zeros((qmax, TILE), dtype=jnp.bool_)
        eq = jnp.ones((qmax, TILE), dtype=jnp.bool_)
        for i in range(w):
            trow = tile_ref[i, :][None, :]          # [1, TILE]
            qcol = qbuf[i, :][:, None]              # [QMAX, 1]
            lt = lt | (eq & (trow < qcol))
            eq = eq & (trow == qcol)
        cnt = jnp.sum(lt.astype(jnp.int32), axis=1)           # rows < query
        found = jnp.any(eq, axis=1)
        packed = (t * TILE + cnt) | (found.astype(jnp.int32) << FOUND_BIT)
        j = off + jax.lax.broadcasted_iota(jnp.int32, (1, qmax), 1)
        keep = (j >= start) & (j < end)
        cp_o.wait()
        obuf[:, :] = jnp.where(keep, packed[None, :], obuf[:, :])
        cp2 = pltpu.make_async_copy(obuf, out_hbm.at[:, pl.ds(off, qmax)],
                                    sem_o)
        cp2.start()
        cp2.wait()
        return carry

    jax.lax.fori_loop(0, nchunks, chunk, 0)


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
    n_tiles = cap // TILE
    qmax = _pick_qmax(cap, m)

    # Query-side tile assignment: qs[t] = #queries with rank < t*TILE
    #                                   = #queries q <= table[t*TILE - 1].
    boundaries = table_keys[TILE - 1::TILE][: n_tiles - 1]
    qs_mid = ss.searchsorted(queries, boundaries, side="right")
    qs = jnp.concatenate([
        jnp.zeros((1,), jnp.int32), qs_mid.astype(jnp.int32),
        jnp.full((1,), m, jnp.int32)])

    q_pad = jnp.concatenate([
        queries, jnp.full((qmax, w), ss.SENTINEL, dtype=jnp.uint32)])
    q_t = q_pad.T                      # [W, M+QMAX]
    table_t = table_keys.T             # [W, cap]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((w, TILE), lambda t, qs: (0, t)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((w, qmax), jnp.uint32),
            pltpu.VMEM((1, qmax), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_rank_kernel, w=w, qmax=qmax),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, m + qmax), jnp.int32),
        interpret=interpret,
    )(qs, table_t, q_t)

    packed = out[0, :m]
    rank = packed & ((1 << FOUND_BIT) - 1)
    found = ((packed >> FOUND_BIT) & 1) == 1
    found = found & (rank < n) & valid
    return found, rank


def supported(table_keys, queries) -> bool:
    """Static eligibility check for the Pallas fast path."""
    cap = table_keys.shape[0]
    return cap % TILE == 0 and cap >= TILE and queries.shape[0] >= 1


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
