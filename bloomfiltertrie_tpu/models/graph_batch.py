"""Whole-graph algorithms in index space, batched on device.

The reference's graph utilities (src/snippets.c) walk the trie one k-mer at
a time through ``get_neighbors``.  Here the graph lives in **index space**:
row i of the sorted table is vertex i, and one batched neighbor probe
(models/graph.py) yields the full successor/predecessor index matrix.  On
top of that:

  * :func:`neighbor_links` — succ/pred index matrices [cap, 4] (-1 absent),
    one device probe for the whole graph (the batched analogue of
    ``getRightNeighbors``/``getLeftNeighbors``, src/branchingNode.c:112).
  * :func:`unitig_assign` — maximal non-branching path (unitig) partition by
    pointer doubling: O(log n) gather rounds, cycles cut at their min vertex
    (reference ``extract_simple_paths``, src/snippets.c:115).
  * :func:`component_labels` — connected components by min-label hooking +
    pointer jumping (Shiloach-Vishkin style), O(log n) rounds
    (reference ``get_nb_connected_component``, src/snippets.c:937).
  * :func:`bfs_levels` — frontier-parallel BFS level assignment, one fused
    device step per level, optionally restricted to one color
    (reference ``BFS``/``BFS_subgraph``, src/snippets.c:605,667).

All shapes are static (capacity-sized, masked by n); everything under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bloomfiltertrie_tpu.models import graph as graph_ops
from bloomfiltertrie_tpu.ops import codec


def _log2_rounds(cap: int) -> int:
    return max(int(cap - 1).bit_length(), 1) + 1


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def neighbor_links(table_keys, n, starts, k: int, use_pallas: bool = False):
    """Successor/predecessor row-index matrices for every live table row.

    Returns (succ int32[cap, 4], pred int32[cap, 4]); -1 where the neighbor
    is absent (or the row itself is dead).
    """
    cap = table_keys.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < n
    sf, si, pf, pi = graph_ops.neighbor_presence(
        table_keys, n, starts, table_keys, valid, k, use_pallas=use_pallas)
    succ = jnp.where(sf, si, -1)
    pred = jnp.where(pf, pi, -1)
    return succ, pred


@jax.jit
def unitig_assign(succ, pred, n):
    """Partition the graph into unitigs; returns (uid, pos) int32[cap].

    ``uid[i]`` = row index of the head of i's unitig (cap for dead rows),
    ``pos[i]`` = offset of i within it.  A chain edge u->v exists iff u has
    exactly one successor and v exactly one predecessor (the standard
    compacted-dBG rule; matches the reference's interior-vertex test,
    src/snippets.c:115).  Isolated cycles are cut before their minimum-index
    vertex so every unitig has a head.
    """
    cap = succ.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    valid = iota < n
    outdeg = jnp.sum((succ >= 0).astype(jnp.int32), axis=1)
    indeg = jnp.sum((pred >= 0).astype(jnp.int32), axis=1)
    only_succ = jnp.max(succ, axis=1)          # the single successor if any
    nxt = jnp.where(valid & (outdeg == 1), only_succ, -1)
    nxt = jnp.where(
        (nxt >= 0) & (indeg[jnp.maximum(nxt, 0)] == 1), nxt, -1)
    nxt = jnp.where(nxt == iota, -1, nxt)      # cut self-loops
    prv = jnp.full((cap,), -1, jnp.int32).at[
        jnp.where(nxt >= 0, nxt, cap)].set(iota, mode="drop")

    # Pass A: min-label doubling along prv to find cycle minima + detect
    # cycles (a chain's doubling fixpoint is its head, whose prv is -1).
    ptr = jnp.where(prv >= 0, prv, iota)
    lab = iota
    for _ in range(_log2_rounds(cap)):
        lab = jnp.minimum(lab, lab[ptr])
        ptr = ptr[ptr]
    is_cycle = prv[ptr] >= 0
    cut = is_cycle & (lab == iota)
    prv = jnp.where(cut, -1, prv)

    # Pass B: head pointer + distance doubling.
    ptr = jnp.where(prv >= 0, prv, iota)
    dist = (prv >= 0).astype(jnp.int32)
    for _ in range(_log2_rounds(cap)):
        dist = dist + dist[ptr]
        ptr = ptr[ptr]
    uid = jnp.where(valid, ptr, cap)
    return uid, dist


def _component_step(lab, succ_safe, succ_flat, lab_push_src):
    pull = jnp.min(lab[succ_safe], axis=1)
    l2 = jnp.minimum(lab, pull)
    l2 = l2.at[succ_flat].min(lab_push_src, mode="drop")
    l2 = l2[l2]   # pointer jump (labels are row indices)
    return l2


@jax.jit
def _component_round(lab, succ):
    cap = succ.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    succ_safe = jnp.where(succ >= 0, succ, iota[:, None])
    succ_flat = jnp.where(succ >= 0, succ, cap).reshape(-1)
    lab_push = jnp.repeat(lab, 4)
    l2 = _component_step(lab, succ_safe, succ_flat, lab_push)
    return l2, jnp.any(l2 != lab)


def component_labels(succ, n) -> np.ndarray:
    """Connected-component labels (min row index per component), device loop.

    Successor edges alone carry full undirected connectivity (predecessor
    edges are their reverses); labels propagate both ways via gather (pull)
    + scatter-min (push) and compress by pointer jumping — converges in
    O(log n) rounds, each one fused device program.
    """
    cap = succ.shape[0]
    lab = jnp.arange(cap, dtype=jnp.int32)
    while True:
        lab, changed = _component_round(lab, succ)
        if not bool(jax.device_get(changed)):
            break
    return lab


@jax.jit
def _bfs_round(level, succ, pred, eligible, t):
    cap = succ.shape[0]
    frontier = level == t
    cand = jnp.concatenate([
        jnp.where(frontier[:, None], succ, -1).reshape(-1),
        jnp.where(frontier[:, None], pred, -1).reshape(-1)])
    nxt = jnp.zeros((cap,), bool).at[
        jnp.where(cand >= 0, cand, cap)].set(True, mode="drop")
    grow = nxt & (level < 0) & eligible
    level = jnp.where(grow, t + 1, level)
    return level, jnp.sum(grow.astype(jnp.int32))


def bfs_levels(succ, pred, start_idx: int, eligible=None) -> np.ndarray:
    """BFS level per row (-1 unreached) from ``start_idx``; one device step
    per level.  ``eligible`` restricts expansion (color subgraph BFS)."""
    cap = succ.shape[0]
    if eligible is None:
        eligible = jnp.ones((cap,), bool)
    level = jnp.full((cap,), -1, jnp.int32).at[start_idx].set(0)
    t = 0
    while True:
        level, grew = _bfs_round(level, succ, pred, eligible, t)
        if not int(jax.device_get(grew)):
            break
        t += 1
    return level


def multi_source_bfs_levels(succ, pred, sources, eligible=None) -> jnp.ndarray:
    """BFS levels with all ``sources`` (bool[cap]) at level 0."""
    cap = succ.shape[0]
    if eligible is None:
        eligible = jnp.ones((cap,), bool)
    level = jnp.where(sources, 0, -1).astype(jnp.int32)
    t = 0
    while True:
        level, grew = _bfs_round(level, succ, pred, eligible, t)
        if not int(jax.device_get(grew)):
            break
        t += 1
    return level


# ---------------------------------------------------------------------------
# Host-facing extraction built on the device passes
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k",))
def _unitig_order(uid, pos, table_keys, k: int):
    """Sort rows by (unitig, position); returns per-row (uid, pos, last-base,
    row) in that order — the only data the host needs to assemble strings."""
    cap = uid.shape[0]
    _, j, s = graph_ops.tail_info(k, table_keys.shape[1])
    base = ((table_keys[:, j] >> jnp.uint32(s)) & 3).astype(jnp.int32)
    iota = jnp.arange(cap, dtype=jnp.int32)
    return jax.lax.sort((uid, pos, base, iota), num_keys=2)


def extract_unitigs(dbg) -> list[str]:
    """Maximal non-branching paths as strings (reference
    ``extract_simple_paths``, src/snippets.c:115).

    Device: neighbor probe + pointer-doubling partition + sort.  Host: one
    (n)-byte base fetch + one (U, W) head-key fetch + string assembly.
    """
    dbg.flush()
    n = dbg.nb_kmers
    if n == 0:
        return []
    succ, pred = neighbor_links(
        dbg.table.keys, dbg.table.n, dbg.table.bucket_starts, dbg.k,
        use_pallas=dbg._pallas_eligible())
    uid, pos = unitig_assign(succ, pred, dbg.table.n)
    uid_s, pos_s, base_s, idx_s = _unitig_order(
        uid, pos, dbg.table.keys, dbg.k)
    pos_h = np.asarray(jax.device_get(pos_s[:n]))
    base_h = np.asarray(jax.device_get(base_s[:n]))
    head_rows = idx_s[:n][jnp.asarray(pos_h == 0)]
    head_keys = np.asarray(jax.device_get(dbg.table.keys[head_rows]))
    heads = codec.decode_strings(head_keys, dbg.k)
    bases = np.array(list("ACGT"))[base_h]
    bounds = np.flatnonzero(pos_h == 0)
    ends = np.append(bounds[1:], n)
    return [heads[u] + "".join(bases[b + 1: e])
            for u, (b, e) in enumerate(zip(bounds, ends))]


def nb_connected_components(dbg) -> int:
    """Connected-component count (reference src/snippets.c:937)."""
    dbg.flush()
    n = dbg.nb_kmers
    if n == 0:
        return 0
    succ, _ = neighbor_links(
        dbg.table.keys, dbg.table.n, dbg.table.bucket_starts, dbg.k,
        use_pallas=dbg._pallas_eligible())
    lab = component_labels(succ, dbg.table.n)
    iota = jnp.arange(succ.shape[0], dtype=jnp.int32)
    count = jnp.sum(((lab == iota) & (iota < dbg.table.n)).astype(jnp.int32))
    return int(jax.device_get(count))
