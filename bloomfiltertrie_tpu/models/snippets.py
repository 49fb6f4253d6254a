"""Graph-algorithm utilities — parity with the reference's worked examples.

Reference: ``src/snippets.c`` — the repo's only "acceptance tests": core /
dispensable / singleton k-mer extraction (:10,:35,:60), simple-path extraction
(:115), BFS/DFS over the whole graph or a color subgraph (:605,:743),
graph traversal and connected components (:883,:937) — all built on
``iterate_over_kmers`` + ``get_neighbors`` + the marking planes.

Here the per-k-mer predicates become single batched tensor ops (a core-k-mer
scan is one popcount-compare over the color matrix), and traversals become
**frontier-batched** BFS: the whole frontier's 8 neighbor probes run as one
device lookup per level — the TPU analogue of the reference's queue loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bloomfiltertrie_tpu.models import graph as graph_ops
from bloomfiltertrie_tpu.models.cdbg import ColoredDBG
from bloomfiltertrie_tpu.ops import codec


def _popcount_rows(bitmap: np.ndarray) -> np.ndarray:
    """Per-row set-bit count of a uint32 bitmap [N, cw]."""
    return np.unpackbits(
        bitmap.view(np.uint8).reshape(bitmap.shape[0], -1), axis=1).sum(axis=1)


def _color_counts(dbg: ColoredDBG) -> np.ndarray:
    """Number of colors of every k-mer in the index, in table order."""
    n = dbg.nb_kmers
    cref = np.asarray(jax.device_get(dbg.table.color_ref))[:n]
    rows = np.asarray(jax.device_get(dbg.colors.rows))
    return _popcount_rows(rows[np.maximum(cref, 0)])


def extract_core_kmers(dbg: ColoredDBG) -> np.ndarray:
    """k-mers present in ALL genomes (reference extract_core_kmers :10)."""
    counts = _color_counts(dbg)
    return dbg.extract_kmers_packed()[counts == dbg.nb_genomes]


def extract_dispensable_kmers(dbg: ColoredDBG) -> np.ndarray:
    """k-mers present in < all genomes (reference :35)."""
    counts = _color_counts(dbg)
    return dbg.extract_kmers_packed()[counts < dbg.nb_genomes]


def extract_singleton_kmers(dbg: ColoredDBG) -> np.ndarray:
    """k-mers present in exactly one genome (reference :60)."""
    counts = _color_counts(dbg)
    return dbg.extract_kmers_packed()[counts == 1]


def _neighbor_matrix(dbg: ColoredDBG, packed: np.ndarray):
    """(succ_found [N,4], pred_found [N,4], succ_idx, pred_idx) for packed."""
    return dbg.neighbor_presence_packed(packed)


def extract_simple_paths(dbg: ColoredDBG) -> list[str]:
    """Maximal non-branching paths (unitigs), reference :115.

    A k-mer is an interior path vertex iff it has exactly one successor and
    one predecessor.  Paths are reconstructed host-side by walking from every
    path head; neighbor presence for ALL k-mers is computed in one batch.
    """
    n = dbg.nb_kmers
    if n == 0:
        return []
    packed = dbg.extract_kmers_packed()
    sf, si, pf, pi = dbg.neighbor_presence_packed(packed)
    n_succ = sf.sum(axis=1)
    n_pred = pf.sum(axis=1)

    # map packed row -> table index for O(1) successor chasing
    strs = codec.decode_strings(packed, dbg.k)
    index_of = {s: i for i, s in enumerate(strs)}

    def succ_of(i: int) -> list[int]:
        out = []
        for b in range(4):
            if sf[i, b]:
                out.append(index_of[strs[i][1:] + "ACGT"[b]])
        return out

    # Standard unitig rule: i is a path head if in-degree != 1 or its single
    # predecessor branches forward.
    visited = np.zeros(n, dtype=bool)
    paths = []
    for i in range(n):
        if n_pred[i] == 1:
            (p,) = _preds(i, pf, strs, index_of)
            if sf[p].sum() == 1:
                continue  # interior vertex
        # i is a path head
        if visited[i]:
            continue
        path = strs[i]
        visited[i] = True
        cur = i
        while n_succ[cur] == 1:
            (nxt,) = succ_of(cur)
            if n_pred[nxt] != 1 or visited[nxt]:
                break
            path += strs[nxt][-1]
            visited[nxt] = True
            cur = nxt
        paths.append(path)
    # isolated cycles (all vertices interior) — pick arbitrary entry
    for i in range(n):
        if not visited[i]:
            path = strs[i]
            visited[i] = True
            cur = i
            while n_succ[cur] >= 1:
                nxt = succ_of(cur)[0]
                if visited[nxt]:
                    break
                path += strs[nxt][-1]
                visited[nxt] = True
                cur = nxt
            paths.append(path)
    return paths


def _preds(i, pf, strs, index_of):
    out = []
    for b in range(4):
        if pf[i, b]:
            out.append(index_of["ACGT"[b] + strs[i][:-1]])
    return out


def bfs(dbg: ColoredDBG, start_kmer: str, genome_id: int | None = None
        ) -> list[str]:
    """Frontier-batched BFS from a k-mer (reference BFS :605 /
    BFS_subgraph :667 when ``genome_id`` restricts to one color).

    Returns visited k-mers in BFS-level order (within a level: sorted).
    """
    packed, valid = codec.encode_strings([start_kmer], dbg.k)
    found, _ = dbg.query_kmers_packed(packed, np.asarray(valid))
    if not found[0]:
        return []
    visited: set[str] = set()
    order: list[str] = []
    frontier = [start_kmer]
    visited.add(start_kmer)
    while frontier:
        order.extend(frontier)
        fpacked, _ = codec.encode_strings(frontier, dbg.k)
        sf, _, pf, _ = dbg.neighbor_presence_packed(fpacked)
        nxt = set()
        for i, km in enumerate(frontier):
            for b in range(4):
                if sf[i, b]:
                    nxt.add(km[1:] + "ACGT"[b])
                if pf[i, b]:
                    nxt.add("ACGT"[b] + km[:-1])
        if genome_id is not None:
            keep = []
            cand = sorted(nxt - visited)
            if cand:
                cpacked, cvalid = codec.encode_strings(cand, dbg.k)
                _, bitmap = dbg.query_kmers_packed(cpacked, np.asarray(cvalid))
                for j, km in enumerate(cand):
                    if (bitmap[j, genome_id >> 5] >> np.uint32(genome_id & 31)) & 1:
                        keep.append(km)
            frontier = keep
        else:
            frontier = sorted(nxt - visited)
        visited.update(frontier)
    return order


def dfs(dbg: ColoredDBG, start_kmer: str) -> list[str]:
    """DFS from a k-mer (reference DFS :743); neighbor probes batched per pop."""
    packed, valid = codec.encode_strings([start_kmer], dbg.k)
    found, _ = dbg.query_kmers_packed(packed, np.asarray(valid))
    if not found[0]:
        return []
    visited = {start_kmer}
    order = []
    stack = [start_kmer]
    while stack:
        km = stack.pop()
        order.append(km)
        fpacked, _ = codec.encode_strings([km], dbg.k)
        sf, _, pf, _ = dbg.neighbor_presence_packed(fpacked)
        for b in range(3, -1, -1):
            for cand, hit in (("ACGT"[b] + km[:-1], pf[0, b]),
                              (km[1:] + "ACGT"[b], sf[0, b])):
                if hit and cand not in visited:
                    visited.add(cand)
                    stack.append(cand)
    return order


def nb_connected_components(dbg: ColoredDBG) -> int:
    """Number of connected components (reference get_nb_connected_component
    :937), via batched label propagation on the whole graph at once.

    Device algorithm: labels = row index; repeat {gather neighbor labels, take
    min, psum-style converge} until fixpoint — O(diameter) batched rounds.
    """
    n = dbg.nb_kmers
    if n == 0:
        return 0
    packed = dbg.extract_kmers_packed()
    sf, si, pf, pi = dbg.neighbor_presence_packed(packed)
    # neighbor index matrix [n, 8]; self-loop where absent
    self_idx = np.arange(n, dtype=np.int32)[:, None]
    nbr = np.concatenate([np.where(sf, si, self_idx),
                          np.where(pf, pi, self_idx)], axis=1)
    labels = jnp.arange(n, dtype=jnp.int32)
    nbr_d = jnp.asarray(nbr)

    @jax.jit
    def step(lab):
        neigh = jnp.min(lab[nbr_d], axis=1)
        new = jnp.minimum(lab, neigh)
        # pointer-jumping accelerates convergence
        return jnp.minimum(new, new[new])

    prev = None
    lab = labels
    while prev is None or not bool(jnp.array_equal(lab, prev)):
        prev = lab
        lab = step(lab)
    return int(jnp.unique(lab).size)


def cdbg_traversal(dbg: ColoredDBG) -> list[str]:
    """Whole-graph traversal visiting every k-mer once (reference
    cdbg_traversal :883): BFS restarted from every unvisited k-mer."""
    n = dbg.nb_kmers
    strs = codec.decode_strings(dbg.extract_kmers_packed(), dbg.k)
    visited: set[str] = set()
    order = []
    for s in strs:
        if s not in visited:
            comp = bfs(dbg, s)
            visited.update(comp)
            order.extend(comp)
    return order
