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

from bloomfiltertrie_tpu.models import graph_batch
from bloomfiltertrie_tpu.models.cdbg import ColoredDBG
from bloomfiltertrie_tpu.ops import codec


def _popcount_rows(bitmap: np.ndarray) -> np.ndarray:
    """Per-row set-bit count of a uint32 bitmap [N, cw]."""
    return np.unpackbits(
        bitmap.view(np.uint8).reshape(bitmap.shape[0], -1), axis=1).sum(axis=1)


def _color_counts(dbg: ColoredDBG) -> np.ndarray:
    """Number of colors of every k-mer in the index, in table order."""
    return dbg.color_counts()


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


def _links(dbg: ColoredDBG):
    """Device succ/pred index matrices for the whole graph (one probe)."""
    dbg.flush()
    return graph_batch.neighbor_links(
        dbg.table.keys, dbg.table.n, dbg.table.bucket_starts, dbg.k,
        use_pallas=dbg._pallas_eligible())


def _start_index(dbg: ColoredDBG, start_kmer: str) -> int | None:
    from bloomfiltertrie_tpu.ops import sortedset as ss
    packed, valid = codec.encode_strings([start_kmer], dbg.k)
    if not valid.all():
        return None
    dbg.flush()
    found, idx = ss.lookup(dbg.table.keys, dbg.table.n,
                           jnp.asarray(packed), dbg.table.bucket_starts)
    if not bool(jax.device_get(found)[0]):
        return None
    return int(jax.device_get(idx)[0])


def extract_simple_paths(dbg: ColoredDBG) -> list[str]:
    """Maximal non-branching paths (unitigs), reference :115.

    Device-scale: one batched neighbor probe + pointer-doubling unitig
    partition + one sort (models/graph_batch.py) — O(log n) device rounds,
    no per-vertex host walk.
    """
    return graph_batch.extract_unitigs(dbg)


def bfs(dbg: ColoredDBG, start_kmer: str, genome_id: int | None = None
        ) -> list[str]:
    """Frontier-parallel BFS from a k-mer (reference BFS :605 /
    BFS_subgraph :667 when ``genome_id`` restricts to one color).

    Returns visited k-mers in BFS-level order (within a level: sorted —
    identical to sorted-row order since the table is key-sorted).  One fused
    device step per level.
    """
    start = _start_index(dbg, start_kmer)
    if start is None:
        return []
    succ, pred = _links(dbg)
    eligible = None
    if genome_id is not None:
        eligible = dbg.has_genome_mask(genome_id).at[start].set(True)
    level = graph_batch.bfs_levels(succ, pred, start, eligible)
    return _order_by_level(dbg, level)


def _order_by_level(dbg: ColoredDBG, level, comp=None) -> list[str]:
    """Decode rows with level >= 0 ordered by (component, level, row)."""
    cap = level.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    reached = (level >= 0) & (iota < dbg.table.n)
    sortkeys = (jnp.where(reached, comp if comp is not None else 0, cap),
                jnp.where(reached, level, cap), iota)
    _, _, rows = jax.lax.sort(sortkeys, num_keys=3)
    m = int(jax.device_get(jnp.sum(reached.astype(jnp.int32))))
    if m == 0:
        return []
    keys = np.asarray(jax.device_get(dbg.table.keys[rows[:m]]))
    return codec.decode_strings(keys, dbg.k)


def dfs(dbg: ColoredDBG, start_kmer: str) -> list[str]:
    """DFS from a k-mer (reference DFS :743).

    DFS order is inherently sequential; the device supplies the full
    neighbor-index matrix in ONE probe and the host walks int32 arrays
    (no per-vertex device call).
    """
    start = _start_index(dbg, start_kmer)
    if start is None:
        return []
    succ_d, pred_d = _links(dbg)
    n = dbg.nb_kmers
    succ = np.asarray(jax.device_get(succ_d[:n]))
    pred = np.asarray(jax.device_get(pred_d[:n]))
    visited = np.zeros(n, dtype=bool)
    visited[start] = True
    order_idx = []
    stack = [start]
    while stack:
        i = stack.pop()
        order_idx.append(i)
        for b in range(3, -1, -1):
            for cand in (pred[i, b], succ[i, b]):
                if cand >= 0 and not visited[cand]:
                    visited[cand] = True
                    stack.append(int(cand))
    keys = np.asarray(jax.device_get(dbg.table.keys))[order_idx]
    return codec.decode_strings(keys, dbg.k)


def nb_connected_components(dbg: ColoredDBG) -> int:
    """Number of connected components (reference get_nb_connected_component
    :937): min-label hooking + pointer jumping, O(log n) device rounds."""
    return graph_batch.nb_connected_components(dbg)


def cdbg_traversal(dbg: ColoredDBG) -> list[str]:
    """Whole-graph traversal visiting every k-mer once (reference
    cdbg_traversal :883).

    Equivalent to BFS restarted from every unvisited k-mer in sorted order,
    computed as ONE multi-source BFS (sources = per-component minimum rows)
    followed by a (component, level, row) sort — fully batched.
    """
    dbg.flush()
    n = dbg.nb_kmers
    if n == 0:
        return []
    succ, pred = _links(dbg)
    lab = graph_batch.component_labels(succ, dbg.table.n)
    iota = jnp.arange(succ.shape[0], dtype=jnp.int32)
    sources = (lab == iota) & (iota < dbg.table.n)
    level = graph_batch.multi_source_bfs_levels(succ, pred, sources)
    return _order_by_level(dbg, level, comp=lab)
