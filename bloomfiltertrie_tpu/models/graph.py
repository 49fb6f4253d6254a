"""de Bruijn graph topology ops: neighbors, branching (device side).

Reference: ``src/branchingNode.c`` (``isBranchingRight`` :16,
``getRightNeighbors`` :112) and the batch neighbor probes
``presenceNeighborsRight/Left`` (src/presenceNode.c:676,15) which walk the
trie once for the 4 candidate extensions.  Here a successor probe is a pure
bit-shift producing 4 candidate keys per query k-mer, and all 4M candidates
go through one batched binary search — the "one walk for 4 candidates" trick
generalized to "one search wave for the whole batch".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bloomfiltertrie_tpu.ops import sortedset as ss


def tail_info(k: int, words: int):
    """(tail_mask, last_word, last_shift) for the packed layout."""
    r = k - 16 * (words - 1)          # bases used in the last word, 1..16
    if r == 16:
        tail_mask = 0xFFFFFFFF
    else:
        tail_mask = (0xFFFFFFFF << (32 - 2 * r)) & 0xFFFFFFFF
    j = (k - 1) // 16                 # word holding base k-1
    s = 30 - 2 * ((k - 1) % 16)       # shift of base k-1 within that word
    return tail_mask, j, s


def shift_left_append(keys: jnp.ndarray, base, k: int) -> jnp.ndarray:
    """Successor candidate: drop base 0, append ``base`` at position k-1.

    keys: uint32[..., W]; base: scalar/array broadcastable uint32 in 0..3.
    """
    w = keys.shape[-1]
    _, j, s = tail_info(k, w)
    shifted = [None] * w
    for i in range(w):
        hi = keys[..., i] << jnp.uint32(2)
        lo = (keys[..., i + 1] >> jnp.uint32(30)) if i + 1 < w else jnp.uint32(0)
        shifted[i] = hi | lo
    out = jnp.stack(shifted, axis=-1)
    base_word = (jnp.asarray(base, dtype=jnp.uint32) << jnp.uint32(s))
    return out.at[..., j].set(out[..., j] | base_word)


def shift_right_prepend(keys: jnp.ndarray, base, k: int) -> jnp.ndarray:
    """Predecessor candidate: drop base k-1, prepend ``base`` at position 0."""
    w = keys.shape[-1]
    tail_mask, _, _ = tail_info(k, w)
    shifted = [None] * w
    for i in range(w):
        lo = keys[..., i] >> jnp.uint32(2)
        hi = (keys[..., i - 1] << jnp.uint32(30)) if i > 0 else jnp.uint32(0)
        shifted[i] = hi | lo
    out = jnp.stack(shifted, axis=-1)
    base_word = jnp.asarray(base, dtype=jnp.uint32) << jnp.uint32(30)
    out = out.at[..., 0].set(out[..., 0] | base_word)
    return out.at[..., w - 1].set(out[..., w - 1] & jnp.uint32(tail_mask))


def neighbor_candidates(keys: jnp.ndarray, k: int):
    """All 8 neighbor candidates: (successors [M,4,W], predecessors [M,4,W]).

    Successor b order = appended base b (A,C,G,T); predecessor b = prepended
    base b — matching ``getRightNeighbors``/``getLeftNeighbors``'s 4-slot
    result records (src/branchingNode.c:112).
    """
    succ = jnp.stack(
        [shift_left_append(keys, jnp.uint32(b), k) for b in range(4)], axis=-2)
    pred = jnp.stack(
        [shift_right_prepend(keys, jnp.uint32(b), k) for b in range(4)], axis=-2)
    return succ, pred


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def neighbor_presence(table_keys, n, starts, queries, valid, k: int,
                      use_pallas: bool = False):
    """For each query k-mer: presence of its 4 successors and 4 predecessors.

    Returns (succ_found bool[M,4], succ_idx int32[M,4],
             pred_found bool[M,4], pred_idx int32[M,4]).
    """
    m = queries.shape[0]
    succ, pred = neighbor_candidates(queries, k)
    cand = jnp.concatenate([succ.reshape(m * 4, -1), pred.reshape(m * 4, -1)])
    cand_valid = jnp.tile(jnp.repeat(valid, 4), 2)
    if use_pallas:
        from bloomfiltertrie_tpu.ops import pallas_kernels as pk
        found, idx = pk.lookup_unsorted(table_keys, n, cand, cand_valid)
    else:
        found, idx = ss.lookup(table_keys, n, cand, starts)
        found = found & cand_valid
    return (found[: m * 4].reshape(m, 4), idx[: m * 4].reshape(m, 4),
            found[m * 4:].reshape(m, 4), idx[m * 4:].reshape(m, 4))


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def branching_mask(table_keys, n, starts, queries, valid, k: int,
                   use_pallas: bool = False):
    """Branching test per query k-mer.

    Reference semantics (src/file_io.c:943-948): a k-mer is branching iff it
    has > 1 present successors, or else > 1 present predecessors; the query
    k-mer's own presence is NOT required.
    """
    sf, _, pf, _ = neighbor_presence(table_keys, n, starts, queries, valid,
                                     k, use_pallas=use_pallas)
    nb_r = jnp.sum(sf.astype(jnp.int32), axis=1)
    nb_l = jnp.sum(pf.astype(jnp.int32), axis=1)
    return ((nb_r > 1) | (nb_l > 1)) & valid
