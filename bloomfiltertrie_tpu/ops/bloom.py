"""Per-shard Bloom filter bit plane (device side).

Reference: each compressed container keeps a 1504-bit Bloom filter over its
18-bit prefixes (``BF_filter2`` include/CC.h:38-45, probe at
src/presenceNode.c:1335-1362, insert-on-false-positive "recycling" at
src/insertNode.c:127-136).  In the flat-table redesign the filter is a single
2^b-bit plane per shard over whole k-mers, probed with two hashes; it serves
as a cheap negative pre-filter for membership-heavy paths (branching queries
probe 8 candidate neighbours per k-mer).  It never affects answers.

Bit sets use the OR-via-add trick: positions are deduplicated (sort+unique),
so each (word, bit) pair is scattered at most once per batch and a scatter-add
into a zero delta plane equals a scatter-OR; the delta is then OR-ed in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bloomfiltertrie_tpu.ops import hashing


def empty_bits(log2_bits: int) -> jnp.ndarray:
    return jnp.zeros((1 << (log2_bits - 5),), dtype=jnp.uint32)


def _positions(keys, valid, log2_bits, seed1, seed2):
    mask = jnp.uint32((1 << log2_bits) - 1)
    h1 = hashing.hash_words(keys, seed1) & mask
    h2 = hashing.hash_words(keys, seed2) & mask
    big = jnp.uint32(1) << jnp.uint32(log2_bits)  # out-of-plane => dropped
    pos = jnp.concatenate([jnp.where(valid, h1, big), jnp.where(valid, h2, big)])
    return pos


def add(bits: jnp.ndarray, keys: jnp.ndarray, valid: jnp.ndarray,
        log2_bits: int, seed1, seed2) -> jnp.ndarray:
    """Set both hash bits for every valid key; returns new plane."""
    pos = jnp.sort(_positions(keys, valid, log2_bits, seed1, seed2))
    first = jnp.concatenate(
        [jnp.ones((1,), bool), pos[1:] != pos[:-1]]) & (pos >> jnp.uint32(log2_bits) == 0)
    word = (pos >> jnp.uint32(5)).astype(jnp.int32)
    bit = jnp.uint32(1) << (pos & jnp.uint32(31))
    word = jnp.where(first, word, bits.shape[0])  # dropped when duplicate
    delta = jnp.zeros_like(bits).at[word].add(bit, mode="drop")
    return bits | delta


def probe(bits: jnp.ndarray, keys: jnp.ndarray,
          log2_bits: int, seed1, seed2) -> jnp.ndarray:
    """Maybe-present test: True -> must binary search, False -> definitely absent."""
    mask = jnp.uint32((1 << log2_bits) - 1)
    h1 = hashing.hash_words(keys, seed1) & mask
    h2 = hashing.hash_words(keys, seed2) & mask

    def bit_at(h):
        w = bits[(h >> jnp.uint32(5)).astype(jnp.int32)]
        return (w >> (h & jnp.uint32(31))) & jnp.uint32(1)

    return (bit_at(h1) & bit_at(h2)) == 1
