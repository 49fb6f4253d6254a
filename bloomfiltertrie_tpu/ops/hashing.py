"""Word-wise hashing for Bloom probes and shard routing (device side).

The reference prebuilds a table of two XXH64 hashes per 9-char prefix at root
creation (``create_hash_v_array`` include/Node.h:158-185) and probes a
1504-bit per-CC Bloom filter (``presenceKmer`` src/presenceNode.c:1335-1350).
Our Bloom plane is per shard and the hash is a MurmurHash3-style 32-bit mix —
pure uint32 multiply/rotate/xor, which vectorizes perfectly on the VPU.  The
exact hash need not match the reference: SURVEY §3.3 — Bloom behavior affects
*layout* in the reference, never query answers; here it is a pure accelerator.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars (not jnp arrays): module import must not initialize the XLA
# backend — jax.distributed.initialize in multi-process runs comes after
# package import.  Inside traced code they behave identically.
_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def hash_words(keys: jnp.ndarray, seed) -> jnp.ndarray:
    """Murmur3-style hash of packed keys [..., W] -> uint32 [...]."""
    h = jnp.full(keys.shape[:-1], seed, dtype=jnp.uint32)
    for i in range(keys.shape[-1]):
        kk = keys[..., i].astype(jnp.uint32) * _C1
        kk = _rotl(kk, 15) * _C2
        h = h ^ kk
        h = _rotl(h, 13) * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    h = h ^ jnp.uint32(4 * keys.shape[-1])
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h
