"""Sequence-parallel k-merization: split a long genome across the mesh.

The reference streams FASTx chunks with a (k-1)-char carry buffer so windows
never straddle chunk boundaries (src/file_io.c:277-318, commented but
definitional).  The TPU analogue (SURVEY §5 long-context row): split a
length-L sequence into contiguous per-device segments, exchange a
(k-1)-symbol halo with the RIGHT neighbor over ICI (``lax.ppermute``), and
k-merize each segment as a dense 2-bit tensor op — sequence length scales
linearly with devices, the only cross-device traffic is the k-1 halo.

The device k-merizer is shared with the single-chip path: 16 slice-shifts
per packed word (no gathers), window validity via a cumulative bad-symbol
count — everything VPU-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from bloomfiltertrie_tpu.ops.codec import words_for_k

AXIS = "shards"
INVALID = np.uint8(4)  # numpy scalar: import must not init the backend


def kmerize_codes_device(codes: jnp.ndarray, k: int, n_windows: int):
    """Pack all length-k windows of a 2-bit code array (device side).

    codes: uint8[m + k - 1] with values 0..3 (>=4 marks invalid symbols).
    Returns (packed uint32[n_windows, W], valid bool[n_windows]).
    """
    w = words_for_k(k)
    packed = []
    for wi in range(w):
        word = jnp.zeros((n_windows,), dtype=jnp.uint32)
        for j in range(min(16, k - 16 * wi)):
            off = 16 * wi + j
            sym = codes[off: off + n_windows].astype(jnp.uint32) & 3
            word = word | (sym << jnp.uint32(30 - 2 * j))
        packed.append(word)
    bad = (codes >= 4).astype(jnp.int32)
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(bad)])
    valid = (cum[k:] - cum[:-k])[:n_windows] == 0
    return jnp.stack(packed, axis=-1), valid


def _seqpar_body(codes_seg, *, k: int):
    """Per-device: receive (k-1)-halo from the right neighbor, k-merize."""
    n = jax.lax.axis_size(AXIS)
    seg = codes_seg.shape[-1]
    head = jax.lax.dynamic_slice_in_dim(codes_seg[0], 0, k - 1)
    # send my first k-1 symbols to my LEFT neighbor (they extend its tail)
    halo = jax.lax.ppermute(head, AXIS, [(i, (i - 1) % n) for i in range(n)])
    idx = jax.lax.axis_index(AXIS)
    # the last device's wrap-around halo is invalid (no sequence follows)
    halo = jnp.where(idx == n - 1, jnp.full_like(halo, INVALID), halo)
    ext = jnp.concatenate([codes_seg[0], halo])
    packed, valid = kmerize_codes_device(ext, k, seg)
    return packed[None], valid[None]


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def _kmerize_sharded(codes, k: int, mesh: Mesh):
    fn = jax.shard_map(
        functools.partial(_seqpar_body, k=k), mesh=mesh, check_vma=False,
        in_specs=P(AXIS), out_specs=(P(AXIS), P(AXIS)))
    return fn(codes)


def kmerize_sequence_sharded(seq: bytes | np.ndarray, k: int, mesh: Mesh):
    """All k-mer windows of one long sequence, computed mesh-parallel.

    Returns (packed uint32[n_shards*seg, W], valid bool[...]) with rows
    sharded over the mesh in sequence order; invalid rows cover windows with
    non-ACGT symbols and the padded tail.  Equivalent (on valid rows) to
    ``ops.codec.kmerize_sequence``.
    """
    from bloomfiltertrie_tpu.ops.codec import ascii_to_codes
    n = mesh.devices.size
    buf = np.frombuffer(seq, dtype=np.uint8) if isinstance(
        seq, (bytes, bytearray)) else np.asarray(seq, dtype=np.uint8)
    codes = np.asarray(ascii_to_codes(buf), dtype=np.uint8)
    seg = max((len(codes) + n - 1) // n, k - 1)
    padded = np.full((n * seg,), 4, dtype=np.uint8)
    padded[: len(codes)] = codes
    sharded = jax.device_put(
        padded.reshape(n, seg),
        jax.sharding.NamedSharding(mesh, P(AXIS)))
    packed, valid = _kmerize_sharded(sharded, k, mesh)
    return (np.asarray(packed).reshape(n * seg, -1),
            np.asarray(valid).reshape(n * seg))
