"""Decompose the batched multi-sequence query (config-5 shape) into stages.

Synthetic table at the config-5 query shape: cap 2^24, n ~ 8.9M live keys
(w=4 words, k=63), cw=32 color words, M = 2^20 query windows over S = 1024
sequences.  Times, per stage, on the real chip:

  1. full _seq_query_counts            (the committed path)
  2. lookup_unsorted alone             (sort + rank kernel + unsort)
  3. rank_sorted alone                 (kernel, pre-sorted queries)
  4. class_bitmap alone                (color decode of M refs)
  5. bit-expand + cumsum chain alone   (the per-(seq, genome) count)

Prints one JSON line.  Evidence driver for the seq-query optimization.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bloomfiltertrie_tpu.models import table as tbl
from bloomfiltertrie_tpu.models import cdbg as cdbg_mod
from bloomfiltertrie_tpu.ops import pallas_kernels as pk
from bloomfiltertrie_tpu.ops import sortedset as ss


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, reps=3):
    def run():
        out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(l.astype(jnp.int32)) if l.dtype != jnp.int32
                else jnp.sum(l) for l in leaves)
        return int(jax.device_get(s))
    run()
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        run()
        best = min(best, time.monotonic() - t0)
    return best


CAP, W, CW = 1 << 24, 4, 32
N = 8_945_664
M, S = 1 << 20, 1 << 10

key = jax.random.PRNGKey(0)
tailmask = jnp.asarray([0xFFFFFFFF] * 3 + [0xFFFFFFFC], jnp.uint32)[None, :]
raw = jax.random.bits(key, (N, W), jnp.uint32) & tailmask
ops = tuple(raw[:, i] for i in range(W))
srt = jax.lax.sort(ops, num_keys=W)
keys = jnp.concatenate([
    jnp.stack(srt, axis=-1),
    jnp.full((CAP - N, W), ss.SENTINEL, jnp.uint32)])
n = jnp.asarray(N, jnp.int32)
starts = ss.build_bucket_starts(keys, n) if hasattr(ss, "build_bucket_starts") else None
if starts is None:
    from bloomfiltertrie_tpu.ops.sortedset import bucket_starts as _bs
    starts = _bs(keys, n)

# color store: 1024 small + 32 dense classes
scap, dcap, swidth = 2048, 64, 8
ids = np.full((scap, swidth), tbl.EMPTY_ID, np.int32)
ids[:1024, :4] = np.random.default_rng(0).integers(0, 1000, (1024, 4))
ids.sort(axis=1)
rows = np.zeros((dcap, CW), np.uint32)
rows[:32] = np.random.default_rng(1).integers(0, 2**32, (32, CW), np.uint64)
colors = tbl.ColorStore(ids=jnp.asarray(ids), rows=jnp.asarray(rows),
                        sd=jnp.asarray(1024, jnp.int32),
                        dd=jnp.asarray(32, jnp.int32))
color_ref = jax.random.randint(jax.random.PRNGKey(3), (CAP,), 0, 1024)

# queries: half hits half misses, shuffled (sequence order)
qhit = keys[:M // 2]
qmiss = jax.random.bits(jax.random.PRNGKey(9), (M - M // 2, W), jnp.uint32) & tailmask
q = jnp.concatenate([qhit, qmiss])
q = q[jax.random.permutation(jax.random.PRNGKey(8), M)]
valid = jnp.ones((M,), bool)
sstart = jnp.arange(S, dtype=jnp.int32) * (M // S)
send = sstart + (M // S)
jax.block_until_ready((keys, starts, colors.ids, colors.rows, color_ref, q))
log("data ready")

t_full = timeit(lambda: cdbg_mod._seq_query_counts(
    keys, n, starts, color_ref, colors, q, valid, sstart, send,
    use_pallas=True))
log(f"full seq_query_counts (block=1): {t_full*1e3:.1f} ms")

t_full64 = timeit(lambda: cdbg_mod._seq_query_counts(
    keys, n, starts, color_ref, colors, q, valid, sstart, send,
    use_pallas=True, block=64))
log(f"full seq_query_counts (block=64): {t_full64*1e3:.1f} ms")

lk = jax.jit(pk.lookup_unsorted)
t_lookup = timeit(lambda: lk(keys, n, q, valid))
log(f"lookup_unsorted: {t_lookup*1e3:.1f} ms")

qs_ops = jax.lax.sort(tuple(q[:, i] for i in range(W)), num_keys=W)
q_sorted = jnp.stack(qs_ops, axis=-1)
jax.block_until_ready(q_sorted)
rk = jax.jit(pk.rank_sorted)
t_rank = timeit(lambda: rk(keys, n, q_sorted, valid))
log(f"rank_sorted: {t_rank*1e3:.1f} ms")

sort_only = jax.jit(lambda q: jax.lax.sort(
    tuple(q[:, i] for i in range(W))
    + (jnp.arange(M, dtype=jnp.int32), valid.astype(jnp.int32)),
    num_keys=W))
t_sort = timeit(lambda: sort_only(q))
log(f"sort(+payload) alone: {t_sort*1e3:.1f} ms")

cls = jnp.where(jax.random.bernoulli(jax.random.PRNGKey(4), 0.5, (M,)),
                color_ref[:M], -1)
cb = jax.jit(lambda c: tbl.class_bitmap(colors, c))
t_bitmap = timeit(lambda: cb(cls))
log(f"class_bitmap: {t_bitmap*1e3:.1f} ms")

bitmap = cb(cls)
jax.block_until_ready(bitmap)


@jax.jit
def count_chain(bitmap):
    cw = bitmap.shape[1]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :]
    outs = []
    for c in range(cw):
        bits = ((bitmap[:, c: c + 1] >> shifts) & 1).astype(jnp.int32)
        cum = jnp.concatenate(
            [jnp.zeros((1, 32), jnp.int32), jnp.cumsum(bits, axis=0)])
        outs.append(cum[send] - cum[sstart])
    return jnp.concatenate(outs, axis=1)


t_count = timeit(lambda: count_chain(bitmap))
log(f"bit-expand+cumsum chain: {t_count*1e3:.1f} ms")


@jax.jit
def count_chain_block(bitmap):
    """Block-reduced alternative: segment boundaries are multiples of B
    here, so pure block cumsum suffices for a lower-bound estimate."""
    cw = bitmap.shape[1]
    B = 256
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    blk = bitmap.reshape(M // B, B, cw)
    outs = []
    for c in range(cw):
        bits = ((blk[:, :, c: c + 1] >> shifts) & 1).astype(jnp.int32)
        part = jnp.sum(bits, axis=1)                      # [M/B, 32]
        cum = jnp.concatenate(
            [jnp.zeros((1, 32), jnp.int32), jnp.cumsum(part, axis=0)])
        outs.append(cum[send // B] - cum[sstart // B])
    return jnp.concatenate(outs, axis=1)


t_count_blk = timeit(lambda: count_chain_block(bitmap))
log(f"block-reduced count chain: {t_count_blk*1e3:.1f} ms")

print(json.dumps({
    "section": "seqquery_profile",
    "M": M, "S": S, "cw": CW, "n": N, "cap": CAP,
    "full_ms": round(t_full * 1e3, 1),
    "full_block64_ms": round(t_full64 * 1e3, 1),
    "lookup_unsorted_ms": round(t_lookup * 1e3, 1),
    "rank_sorted_ms": round(t_rank * 1e3, 1),
    "sort_payload_ms": round(t_sort * 1e3, 1),
    "class_bitmap_ms": round(t_bitmap * 1e3, 1),
    "count_chain_ms": round(t_count * 1e3, 1),
    "count_chain_block_ms": round(t_count_blk * 1e3, 1),
}), flush=True)
