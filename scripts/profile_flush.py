"""Stage-by-stage cost of the per-genome flush at bench shapes (TPU).

Bench flush: CAP=2^24 table, 8M-k-mer run buffer, k=31 (W=2).  Times each
stage of models/table.py insert_sorted_impl separately, plus the fused
flush_genome, to locate non-SoL overheads (BASELINE.md SoL table evidence).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bloomfiltertrie_tpu.models import table as tbl  # noqa: E402
from bloomfiltertrie_tpu.ops import bloom as bloom_ops  # noqa: E402
from bloomfiltertrie_tpu.ops import pallas_kernels as pk  # noqa: E402
from bloomfiltertrie_tpu.ops import sortedset as ss  # noqa: E402

CAP = 1 << 24
M = 1 << 23          # 8M: the whole per-genome run buffer
W = 2
LOG2B = 26
S = 8


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:8.1f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    raw = jax.random.bits(key, (CAP, W), dtype=jnp.uint32)
    tk = jax.lax.sort(tuple(raw[:, i] for i in range(W)), num_keys=W)
    half = jnp.stack(tk, axis=-1)[::2]          # 8M sorted live rows
    tkeys = jnp.concatenate([
        half, jnp.full((CAP - half.shape[0], W), ss.SENTINEL, jnp.uint32)])
    n = jnp.int32(half.shape[0])
    cref = jnp.where(jnp.arange(CAP) < n, 0, -1).astype(jnp.int32)
    flags = jnp.zeros((CAP,), jnp.uint8)
    ids = jnp.full((1 << 20, S), tbl.EMPTY_ID, jnp.int32)
    ids = ids.at[0, 0].set(0)
    colors = tbl.ColorStore(ids=ids, rows=jnp.zeros((1 << 10, 1), jnp.uint32),
                            sd=jnp.int32(1), dd=jnp.int32(0))
    bloom = jnp.zeros((1 << (LOG2B - 5),), jnp.uint32)
    starts = ss.build_bucket_starts(tkeys, n)
    table = tbl.KmerTable(keys=tkeys, color_ref=cref, flags=flags, n=n,
                          bucket_starts=starts)
    # batch: half hits (existing rows), half new
    batch = jnp.concatenate([
        half[: M // 2],
        jax.random.bits(jax.random.PRNGKey(7), (M // 2, W), jnp.uint32)])
    valid = jnp.ones((M,), bool)
    jax.block_until_ready((table.keys, batch))

    sq = jax.jit(ss.sort_queries)
    skeys, svalid, skeep = timeit("1 sort_queries (8M)", sq, batch, valid)

    rk = jax.jit(pk.rank_sorted)
    found, idx = timeit("2 pallas rank probe (8M vs 16M)", rk,
                        table.keys, n, skeys, svalid)

    cu = jax.jit(lambda t, c, f, i: tbl._color_update(
        t, c, f, i, jnp.int32(1), affected_budget=2048))
    timeit("3 color update (8M, budget 2K)", cu, table, colors,
           found & skeep, idx)

    mg = jax.jit(lambda tk, n, sk, new, cr, fl: ss.merge_into_masked(
        tk, n, sk, new, table_payloads=(cr, fl),
        new_payloads=(jnp.full((M,), 1, jnp.int32),
                      jnp.zeros((M,), jnp.uint8))))
    is_new = svalid & skeep & ~found
    timeit("4 merge_into_masked (16M+8M)", mg, table.keys, n, skeys, is_new,
           cref, flags)

    ba = jax.jit(lambda b, k_, v: bloom_ops.add(b, k_, v, LOG2B,
                                                jnp.uint32(1), jnp.uint32(2)))
    timeit("5 bloom add (8M)", ba, bloom, skeys, is_new)

    bs = jax.jit(ss.build_bucket_starts)
    timeit("6 build_bucket_starts (16M)", bs, table.keys, n)

    cc = jax.jit(tbl.compress_colors)
    timeit("7 compress_colors (1M pool)", cc, table, colors)

    runs = tbl.PendingRuns(keys=batch.reshape(8, M // 8, W),
                           valid=valid.reshape(8, M // 8),
                           used=jnp.int32(8))
    fg = jax.jit(lambda t, c, r, b: tbl.flush_genome_impl(
        t, c, r, b, jnp.int32(1), jnp.int32(0), LOG2B,
        jnp.uint32(1), jnp.uint32(2), use_pallas=True, use_bloom=True,
        affected_budget=2048))
    timeit("FULL flush_genome (8M)", fg, table, colors, runs, bloom)
    fg2 = jax.jit(lambda t, c, r, b: tbl.flush_genome_impl(
        t, c, r, b, jnp.int32(1), jnp.int32(0), LOG2B,
        jnp.uint32(1), jnp.uint32(2), use_pallas=True, use_bloom=False,
        affected_budget=2048))
    timeit("FULL flush_genome (no bloom)", fg2, table, colors, runs, bloom)


if __name__ == "__main__":
    main()
