"""Break down the insert step cost on the real TPU chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bloomfiltertrie_tpu.models import table as tbl
from bloomfiltertrie_tpu.ops import bloom as bloom_ops
from bloomfiltertrie_tpu.ops import pallas_kernels as pk
from bloomfiltertrie_tpu.ops import sortedset as ss

CAP = 1 << 24
M = 1 << 20
W = 2
LOG2B = 26

key = jax.random.PRNGKey(0)
tkeys = jax.random.bits(key, (CAP, W), dtype=jnp.uint32)
tkeys = jnp.stack([jnp.sort(tkeys[:, 0]), tkeys[:, 1]], axis=-1)  # approx sorted
# make it truly sorted rows:
tk = jax.lax.sort((tkeys[:, 0], tkeys[:, 1]), num_keys=2)
tkeys = jnp.stack(tk, axis=-1)
n = jnp.int32(CAP // 2)
batch = jax.random.bits(jax.random.PRNGKey(1), (M, W), dtype=jnp.uint32)
valid = jnp.ones((M,), bool)
starts = ss.build_bucket_starts(tkeys, n)
cref = jnp.zeros((CAP,), jnp.int32)
flags = jnp.zeros((CAP,), jnp.uint8)
rows = jnp.zeros((1 << 22, 1), jnp.uint32)
bloom = jnp.zeros((1 << (LOG2B - 5),), jnp.uint32)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:8.2f} ms")
    return out


su = jax.jit(lambda b, v: ss.sort_unique(b, v))
timeit("sort_unique(batch)", su, batch, valid)

rk = jax.jit(lambda tk, n, q, v: pk.rank_sorted(tk, n, q, v))
qsorted = jnp.stack(jax.lax.sort((batch[:, 0], batch[:, 1]), num_keys=2), axis=-1)
timeit("pallas rank_sorted", rk, tkeys, n, qsorted, valid)

lk = jax.jit(lambda tk, n, q, s: ss.lookup(tk, n, q, s))
timeit("xla bucketed lookup", lk, tkeys, n, batch, starts)

mi = jax.jit(lambda tk, n, nk, m: ss.merge_into(
    tk, n, nk, m, table_payloads=(cref, flags),
    new_payloads=(jnp.zeros((M,), jnp.int32), jnp.zeros((M,), jnp.uint8)),
    payload_fills=(-1, 0)))
timeit("merge_into (full sort)", mi, tkeys, n, qsorted, jnp.int32(M))

ba = jax.jit(lambda b, k, v: bloom_ops.add(b, k, v, LOG2B, jnp.uint32(1), jnp.uint32(2)), static_argnums=())
timeit("bloom add", ba, bloom, batch, valid)

bs = jax.jit(lambda tk, n: ss.build_bucket_starts(tk, n))
timeit("build_bucket_starts", bs, tkeys, n)

def run_full(tkeys, cref, flags, n, starts, rows, bloom, batch, valid):
    table = tbl.KmerTable(keys=tkeys, color_ref=cref, flags=flags, n=n,
                          bucket_starts=starts)
    colors = tbl.ColorStore(ids=jnp.full((rows.shape[0], 4), tbl.EMPTY_ID, jnp.int32),
                            rows=rows, sd=jnp.int32(1), dd=jnp.int32(0))
    return tbl.insert_batch_impl(
        table, colors, bloom, batch, valid, jnp.int32(0), jnp.int32(0),
        LOG2B, jnp.uint32(1), jnp.uint32(2), use_pallas=True)


rf = jax.jit(run_full)
timeit("FULL insert_batch (pallas)", rf, tkeys, cref, flags, n, starts, rows,
       bloom, batch, valid)


def run_full_x(tkeys, cref, flags, n, starts, rows, bloom, batch, valid):
    table = tbl.KmerTable(keys=tkeys, color_ref=cref, flags=flags, n=n,
                          bucket_starts=starts)
    colors = tbl.ColorStore(ids=jnp.full((rows.shape[0], 4), tbl.EMPTY_ID, jnp.int32),
                            rows=rows, sd=jnp.int32(1), dd=jnp.int32(0))
    return tbl.insert_batch_impl(
        table, colors, bloom, batch, valid, jnp.int32(0), jnp.int32(0),
        LOG2B, jnp.uint32(1), jnp.uint32(2), use_pallas=False)


rfx = jax.jit(run_full_x)
timeit("FULL insert_batch (xla)", rfx, tkeys, cref, flags, n, starts, rows,
       bloom, batch, valid)
