"""Phase-level timing of the insert step at bench sizes on the live backend.

Usage: python scripts/profile_insert.py [cap_log] [batch_log]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bloomfiltertrie_tpu.models import table as tbl
from bloomfiltertrie_tpu.ops import bloom as bloom_ops
from bloomfiltertrie_tpu.ops import sortedset as ss

cap_log = int(sys.argv[1]) if len(sys.argv) > 1 else 24
batch_log = int(sys.argv[2]) if len(sys.argv) > 2 else 20
CAP, M, W = 1 << cap_log, 1 << batch_log, 2


def timed(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return out


@jax.jit
def mk(key):
    tab = jax.random.bits(key, (CAP, W), jnp.uint32)
    tab = jnp.stack(jax.lax.sort(tuple(tab[:, i] for i in range(W)),
                                 num_keys=W), axis=-1)
    batch = jax.random.bits(jax.random.fold_in(key, 1), (M, W), jnp.uint32)
    return tab, batch


table_keys, batch = mk(jax.random.PRNGKey(0))
n = jnp.asarray(CAP // 2, jnp.int32)
valid = jnp.ones((M,), bool)
cref = jnp.zeros((CAP,), jnp.int32)
flags = jnp.zeros((CAP,), jnp.uint8)
rows = jnp.zeros((1 << 22, 1), jnp.uint32)
bloom = jnp.zeros((1 << 21,), jnp.uint32)

print(f"cap=2^{cap_log} M=2^{batch_log}", flush=True)

starts = jax.jit(ss.build_bucket_starts)(table_keys, n)

timed("sort_unique(batch)", jax.jit(ss.sort_unique), batch, valid)
timed("searchsorted M over cap", jax.jit(ss.searchsorted), table_keys, batch)
timed("searchsorted bucketed", jax.jit(ss.searchsorted_bucketed),
      table_keys, starts, batch)
timed("build_bucket_starts", jax.jit(ss.build_bucket_starts), table_keys, n)
timed("lookup (bucketed)", jax.jit(ss.lookup), table_keys, n, batch, starts)


@jax.jit
def merge_part(table_keys, batch):
    cnt, uk, _ = ss.sort_unique(batch, jnp.ones((M,), bool))
    return ss.merge_into(table_keys, n, uk, cnt)[0]


timed("sort_unique + merge_into", merge_part, table_keys, batch)


@jax.jit
def bloom_part(bloom, batch):
    return bloom_ops.add(bloom, batch, jnp.ones((M,), bool), 26,
                         jnp.uint32(1), jnp.uint32(2))


timed("bloom add", bloom_part, bloom, batch)


def mk_full_insert(use_pallas):
    @jax.jit
    def full_insert(table_keys, cref, flags, n, rows, bloom, batch):
        t = tbl.KmerTable(keys=table_keys, color_ref=cref, flags=flags, n=n,
                          bucket_starts=starts)
        c = tbl.ColorStore(ids=jnp.full((rows.shape[0], 4), tbl.EMPTY_ID, jnp.int32),
                           rows=rows, sd=jnp.asarray(2, jnp.int32), dd=jnp.asarray(0, jnp.int32))
        t2, c2, b2, stats = tbl.insert_batch_impl(
            t, c, bloom, batch, jnp.ones((M,), bool),
            jnp.int32(1), jnp.int32(1), 26, jnp.uint32(1), jnp.uint32(2),
            use_pallas=use_pallas)
        return stats["n"]
    return full_insert


timed("FULL insert_batch (xla)", mk_full_insert(False), table_keys, cref,
      flags, n, rows, bloom, batch)
if jax.default_backend() == "tpu":
    from bloomfiltertrie_tpu.ops import pallas_kernels as pk
    timed("pallas rank_sorted", functools.partial(pk.rank_sorted),
          table_keys, n, batch_sorted := jnp.stack(jax.lax.sort(
              tuple(batch[:, i] for i in range(W)), num_keys=W), axis=-1),
          valid)
    timed("FULL insert_batch (pallas)", mk_full_insert(True), table_keys,
          cref, flags, n, rows, bloom, batch)
