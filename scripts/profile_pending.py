"""Steady-state per-batch timing of the pending insert path at bench shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bloomfiltertrie_tpu.config import BFTConfig
from bloomfiltertrie_tpu.models.cdbg import ColoredDBG

k = 31
batch = 1 << 20

cfg = BFTConfig(k=k, initial_capacity=1 << 24, initial_color_capacity=1 << 22,
                bloom_log2_bits=26, batch_size=batch)
dbg = ColoredDBG(cfg)

gen = jax.jit(
    lambda key: jax.random.bits(key, (batch, 2), jnp.uint32)
    & jnp.asarray([0xFFFFFFFF, 0xFFFFFFFC], dtype=jnp.uint32)[None, :])

datas = [gen(jax.random.PRNGKey(i)) for i in range(8)]
jax.block_until_ready(datas)

dbg.start_genome("g0")
t0 = time.perf_counter()
dbg.insert_kmers_packed(datas[0], sync_stats=False)
jax.device_get(dbg.table.n)
print(f"compile+first batch: {time.perf_counter()-t0:.1f}s")

for i in range(1, 8):
    t0 = time.perf_counter()
    dbg.insert_kmers_packed(datas[i], sync_stats=False)
    jax.device_get(dbg.table.n)
    print(f"batch {i}: {time.perf_counter()-t0:.3f}s")

t0 = time.perf_counter()
dbg.flush()
print(f"flush (first, incl compile): {time.perf_counter()-t0:.3f}s")

dbg.start_genome("g1")
for i in range(4):
    t0 = time.perf_counter()
    dbg.insert_kmers_packed(datas[i], sync_stats=False)
    jax.device_get(dbg.table.n)
    print(f"g1 batch {i}: {time.perf_counter()-t0:.3f}s")
t0 = time.perf_counter()
dbg.flush()
print(f"flush 2: {time.perf_counter()-t0:.3f}s")
