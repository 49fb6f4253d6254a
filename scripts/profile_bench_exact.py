"""Mirror bench.py exactly but time every sub-step."""
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
n_batches = 4
total = batch * n_batches

cfg = BFTConfig(k=k, initial_capacity=1 << 24, initial_color_capacity=1 << 22,
                bloom_log2_bits=26, batch_size=batch)

gen = jax.jit(
    lambda key: jax.random.bits(key, (total, 2), jnp.uint32)
    & jnp.asarray([0xFFFFFFFF, 0xFFFFFFFC], dtype=jnp.uint32)[None, :])
data = gen(jax.random.PRNGKey(0))
data2 = gen(jax.random.PRNGKey(1))
jax.block_until_ready((data, data2))

dbg = ColoredDBG(cfg)

dbg.start_genome("g0")
t0 = time.perf_counter()
dbg.insert_kmers_packed(data[:batch], sync_stats=False)
dbg.end_genome()
print(f"warmup: {time.perf_counter()-t0:.1f}s", flush=True)

dbg.start_genome("g0b")
t0 = time.perf_counter()
dbg.insert_kmers_packed(data[batch:], sync_stats=False)
t1 = time.perf_counter()
print(f"g0b insert dispatch: {t1-t0:.3f}s", flush=True)
dbg.flush()
t2 = time.perf_counter()
print(f"g0b flush: {t2-t1:.3f}s", flush=True)
dbg.end_genome()
t3 = time.perf_counter()
print(f"g0b end_genome: {t3-t2:.3f}s", flush=True)
dbg.sync_counts()

dbg.start_genome("g1")
mix = jnp.concatenate([data[: total // 2], data2[: total // 2]])
jax.block_until_ready(mix)
t0 = time.perf_counter()
dbg.insert_kmers_packed(mix, sync_stats=False)
t1 = time.perf_counter()
print(f"g1 insert dispatch: {t1-t0:.3f}s", flush=True)
dbg.flush()
t2 = time.perf_counter()
print(f"g1 flush: {t2-t1:.3f}s", flush=True)
dbg.end_genome()
t3 = time.perf_counter()
print(f"g1 end_genome: {t3-t2:.3f}s", flush=True)
