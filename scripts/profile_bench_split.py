"""Split bench-scenario timing: per-chunk, flush, compress_colors."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_log_compiles", True)

from bloomfiltertrie_tpu.config import BFTConfig
from bloomfiltertrie_tpu.models.cdbg import ColoredDBG

k = 31
batch = 1 << 20
total = batch * 4

cfg = BFTConfig(k=k, initial_capacity=1 << 24, initial_color_capacity=1 << 22,
                bloom_log2_bits=26, batch_size=batch)
dbg = ColoredDBG(cfg)

gen = jax.jit(
    lambda key: jax.random.bits(key, (total, 2), jnp.uint32)
    & jnp.asarray([0xFFFFFFFF, 0xFFFFFFFC], dtype=jnp.uint32)[None, :])
data = gen(jax.random.PRNGKey(0))
data2 = gen(jax.random.PRNGKey(1))
jax.block_until_ready((data, data2))

dbg.start_genome("g0")
t0 = time.perf_counter()
dbg.insert_kmers_packed(data[:batch], sync_stats=False)
dbg.end_genome()
print(f"warmup cycle: {time.perf_counter()-t0:.1f}s", flush=True)

dbg.start_genome("g0b")
for i in range(1, 4):
    t0 = time.perf_counter()
    dbg.insert_kmers_packed(data[i * batch:(i + 1) * batch], sync_stats=False)
    jax.device_get(dbg.table.n)
    print(f"g0b chunk {i}: {time.perf_counter()-t0:.3f}s", flush=True)
t1 = time.perf_counter()
dbg.flush()
t2 = time.perf_counter()
print(f"g0b flush: {t2-t1:.3f}s", flush=True)
dbg.end_genome()
print(f"g0b compress: {time.perf_counter()-t2:.3f}s", flush=True)

dbg.start_genome("g1")
mix = jnp.concatenate([data[: total // 2], data2[: total // 2]])
jax.block_until_ready(mix)
for i in range(4):
    t0 = time.perf_counter()
    dbg.insert_kmers_packed(mix[i * batch:(i + 1) * batch], sync_stats=False)
    jax.device_get(dbg.table.n)
    print(f"g1 chunk {i}: {time.perf_counter()-t0:.3f}s", flush=True)
t1 = time.perf_counter()
dbg.flush()
t2 = time.perf_counter()
print(f"g1 flush: {t2-t1:.3f}s", flush=True)
dbg.end_genome()
print(f"g1 compress: {time.perf_counter()-t2:.3f}s", flush=True)
