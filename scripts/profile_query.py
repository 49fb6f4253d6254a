"""Decompose end-to-end query cost on one TPU chip (VERDICT r2 weak #1).

Round-2 finding: the Pallas rank kernel does ~84M lookups/s kernel-level,
but end-to-end query_kmers_packed measured only 4-5M/s.  This script splits
the path into stages, each timed with a minimal host sync:

  1. presence-only lookup (kernel + found/idx)        [device, tiny sync]
  2. + color-class bitmap materialization             [device, tiny sync]
  3. + full result transfer to host (np.asarray)      [the tunnel tax]

Run on the real chip: python scripts/profile_query.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bloomfiltertrie_tpu.config import BFTConfig
    from bloomfiltertrie_tpu.models.cdbg import ColoredDBG

    k = 31
    batch = 1 << 20
    n_batches = 8
    total = batch * n_batches

    cfg = BFTConfig(k=k, initial_capacity=1 << 24,
                    initial_color_capacity=1 << 20,
                    bloom_log2_bits=26, batch_size=batch,
                    pending_runs=n_batches)
    dbg = ColoredDBG(cfg)

    gen = jax.jit(
        lambda key: jax.random.bits(key, (total, 2), jnp.uint32)
        & jnp.asarray([0xFFFFFFFF, 0xFFFFFFFC], dtype=jnp.uint32)[None, :])
    data = gen(jax.random.PRNGKey(0))
    data2 = gen(jax.random.PRNGKey(1))
    jax.block_until_ready((data, data2))
    print("# building 16M-row index...", file=sys.stderr, flush=True)
    dbg.insert_genome("g0", data)
    dbg.insert_genome("g1", jnp.concatenate(
        [data[: total // 2], data2[: total // 2]]))
    print(f"# n={dbg.nb_kmers}", file=sys.stderr, flush=True)

    m = 1 << 20
    queries = jnp.concatenate(
        [data[: m // 2], data2[total // 2: total // 2 + m // 2]])
    jax.block_until_ready(queries)

    from bloomfiltertrie_tpu.models.cdbg import (_presence_only,
                                                 _query_colors)
    t = dbg.table
    use_pallas = dbg._pallas_eligible()
    valid = jnp.ones((m,), bool)

    def timeit(name, fn, sync, reps=5):
        fn()  # compile
        jax.block_until_ready(sync())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            s = sync(out)
            if hasattr(s, "block_until_ready"):
                s.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:8.2f} ms  ({m/best/1e6:7.1f} M q/s)",
              flush=True)
        return best

    # 1. presence only, device-resident, sync via 1-scalar reduction
    def presence():
        f, i = _presence_only(t.keys, t.n, t.bucket_starts, queries, valid,
                              use_pallas=use_pallas)
        return f, i
    timeit("presence only  (device)", presence,
           lambda o=None: (presence()[0].sum()) if o is None else o[0].sum())

    # 2. presence + bitmap, device-resident
    def with_bitmap():
        f, i, c, bm = _query_colors(t.keys, t.n, t.bucket_starts,
                                    t.color_ref, dbg.colors, queries, valid,
                                    use_pallas=use_pallas)
        return f, bm
    timeit("+ color bitmap (device)", with_bitmap,
           lambda o=None: (with_bitmap()[1].sum()) if o is None
           else o[1].sum())

    # 3. full host transfer (the public query_kmers_packed)
    import numpy as np

    def full_transfer():
        f, bm = dbg.query_kmers_packed(queries)
        return f, bm
    t0 = time.perf_counter()
    f, bm = full_transfer()
    dt = time.perf_counter() - t0
    print(f"+ host transfer (np out): {dt*1e3:8.2f} ms  "
          f"({m/dt/1e6:7.1f} M q/s)  [{(f.nbytes + bm.nbytes)/2**20:.1f} MiB"
          " moved]", flush=True)
    t0 = time.perf_counter()
    f, bm = full_transfer()
    dt = time.perf_counter() - t0
    print(f"+ host transfer (warm):   {dt*1e3:8.2f} ms  "
          f"({m/dt/1e6:7.1f} M q/s)", flush=True)


if __name__ == "__main__":
    main()
