"""Virtual-mesh 1->N relative insert throughput (VERDICT r2 item 7).

Real multi-chip hardware is not available in this environment, so this is
the honest stand-in scaling number: the SAME insert workload on 1/2/4/8
virtual CPU devices (xla_force_host_platform_device_count), reporting
relative per-genome wall time.  All virtual devices share one physical CPU,
so absolute speedup is impossible by construction — the signal here is the
OVERHEAD of the sharded path (all_to_all routing + shard_map + psum) vs the
single-device path on identical totals: overhead factor ~1 means the
sharded machinery adds little work and scaling on real chips is gated by
the collectives, not the algorithm.

Run: python scripts/scaling_virtual.py   (pins JAX_PLATFORMS=cpu itself)
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bloomfiltertrie_tpu.config import BFTConfig
    from bloomfiltertrie_tpu.models.cdbg import ColoredDBG
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh

    k = 31
    w = 2
    n_per_genome = 1 << 18          # 262k k-mers per genome
    n_genomes = 4

    rng = np.random.default_rng(0)
    batches = []
    shared = rng.integers(0, 2**32, size=(n_per_genome // 2, w),
                          dtype=np.uint32)
    for g in range(n_genomes):
        own = rng.integers(0, 2**32, size=(n_per_genome // 2, w),
                           dtype=np.uint32)
        b = np.concatenate([shared, own])
        b[:, -1] &= np.uint32(0xFFFFFFFC)
        batches.append(b)

    cfg = BFTConfig(k=k, initial_capacity=1 << 21,
                    initial_color_capacity=1 << 12,
                    bloom_log2_bits=22, batch_size=1 << 18)

    def build(dbg):
        t0 = time.monotonic()
        for g, b in enumerate(batches):
            dbg.insert_genome(f"g{g}", b)
        return time.monotonic() - t0

    # warm + timed, single-device reference
    build(ColoredDBG(cfg))
    t_single = build(ColoredDBG(cfg))
    total = n_genomes * n_per_genome
    log(f"single-device: {t_single:.2f}s ({total/t_single/1e6:.2f} M/s)")

    rows = {"single": round(t_single, 3)}
    for n_dev in (1, 2, 4, 8):
        build(ShardedCDBG(cfg, mesh=make_mesh(n_dev)))  # warm/compile
        t = build(ShardedCDBG(cfg, mesh=make_mesh(n_dev)))
        rows[f"sharded_{n_dev}"] = round(t, 3)
        log(f"sharded n={n_dev}: {t:.2f}s "
            f"(overhead vs single: {t/t_single:.2f}x)")

    print(json.dumps({
        "section": "virtual_mesh_scaling",
        "kmers_total": total,
        "wall_s": rows,
        "overhead_factor_8dev": round(rows["sharded_8"] / rows["single"], 3),
        "note": ("virtual CPU devices share one physical CPU; the metric is "
                 "sharded-path overhead, not speedup"),
    }), flush=True)


if __name__ == "__main__":
    main()
