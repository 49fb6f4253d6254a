"""Timed device-side sharded merge (VERDICT r4 #6 done-criterion).

Builds two sharded indexes of >= 1M distinct k-mers each (overlapping key
sets and multi-genome colors) on a real 1-device TPU mesh, then times
``merge_into_sharded(a, b)`` — the masked window-flush path that never
materializes (k-mer, genome) pairs.  Emits one JSON line for docs/.
"""

import json
import os
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from bloomfiltertrie_tpu.config import BFTConfig
    from bloomfiltertrie_tpu.models.merge import merge_into_sharded
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh

    k, w = 31, 2
    n_genomes = 32
    per_genome = 1 << 16          # 2M rows per build, ~1.1M distinct each
    rows = n_genomes * per_genome
    tail = jnp.asarray([0xFFFFFFFF, 0xFFFFFFFC], jnp.uint32)[None, :]
    cfg = BFTConfig(k=k, initial_capacity=1 << 21,
                    initial_color_capacity=1 << 14, bloom_log2_bits=22,
                    batch_size=rows, pending_runs=1, genome_window=32,
                    treshold_compression=0, bloom_enabled=False)

    def gen(seed):
        core = jax.random.bits(jax.random.PRNGKey(7), (1 << 15, w),
                               jnp.uint32) & tail
        parts = []
        for g in range(n_genomes):
            u = jax.random.bits(jax.random.PRNGKey(seed + g),
                                (per_genome - (1 << 15), w),
                                jnp.uint32) & tail
            parts += [core, u]
        return jnp.concatenate(parts)

    row_gid = jnp.arange(rows, dtype=jnp.int32) // per_genome
    b1, b2 = gen(100), gen(5000)   # share the 32k-core keys
    jax.block_until_ready((b1, b2, row_gid))

    def build(tag, batch):
        dbg = ShardedCDBG(cfg, mesh=make_mesh(1))
        dbg._ensure_colors(0, 0, genomes=2 * n_genomes)
        dbg.insert_genomes_bulk([f"{tag}{g}" for g in range(n_genomes)],
                                batch, row_gid)
        dbg.flush()
        return dbg

    log("building a and b (+warmup of merge programs)...")
    a_w, b_w = build("aw", b1), build("bw", b2)
    merge_into_sharded(a_w, b_w)   # warmup: compiles + loads all programs
    n_expected = a_w.nb_kmers
    del a_w, b_w
    a, b = build("a", b1), build("b", b2)
    na, nb = a.nb_kmers, b.nb_kmers
    log(f"a: {na} k-mers, b: {nb}; timing merge...")
    t0 = time.monotonic()
    merge_into_sharded(a, b)
    dt = time.monotonic() - t0
    nm = a.nb_kmers
    assert nm == n_expected
    assert a.nb_genomes == 2 * n_genomes
    print(json.dumps({
        "section": "sharded_merge_masked",
        "n_a": int(na), "n_b": int(nb), "n_merged": int(nm),
        "genomes_merged": 2 * n_genomes,
        "merge_s": round(dt, 2),
        "merged_keys_per_s": round(nb / dt),
        "note": "device-side masked window flush; no (k-mer, genome) pair "
                "materialization on host or device",
    }), flush=True)


if __name__ == "__main__":
    main()
