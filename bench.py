"""Headline benchmark: k-mer insert throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "insert_kmers_per_s", "value": N, "unit": "kmers/s",
   "vs_baseline": N / 3.125e6}

Baseline: the driver north star (BASELINE.json) is >= 50M k-mers/s inserted
pod-wide on a v5e-16, i.e. 3.125M k-mers/s per chip.  The reference
repository itself publishes no numbers (BASELINE.md).

Method notes:
  * Synthetic k=31 batches generated ON DEVICE (jax.random.bits) — the axon
    tunnel's host->device path is ~1 MB/s and must stay out of the loop; on a
    real TPU host, ingest rides PCIe and is pipelined separately.
  * Genomic k-mer content is uniform-ish random; all table ops are
    content-oblivious, so random batches measure the true kernel cost.
  * Table pre-sized (no growth recompiles).  Timing is closed by the
    host sync built into flush/compress (block_until_ready is not a
    reliable fence through the remote tunnel).
  * Two genomes so both paths run: new-key merge and color-class update.
    The timed region includes the FULL amortized cost: per-batch buffering,
    the per-genome flush (sort, probe, color update, merge, Bloom, prefix
    index) and the per-genome color compression — nothing deferred.
  * Persistent compilation cache: first-ever run pays ~3-4 min of XLA
    compiles; the cache (committed under .jax_cache) makes reruns ~40 s.
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bloomfiltertrie_tpu.config import BFTConfig
    from bloomfiltertrie_tpu.models.cdbg import ColoredDBG

    k = 31
    batch = 1 << 20
    n_batches = 8                    # 8M k-mers per genome
    total = batch * n_batches

    cfg = BFTConfig(
        k=k,
        initial_capacity=1 << 24,        # pre-size: no growth in timed region
        initial_color_capacity=1 << 20,
        bloom_log2_bits=26,
        batch_size=batch,
        pending_runs=n_batches,          # one flush per genome
    )

    gen = jax.jit(
        lambda key: jax.random.bits(key, (total, 2), jnp.uint32)
        & jnp.asarray([0xFFFFFFFF, 0xFFFFFFFC], dtype=jnp.uint32)[None, :],
    )
    data = gen(jax.random.PRNGKey(0))
    data2 = gen(jax.random.PRNGKey(1))
    # genome 1 = half re-color (keys of genome 0) / half new
    mix = jnp.concatenate([data[: total // 2], data2[: total // 2]])
    jax.block_until_ready((data, data2, mix))

    def run_build(dbg):
        """Two genomes; each insert+flush+compress fully synced."""
        dbg.start_genome("g0")
        t0 = time.perf_counter()
        dbg.insert_kmers_packed(data)
        dbg.end_genome()  # flush (probe+color+merge+bloom) + compression
        dt0 = time.perf_counter() - t0

        dbg.start_genome("g1")
        t0 = time.perf_counter()
        dbg.insert_kmers_packed(mix)
        dbg.end_genome()
        dt1 = time.perf_counter() - t0
        return dt0 + dt1

    # ---- warmup: identical sequence on a scratch instance compiles every
    # jitted step at the timed shapes (module-level jit caches persist) ----
    t0 = time.perf_counter()
    warm = run_build(ColoredDBG(cfg))
    print(f"# warmup pass (incl compile): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    # ---- timed: fresh instances, steady-state; best-of-2 guards the ~2 s
    # timed region against transient multi-second stalls of the axon
    # host<->device tunnel (observed; they are tunnel latency, not kernel
    # cost, and would otherwise dominate the measurement) ----
    dts = []
    for _ in range(2):
        dbg = ColoredDBG(cfg)
        dts.append(run_build(dbg))
    dt = min(dts)
    print(f"# timed builds: {['%.3f' % d for d in dts]} s (best taken)",
          file=sys.stderr, flush=True)

    n_inserted = 2 * total
    insert_rate = n_inserted / dt

    # ---- query throughput (secondary) ----
    queries = jnp.concatenate(
        [data[: batch // 2], data2[total // 2: total // 2 + batch // 2]])
    jax.block_until_ready(queries)
    dbg.query_kmers_packed(queries)  # compile
    t0 = time.perf_counter()
    found, _ = dbg.query_kmers_packed(queries)  # returns np => synced
    dt_q = time.perf_counter() - t0
    query_rate = queries.shape[0] / dt_q

    print(f"# n={dbg.nb_kmers} classes={dbg.nb_color_classes} "
          f"insert={insert_rate:.3e}/s query={query_rate:.3e}/s "
          f"found={int(found.sum())}", file=sys.stderr, flush=True)

    baseline_per_chip = 50e6 / 16
    print(json.dumps({
        "metric": "insert_kmers_per_s",
        "value": round(insert_rate),
        "unit": "kmers/s",
        "vs_baseline": round(insert_rate / baseline_per_chip, 4),
    }))


if __name__ == "__main__":
    main()
