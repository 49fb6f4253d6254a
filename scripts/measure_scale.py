"""Scale measurements on one TPU chip (BASELINE.md evidence).

1. BASELINE config-5 shape: 1000 genomes, k=63 (multi-word keys, 32-word
   color bitmaps) — pan-genome-structured synthetic data (core + 16 strain
   clusters + per-genome unique k-mers).  Reports color-memory share,
   bytes/class, compact-encoding bytes, build throughput.
2. Graph algorithms at >= 1M k-mers: unitig partition + connected components
   wall time (VERDICT round-1 item 6 "done =" criterion).
3. Bloom negative pre-filter vs direct rank probe at 1M miss-heavy queries.

Writes one JSON line per section to stdout; progress to stderr.
"""

import json
import os
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fence(x):
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(x)
    s = sum(jnp.sum(l[..., :1].astype(jnp.int32)) if l.ndim else l.astype(jnp.int32)
            for l in leaves)
    return int(jax.device_get(s))


def section_config5(emit: bool = True):
    import jax
    import jax.numpy as jnp
    from bloomfiltertrie_tpu.config import BFTConfig
    from bloomfiltertrie_tpu.models.cdbg import ColoredDBG
    from bloomfiltertrie_tpu.models import colors_codec

    k = 63
    w = 4
    n_genomes = 1000
    n_clusters = 16
    core, shell, uniq = 1 << 15, 1 << 15, 1 << 13
    per_genome = core + shell + uniq          # 72k after padding -> 1<<17 run

    # Bulk ingest: generate + append 32 genomes per dispatch, one window
    # flush per genome_window=256 genomes (the multi-genome window flush).
    gb = 128                                  # genomes per generated chunk
    # One gen + one bulk-append dispatch per 128-genome window (each
    # tunneled dispatch costs ~15-25 ms on the wire), and batch_size =
    # chunk_rows with pending_runs=1 makes the flush buffer EXACTLY one
    # window (9.44M rows) — every flush-stage sort/scan/probe runs at the
    # minimum static shape.  Color compression runs ONCE, after the last
    # genome, inside the timed region — exactly the reference build driver
    # (compress_annotations_disk after the final genome,
    # src/file_io.c:192-193); each compress costs a dispatch plus an
    # O(table) color_ref rewrite, so a per-window cadence double-counts it.
    chunk_rows = gb * per_genome
    cfg = BFTConfig(k=k, initial_capacity=1 << 24,
                    initial_color_capacity=1 << 16,
                    bloom_log2_bits=24, batch_size=chunk_rows, pending_runs=1,
                    genome_window=128, treshold_compression=0)
    dbg = ColoredDBG(cfg)
    # Pre-size the color bitmap width for the final genome count: the flush
    # program is shape-specialized on cw, so growing width on the fly would
    # recompile at genomes 33/65/129/257/513 (~5 extra multi-minute XLA
    # compiles over the tunnel); one width from the start = one compile.
    dbg._ensure_colors(0, 0, genomes=n_genomes)

    tailmask = jnp.asarray([0xFFFFFFFF] * 3 + [0xFFFFFFFC],
                           dtype=jnp.uint32)[None, :]

    def rand_keys(key, n):
        # clear the 2 unused tail bits of k=63 (63*2 = 126 of 128)
        return jax.random.bits(key, (n, w), jnp.uint32) & tailmask

    log("  generating device data...")
    core_keys = rand_keys(jax.random.PRNGKey(1), core)
    cluster_keys = jnp.stack([rand_keys(jax.random.PRNGKey(100 + c), shell)
                              for c in range(n_clusters)])

    @jax.jit
    def gen_chunk(base, core_keys, cluster_keys):
        # gb genomes starting at absolute id ``base`` (base % 16 == 0, so the
        # cluster assignment pattern is identical across chunks -> 1 compile).
        # core/cluster arrays are ARGUMENTS: closing over device arrays embeds
        # them as executable constants (a 40 MB binary shipped through the
        # ~1 MB/s tunnel on every load).
        parts = []
        root = jax.random.PRNGKey(10_000)
        for g in range(gb):
            u = jax.random.bits(jax.random.fold_in(root, base + g),
                                (uniq, w), jnp.uint32) & tailmask
            parts += [core_keys, cluster_keys[g % n_clusters], u]
        return jnp.concatenate(parts)

    row_gid = (jnp.arange(chunk_rows, dtype=jnp.int32) // per_genome)
    valid_rows = jnp.ones((chunk_rows,), dtype=bool)
    jax.block_until_ready((core_keys, cluster_keys, row_gid, valid_rows))

    # Warmup on a SCRATCH instance at the exact timed shapes: loading the
    # first executable through the axon tunnel costs O(minutes) regardless
    # of the compile cache (one-time per process, not engine cost).  The
    # flush speculates between a FUSED stage A (first flush, head fraction
    # unknown) and the SPLIT A1/A2 path (duplicate-heavy windows), and the
    # split programs are shape-specialized on h = next_pow2(n_heads) — so
    # the warmup must drive BOTH paths at the h the timed run will see:
    # flush 1 (32 genomes) warms the fused path; flush 2 (64 genomes,
    # ~1.07M heads -> h = 2^21, the timed windows' 1.58M-head bucket) warms
    # A1 + A2 + the h-shaped stage B.
    log("  device data ready; warmup...")
    scratch = ColoredDBG(cfg)
    scratch._ensure_colors(0, 0, genomes=n_genomes)
    for base in range(0, 2 * gb, gb):
        b = gen_chunk(jnp.asarray(base, jnp.int32), core_keys, cluster_keys)
        scratch.insert_genomes_bulk([f"w{g}" for g in range(base, base + gb)],
                                    b, row_gid, valid_rows)
    scratch.flush()
    for base in range(0, 4 * gb, gb):
        b = gen_chunk(jnp.asarray(base, jnp.int32), core_keys, cluster_keys)
        scratch.insert_genomes_bulk(
            [f"x{g}" for g in range(base, base + gb)], b, row_gid,
            valid_rows)
    scratch.flush()
    scratch.compress_colors()   # warm the compression programs too
    del scratch
    log("  warm; building...")

    t0 = time.monotonic()
    marks = []
    for base in range(0, n_genomes, gb):
        batch = gen_chunk(jnp.asarray(base, jnp.int32),
                          core_keys, cluster_keys)
        dbg.insert_genomes_bulk([f"g{g}" for g in range(base, base + gb)],
                                batch, row_gid, valid_rows)
        marks.append((base + gb, round(time.monotonic() - t0, 2)))
        log(f"  genome {base + gb}/{n_genomes}: "
            f"t={time.monotonic()-t0:.1f}s")
    dbg.flush()
    dbg.compress_colors()       # end-of-build dictionary compression
    dt = time.monotonic() - t0
    log(f"  built: n={dbg.nb_kmers} d={dbg.nb_color_classes} t={dt:.1f}s")

    # ---- query half of config 5 (VERDICT r4 #2/#4): device-resident point
    # queries (the 32-word color-bitmap decode is the config-5-specific
    # cost) and batched multi-sequence scoring through the one-program
    # segment-count path.  Windows are device-resident: the axon tunnel's
    # ~1 MB/s host->device link is an environment property (PCIe hosts
    # stream batches at GB/s); the host-side kmerize cost is measured by
    # bench.py's parser figures. ----
    m_q = 1 << 22                         # 4M: amortizes the ~20-25 ms
    #                                       tunneled-dispatch floor (bench.py
    #                                       uses the same batch size)
    half = dbg.table.keys[: m_q // 2]     # hits (table is > m_q/2 full)
    miss = rand_keys(jax.random.PRNGKey(999), m_q - m_q // 2)
    queries = jnp.concatenate([half, miss])
    jax.block_until_ready(queries)

    def point_query():
        found, bitmap = dbg.query_kmers_device(queries)
        return (jnp.sum(found.astype(jnp.int32))
                + jnp.sum(bitmap[:, 0]).astype(jnp.int32))
    jax.device_get(point_query())    # compile + warm
    best_q = 1e9
    for _ in range(3):
        t0q = time.monotonic()
        jax.device_get(point_query())
        best_q = min(best_q, time.monotonic() - t0q)
    q_rate = m_q / best_q

    from bloomfiltertrie_tpu.models.cdbg import _seq_query_counts
    n_seq, wins = 4096, 1024          # 4M windows across 4096 "sequences"
    m2 = n_seq * wins                 # (4M amortizes the ~20-25 ms
    #                                    tunneled-dispatch floor, like bench)
    seq_q = jnp.concatenate([dbg.table.keys[: m2 // 2],
                             rand_keys(jax.random.PRNGKey(998), m2 - m2 // 2)])
    perm = jax.random.permutation(jax.random.PRNGKey(997), m2)
    seq_q = seq_q[perm]               # windows arrive in sequence order
    sstart = jnp.arange(n_seq, dtype=jnp.int32) * wins
    send = sstart + wins
    svalid = jnp.ones((m2,), bool)
    jax.block_until_ready((seq_q, sstart, send))

    def seq_query():
        counts = _seq_query_counts(
            dbg.table.keys, dbg.table.n, dbg.table.bucket_starts,
            dbg.table.color_ref, dbg.colors, seq_q, svalid, sstart, send,
            use_pallas=dbg._pallas_eligible(), block=64)
        return jnp.sum(counts[:, 0])
    jax.device_get(seq_query())       # compile + warm
    best_s = 1e9
    for _ in range(3):
        t0q = time.monotonic()
        jax.device_get(seq_query())
        best_s = min(best_s, time.monotonic() - t0q)
    seq_win_rate = m2 / best_s
    log(f"  query: point {q_rate:.3e}/s, seq windows {seq_win_rate:.3e}/s "
        f"({n_seq / best_s:.0f} seqs/s at {wins} windows each)")

    stats = dbg.memory_stats()
    sd, dd = dbg._sd, dbg._dd
    s_w = dbg.colors.small_width
    cw = dbg.colors.width
    enc = colors_codec.encode_hybrid(
        np.asarray(dbg.colors.ids)[:sd],
        np.asarray(dbg.colors.rows)[:dd], n_genomes)
    live_bytes_keys = dbg.nb_kmers * w * 4
    live_bytes_colors = sd * s_w * 4 + dd * cw * 4
    out = {
        "section": "config5_1000genomes_k63",
        "n_kmers": stats["nb_kmers"],
        "n_classes": stats["nb_color_classes"],
        "n_small_classes": sd,
        "n_dense_classes": dd,
        "genomes": n_genomes,
        "build_s": round(dt, 1),
        "insert_rate_kmers_s": round(n_genomes * per_genome / dt),
        "query_kmers_per_s": round(q_rate),
        "seq_query_window_kmers_per_s": round(seq_win_rate),
        "seq_query_sequences_per_s": round(n_seq / best_s),
        "seq_query_windows_per_sequence": wins,
        "timeline_genome_seconds": marks,
        "bytes_keys_capacity": stats["bytes_keys"],
        "bytes_keys_live": live_bytes_keys,
        "bytes_colors_capacity": stats["bytes_colors"],
        "bytes_colors_live": live_bytes_colors,
        "bytes_per_small_class": s_w * 4,
        "bytes_per_dense_class": cw * 4,
        "bytes_colors_compact": int(len(enc["data"])),
        "colors_share_of_total": round(
            stats["bytes_colors"] / stats["bytes_total"], 4),
        "colors_live_share": round(
            live_bytes_colors / max(live_bytes_keys + live_bytes_colors, 1),
            4),
    }
    if emit:
        print(json.dumps(out), flush=True)
    return out, dbg


def section_graph(dbg_small=None):
    import jax
    import jax.numpy as jnp
    from bloomfiltertrie_tpu.config import BFTConfig
    from bloomfiltertrie_tpu.models.cdbg import ColoredDBG
    from bloomfiltertrie_tpu.models import graph_batch
    from bloomfiltertrie_tpu.ops import codec

    k = 31
    cfg = BFTConfig(k=k, initial_capacity=1 << 21,
                    initial_color_capacity=1 << 12,
                    bloom_log2_bits=22, batch_size=1 << 20, pending_runs=2)
    dbg = ColoredDBG(cfg)
    rng = np.random.default_rng(7)
    # 2 long sequences -> ~2M k-mers, mostly 2 long unitig chains + overlaps
    log("  building 2M-k-mer graph...")
    for gi in range(2):
        seq = rng.integers(0, 4, size=1_000_000 + k - 1, dtype=np.uint8)
        ascii_seq = np.array([65, 67, 71, 84], dtype=np.uint8)[seq].tobytes()
        packed, valid = codec.kmerize_sequence(ascii_seq, k)
        dbg.insert_genome(f"g{gi}", packed, valid)
    n = dbg.nb_kmers
    log(f"  n={n}")

    t0 = time.monotonic()
    succ, pred = graph_batch.neighbor_links(
        dbg.table.keys, dbg.table.n, dbg.table.bucket_starts, k,
        use_pallas=dbg._pallas_eligible())
    fence((succ, pred))
    t_links = time.monotonic() - t0

    t0 = time.monotonic()
    uid, pos = graph_batch.unitig_assign(succ, pred, dbg.table.n)
    fence((uid, pos))
    t_unitig = time.monotonic() - t0

    t0 = time.monotonic()
    lab = graph_batch.component_labels(succ, dbg.table.n)
    iota = jnp.arange(succ.shape[0], dtype=jnp.int32)
    n_comp = int(jax.device_get(jnp.sum(
        ((lab == iota) & (iota < dbg.table.n)).astype(jnp.int32))))
    t_comp = time.monotonic() - t0

    n_unitigs = int(jax.device_get(jnp.sum(
        ((pos == 0) & (iota < dbg.table.n)).astype(jnp.int32))))
    print(json.dumps({
        "section": "graph_2M",
        "n_kmers": n,
        "neighbor_links_s": round(t_links, 2),
        "unitig_assign_s": round(t_unitig, 2),
        "components_s": round(t_comp, 2),
        "n_unitigs": n_unitigs,
        "n_components": n_comp,
    }), flush=True)


def section_bloom():
    import jax
    import jax.numpy as jnp
    from bloomfiltertrie_tpu.config import BFTConfig
    from bloomfiltertrie_tpu.models.cdbg import ColoredDBG

    k = 31
    cfg = BFTConfig(k=k, initial_capacity=1 << 24,
                    initial_color_capacity=1 << 12,
                    bloom_log2_bits=26, batch_size=1 << 20, pending_runs=8)
    dbg = ColoredDBG(cfg)
    def gen(key, n):
        return (jax.random.bits(key, (n, 2), jnp.uint32)
                & jnp.asarray([0xFFFFFFFF, 0xFFFFFFFC], jnp.uint32)[None, :])
    data = gen(jax.random.PRNGKey(0), 1 << 23)
    dbg.start_genome("g0")
    dbg.insert_kmers_packed(data)
    dbg.end_genome()
    # 1M queries, ~90% misses
    q = jnp.concatenate([data[: 100_000],
                         gen(jax.random.PRNGKey(9), 900_000 + 48576)[:900_000]])
    q = jnp.pad(q, ((0, (1 << 20) - q.shape[0]), (0, 0)))
    jax.block_until_ready(q)

    def timed(use_bloom):
        dbg.query_kmers_packed(q, use_bloom_prefilter=use_bloom)  # compile
        t0 = time.monotonic()
        f, _ = dbg.query_kmers_packed(q, use_bloom_prefilter=use_bloom)
        return time.monotonic() - t0, int(f.sum())

    t_plain, hits_plain = timed(False)
    t_bloom, hits_bloom = timed(True)
    assert hits_plain == hits_bloom
    print(json.dumps({
        "section": "bloom_prefilter_1M_90pct_miss",
        "query_s_direct": round(t_plain, 3),
        "query_s_bloom_prefilter": round(t_bloom, 3),
        "hits": hits_plain,
    }), flush=True)


def section_sharded1():
    """Sharded window-flush insert on a REAL 1-device TPU mesh.

    The CPU suite proves sharded semantics on a virtual 8-device mesh;
    this measures the shard_map insert path (all_to_all routing carrying
    gids + two flush stages) on hardware.  Workload: 128 genomes x 72k
    rows (one full genome window), bulk-ingested.
    """
    import jax
    import jax.numpy as jnp
    from bloomfiltertrie_tpu.config import BFTConfig
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh

    k, w = 31, 2
    n_genomes, per_genome = 128, 73728
    rows = n_genomes * per_genome
    cfg = BFTConfig(k=k, initial_capacity=1 << 24,
                    initial_color_capacity=1 << 14,
                    bloom_log2_bits=24, batch_size=rows,
                    pending_runs=1, genome_window=128,
                    treshold_compression=0, bloom_enabled=False)
    tail = jnp.asarray([0xFFFFFFFF, 0xFFFFFFFC], jnp.uint32)[None, :]

    def gen(seed):
        core = jax.random.bits(jax.random.PRNGKey(2), (1 << 15, w),
                               jnp.uint32) & tail
        parts = []
        for g in range(n_genomes):
            u = jax.random.bits(jax.random.PRNGKey(seed + g),
                                (per_genome - (1 << 15), w),
                                jnp.uint32) & tail
            parts += [core, u]
        return jnp.concatenate(parts)

    # batches stay DEVICE-resident (tunnel h2d is ~1 MB/s; real hosts ride
    # PCIe); window 2 shares the core k-mers with window 1 (color updates)
    # and brings fresh per-genome keys (merge growth) — the steady state.
    b1, b2 = gen(500), gen(9000)
    row_gid = jnp.arange(rows, dtype=jnp.int32) // per_genome
    jax.block_until_ready((b1, b2, row_gid))
    dbg = ShardedCDBG(cfg, mesh=make_mesh(1))
    dbg._ensure_colors(0, 0, genomes=2 * n_genomes)  # one width, one compile
    log("  warmup window (compile/load)...")
    dbg.insert_genomes_bulk([f"w{g}" for g in range(n_genomes)], b1, row_gid)
    dbg.flush()
    log("  timing window 2 on the same instance (all programs warm)...")
    t0 = time.monotonic()
    dbg.insert_genomes_bulk([f"s{g}" for g in range(n_genomes)], b2, row_gid)
    dbg.flush()
    dt = time.monotonic() - t0
    print(json.dumps({
        "section": "sharded_mesh1_window_insert",
        "genomes": n_genomes, "rows": rows,
        "n_kmers": dbg.nb_kmers, "n_classes": dbg.nb_color_classes,
        "build_s": round(dt, 2),
        "insert_rate_kmers_s": round(rows / dt),
    }), flush=True)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"devices: {jax.devices()}")
    if which in ("sharded1",):
        log("== sharded 1-device mesh window insert ==")
        section_sharded1()
    if which in ("all", "graph"):
        log("== graph 2M ==")
        section_graph()
    if which in ("all", "bloom"):
        log("== bloom prefilter ==")
        section_bloom()
    if which in ("all", "config5"):
        log("== config5 1000 genomes k=63 ==")
        section_config5()
    log("done")
