"""Stage decomposition of the multi-genome window flush on one TPU chip.

Times each phase of flush_stage_a / flush_stage_b separately at the bench
shapes (T=16M buffer rows, 16M-row table, k=31, window=32) to locate the
next optimization target.  JSON line to stdout; progress to stderr.
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
    from bloomfiltertrie_tpu.models import table as tbl
    from bloomfiltertrie_tpu.ops import sortedset as ss

    k, w = 31, 2
    total = 1 << 23            # rows per genome
    t_rows = 2 * total         # buffer rows (2 genomes)
    cap = 1 << 24
    window = 32
    mw = window // 32

    log("generating state...")
    tail = jnp.asarray([0xFFFFFFFF, 0xFFFFFFFC], jnp.uint32)[None, :]
    g0 = jax.random.bits(jax.random.PRNGKey(0), (total, w), jnp.uint32) & tail
    g1 = jnp.concatenate([
        g0[: total // 2],
        jax.random.bits(jax.random.PRNGKey(1), (total // 2, w), jnp.uint32)
        & tail])

    # table preloaded with genome 0 (so stage A probes a half-hit buffer)
    @jax.jit
    def build_table(g0):
        skeys, svalid, skeep = ss.sort_queries(
            g0, jnp.ones((total,), bool))
        keys = jnp.full((cap, w), ss.SENTINEL, jnp.uint32)
        keys = jax.lax.dynamic_update_slice(keys, skeys, (0, 0))
        n = jnp.sum(skeep.astype(jnp.int32))
        # compact unique-first rows: fine for profiling (duplicates rare
        # in random data; sortedness preserved)
        starts = ss.build_bucket_starts(keys, n)
        cref = jnp.where(jnp.arange(cap) < n, 0, -1).astype(jnp.int32)
        return keys, n, starts, cref

    keys, n, starts, cref = build_table(g0)
    table = tbl.KmerTable(keys=keys, color_ref=cref,
                          flags=jnp.zeros((cap,), jnp.uint8), n=n,
                          bucket_starts=starts)
    colors = tbl.empty_colors(1 << 14, 1 << 10, 8, 1)
    colors, _ = tbl.append_singleton_class(colors, 0)
    buf = tbl.empty_buffer(t_rows, w)
    buf = tbl.buffer_append_rows_impl(
        buf, jnp.concatenate([g0, g1]), jnp.ones((t_rows,), bool),
        jnp.concatenate([jnp.zeros((total,), jnp.int32),
                         jnp.ones((total,), jnp.int32)]),
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    jax.block_until_ready((table.keys, colors.ids, buf.keys))
    log("state ready; timing phases...")

    used = jnp.asarray(t_rows, jnp.int32)

    # ---- phase programs (each jitted separately; no donation so reruns
    # reuse inputs) ----
    def p_sort1(bk, bg, bv):
        live = bv & (jnp.arange(t_rows, dtype=jnp.int32) < used)
        inv = (~live).astype(jnp.uint32)
        masked = jnp.where(live[:, None], bk, jnp.full_like(bk, ss.SENTINEL))
        gid_m = jnp.where(live, bg, window)
        out = jax.lax.sort((inv,) + tuple(masked[:, i] for i in range(w))
                           + (gid_m,), num_keys=w + 2)
        return out

    def p_scan(skeys_sgid):
        inv_s, k0, k1, sgid = skeys_sgid
        skeys = jnp.stack([k0, k1], axis=-1)
        svalid = inv_s == 0
        key_bound = jnp.concatenate([
            jnp.ones((1,), bool),
            (~ss.mw_equal(skeys[1:], skeys[:-1])) | (inv_s[1:] != inv_s[:-1])])
        keep_key = key_bound & svalid
        pair_bound = jnp.concatenate([
            jnp.ones((1,), bool), key_bound[1:] | (sgid[1:] != sgid[:-1])])
        keep_pair = pair_bound & svalid
        bits = tuple(
            jnp.where(keep_pair & ((sgid >> 5) == j),
                      jnp.uint32(1) << (sgid & 31).astype(jnp.uint32),
                      jnp.uint32(0)) for j in range(mw))
        masks = tbl._suffix_segment_or(keep_key, bits)
        return masks, keep_key

    def p_probe(tkeys, tn, skeys, svalid):
        from bloomfiltertrie_tpu.ops import pallas_kernels as pk
        return pk.rank_sorted(tkeys, tn, skeys, svalid)

    def p_full_a(tb, bk, bg, bv):
        return tbl.flush_stage_a_impl(
            tb, tbl.PendingBuffer(keys=bk, gid=bg, valid=bv), used,
            window, use_pallas=True)

    timings = {}

    def timeit(name, fn, *args, reps=3):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        log(f"  {name}: {best*1e3:.1f} ms")
        return out

    s1 = timeit("sort1", p_sort1, buf.keys, buf.gid, buf.valid)
    skeys = jnp.stack([s1[1], s1[2]], axis=-1)
    svalid = s1[0] == 0
    timeit("mask_scan", p_scan, tuple(s1))
    # NOTE: pass the table as ARGUMENTS — a closed-over table embeds as an
    # executable constant and distorts the timing (observed 155 vs 5 ms on
    # the rank kernel).
    timeit("probe_pallas", p_probe, table.keys, table.n, skeys, svalid)
    a_out = timeit("stage_a_full", p_full_a, table, buf.keys, buf.gid,
                   buf.valid)

    n_pairs = int(jax.device_get(a_out["n_pairs"]))
    budget = max(1024, 1 << (max(n_pairs - 1, 1)).bit_length())
    log(f"  n_pairs={n_pairs} budget={budget}")

    def p_full_b(tb, cl, skeys, cls2, mask2, keep2, fidx2, src2):
        return tbl.flush_stage_b_impl(
            tb, cl, jnp.zeros((1 << 19,), jnp.uint32),
            skeys, cls2, mask2, keep2, fidx2, src2,
            jnp.asarray(0, jnp.int32), 24,
            jnp.uint32(1), jnp.uint32(2),
            budget=budget, window=window, use_bloom=False)

    def p_merge(tb, skeys, isnew):
        return ss.merge_into_masked(
            tb.keys, tb.n, skeys, isnew,
            table_payloads=(tb.color_ref, tb.flags),
            new_payloads=(jnp.zeros((t_rows,), jnp.int32),
                          jnp.zeros((t_rows,), jnp.uint8)))

    def p_starts(keys, tn):
        return ss.build_bucket_starts(keys, tn)

    def p_unsort(src2, payload):
        return jax.lax.sort((src2, payload), num_keys=1)

    timeit("stage_b_full", p_full_b, table, colors, a_out["skeys"],
           a_out["cls2"], a_out["mask2"], a_out["keep2"], a_out["fidx2"],
           a_out["src2"])
    isnew = a_out["keep2"] & ~((a_out["fidx2"] >> 31) == 1)
    timeit("merge_sort", p_merge, table, a_out["skeys"], isnew)
    timeit("bucket_starts", p_starts, table.keys, table.n)
    timeit("unsort_sort3", p_unsort, a_out["src2"], a_out["cls2"])

    print(json.dumps({"section": "window_flush_profile",
                      "t_rows": t_rows, "cap": cap, "window": window,
                      "n_pairs": n_pairs, **timings}), flush=True)


if __name__ == "__main__":
    main()
