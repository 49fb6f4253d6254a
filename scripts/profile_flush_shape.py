"""Window-flush stage decomposition at ARBITRARY shapes on one TPU chip.

Generalizes scripts/profile_window_flush.py (which is pinned to the bench
shape w=2/window=32) so the CONFIG-5 shape (k=63 -> w=4, window=128 ->
mw=4, duplicate-heavy buffers) can be decomposed stage by stage.

Usage: python scripts/profile_flush_shape.py [--w 4] [--window 128]
         [--logt 23] [--logcap 24] [--dup 6]

``--dup`` = average buffer copies per distinct key (config 5's windows hold
~9.4M rows over ~1.6M distinct keys => dup ~ 6); copies carry distinct gids,
exercising the mask scan and the (class, mask) pair machinery realistically.
JSON line to stdout; progress to stderr.
"""

import argparse
import json
import os
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=4)
    ap.add_argument("--window", type=int, default=128)
    ap.add_argument("--logt", type=int, default=23)
    ap.add_argument("--logcap", type=int, default=24)
    ap.add_argument("--dup", type=int, default=6)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from bloomfiltertrie_tpu.models import table as tbl
    from bloomfiltertrie_tpu.ops import sortedset as ss

    w = args.w
    window = args.window
    t_rows = 1 << args.logt
    cap = 1 << args.logcap
    dup = args.dup
    mw = window // 32
    distinct = t_rows // dup

    log(f"shape: w={w} window={window} t_rows={t_rows} cap={cap} dup={dup}")
    log("generating state...")
    tailbits = jnp.full((w,), 0xFFFFFFFF, jnp.uint32)

    @jax.jit
    def gen_buffer(key):
        base = jax.random.bits(key, (distinct, w), jnp.uint32) & tailbits
        keys = jnp.tile(base, (dup + 1, 1))[:t_rows]
        # copy c of a key carries gid spread over the window
        gid = (jnp.arange(t_rows, dtype=jnp.int32) // distinct
               * max(window // (dup + 1), 1)) % window
        return keys, gid

    bkeys, bgid = gen_buffer(jax.random.PRNGKey(0))
    bvalid = jnp.ones((t_rows,), bool)

    @jax.jit
    def build_table(base):
        skeys, svalid, skeep = ss.sort_queries(
            base, jnp.ones((base.shape[0],), bool))
        keys = jnp.full((cap, w), ss.SENTINEL, jnp.uint32)
        keys = jax.lax.dynamic_update_slice(keys, skeys, (0, 0))
        n = jnp.sum(skeep.astype(jnp.int32))
        starts = ss.build_bucket_starts(keys, n)
        cref = jnp.where(jnp.arange(cap) < n, 0, -1).astype(jnp.int32)
        return keys, n, starts, cref

    # table holds HALF the distinct keys (probe sees ~50% hits)
    keys, n, starts, cref = build_table(bkeys[: distinct // 2])
    table = tbl.KmerTable(keys=keys, color_ref=cref,
                          flags=jnp.zeros((cap,), jnp.uint8), n=n,
                          bucket_starts=starts)
    colors = tbl.empty_colors(1 << 16, 1 << 10, 8, max(1, window // 32))
    colors, _ = tbl.append_singleton_class(colors, 0)
    jax.block_until_ready((table.keys, colors.ids, bkeys, bgid))
    log("state ready; timing phases...")
    used = jnp.asarray(t_rows, jnp.int32)

    timings = {}

    def timeit(name, fn, *xs, reps=3):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*xs))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        log(f"  {name}: {best*1e3:.1f} ms")
        return out

    def p_sort1(bk, bg, bv):
        buf = tbl.PendingBuffer(keys=bk, gid=bg, valid=bv)
        return tbl.flush_sort1(buf, used, window)

    def p_rest_a(tb, skeys, sgid):
        return tbl.flush_stage_a_sorted(tb, skeys, sgid, window,
                                        use_pallas=True)

    def p_full_a(tb, bk, bg, bv):
        buf = tbl.PendingBuffer(keys=bk, gid=bg, valid=bv)
        return tbl.flush_stage_a_impl(tb, buf, used, window, use_pallas=True)

    skeys, sgid = timeit("sort1", p_sort1, bkeys, bgid, bvalid)
    timeit("rest_of_a", p_rest_a, table, skeys, sgid)
    a_out = timeit("stage_a_full", p_full_a, table, bkeys, bgid, bvalid)

    n_pairs = int(jax.device_get(a_out["n_pairs"]))
    n_new = int(jax.device_get(a_out["n_new"]))
    budget = max(1024, 1 << (max(n_pairs - 1, 1)).bit_length())
    log(f"  n_pairs={n_pairs} n_new={n_new} budget={budget}")

    # ---- split path: A1 (scan+probe) then A2 at h = pow2(n_heads) ----
    def p_scan(skeys, sgid):
        svalid = sgid < window
        key_bound = jnp.concatenate([
            jnp.ones((1,), bool), ~ss.mw_equal(skeys[1:], skeys[:-1])])
        keep_key = key_bound & svalid
        pair_bound = jnp.concatenate([
            jnp.ones((1,), bool), key_bound[1:] | (sgid[1:] != sgid[:-1])])
        keep_pair = pair_bound & svalid
        bits = tuple(
            jnp.where(keep_pair & ((sgid >> 5) == j),
                      jnp.uint32(1) << (sgid & 31).astype(jnp.uint32),
                      jnp.uint32(0)) for j in range(mw))
        return tbl._suffix_segment_or(keep_key, bits)

    def p_probe(tkeys, tn, skeys, svalid):
        from bloomfiltertrie_tpu.ops import pallas_kernels as pk
        return pk.rank_sorted(tkeys, tn, skeys, svalid)

    timeit("scan_only", p_scan, skeys, sgid)
    timeit("probe_only", p_probe, table.keys, table.n, skeys, sgid < window)

    def p_a1(tb, skeys, sgid):
        return tbl.flush_stage_a1_sorted(tb, skeys, sgid, window,
                                         use_pallas=True)

    a1 = timeit("stage_a1_sorted", p_a1, table, skeys, sgid)
    n_heads = int(jax.device_get(a1["n_heads"]))
    h = min(1 << (max(n_heads - 1, 1)).bit_length(), t_rows)
    log(f"  n_heads={n_heads} h={h}")

    def p_a2(cref, keep, masks, fidx):
        return tbl.flush_stage_a2_impl(cref, keep, masks, fidx, h=h,
                                       use_pallas=True)

    a2 = timeit("stage_a2_compact", p_a2, table.color_ref, a1["keep_key"],
                a1["masks"], a1["fidx"])

    def p_b_h(tb, cl, skeys, cls2, mask2, keep2, fidx2, src2):
        return tbl.flush_stage_b_impl(
            tb, cl, jnp.zeros((1 << 19,), jnp.uint32),
            skeys, cls2, mask2, keep2, fidx2, src2,
            jnp.asarray(0, jnp.int32), 24,
            jnp.uint32(1), jnp.uint32(2),
            budget=budget, window=window, use_bloom=False, use_pallas=True)

    timeit("stage_b_at_h", p_b_h, table, colors, a1["skeys"],
           a2["cls2"], a2["mask2"], a2["keep2"], a2["fidx2"], a2["src2"])

    def p_full_b(tb, cl, skeys, cls2, mask2, keep2, fidx2, src2):
        return tbl.flush_stage_b_impl(
            tb, cl, jnp.zeros((1 << 19,), jnp.uint32),
            skeys, cls2, mask2, keep2, fidx2, src2,
            jnp.asarray(0, jnp.int32), 24,
            jnp.uint32(1), jnp.uint32(2),
            budget=budget, window=window, use_bloom=False, use_pallas=True)

    def p_sort3(src2, newcls2):
        return jax.lax.sort((src2, newcls2), num_keys=1)

    def p_merge(tb, skeys, isnew, newcls):
        from bloomfiltertrie_tpu.ops import pallas_kernels as pk
        return pk.merge_sorted_masked(tb.keys, tb.n, tb.color_ref, tb.flags,
                                      skeys, isnew, newcls)

    def p_starts(keys, tn):
        return ss.build_bucket_starts(keys, tn)

    timeit("stage_b_full", p_full_b, table, colors, a_out["skeys"],
           a_out["cls2"], a_out["mask2"], a_out["keep2"], a_out["fidx2"],
           a_out["src2"])
    isnew2 = a_out["keep2"] & ~((a_out["fidx2"] >> 31) == 1)
    newcls2 = jnp.where(isnew2, 1, -1)
    out3 = timeit("sort3_unsort", p_sort3, a_out["src2"], newcls2)
    timeit("merge_pallas", p_merge, table, a_out["skeys"], out3[1] >= 0,
           out3[1])
    timeit("bucket_starts", p_starts, table.keys, table.n)

    print(json.dumps({"section": "flush_profile_shape",
                      "w": w, "window": window, "t_rows": t_rows,
                      "cap": cap, "dup": dup,
                      "n_pairs": n_pairs, "n_new": n_new, **timings}),
          flush=True)


if __name__ == "__main__":
    main()
