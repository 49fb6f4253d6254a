"""Scan rank-kernel (tile, qc) at sparse query density (m=1M, cap=16M, w=4)
and at the dense shape (m=16M) to refit _pick_tile/_pick_qc constants."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bloomfiltertrie_tpu.ops import pallas_kernels as pk
from bloomfiltertrie_tpu.ops import sortedset as ss


def log(m):
    print(m, file=sys.stderr, flush=True)


CAP, W = 1 << 24, 4
N = 8_945_664

key = jax.random.PRNGKey(0)
tailmask = jnp.asarray([0xFFFFFFFF] * 3 + [0xFFFFFFFC], jnp.uint32)[None, :]
raw = jax.random.bits(key, (N, W), jnp.uint32) & tailmask
srt = jax.lax.sort(tuple(raw[:, i] for i in range(W)), num_keys=W)
keys = jnp.concatenate([
    jnp.stack(srt, axis=-1),
    jnp.full((CAP - N, W), ss.SENTINEL, jnp.uint32)])
n = jnp.asarray(N, jnp.int32)

results = {}
for m_log2 in (20, 24):
    M = 1 << m_log2
    qhit = keys[: M // 2]
    qmiss = jax.random.bits(jax.random.PRNGKey(9), (M - M // 2, W),
                            jnp.uint32) & tailmask
    q = jnp.concatenate([qhit, qmiss])
    qs_ops = jax.lax.sort(tuple(q[:, i] for i in range(W)), num_keys=W)
    q_sorted = jnp.stack(qs_ops, axis=-1)
    valid = jnp.ones((M,), bool)
    jax.block_until_ready((keys, q_sorted))

    for tile in (512, 1024, 2048):
        for qc in (32, 64, 128, 256):
            orig_t, orig_q = pk._pick_tile, pk._pick_qc
            pk._pick_tile = lambda c, m, w, _t=tile: _t
            pk._pick_qc = lambda c, m, _q=qc: _q
            try:
                fn = jax.jit(pk.rank_sorted.__wrapped__,
                             static_argnames=("interpret",))

                def run():
                    f, r = fn(keys, n, q_sorted, valid)
                    return int(jax.device_get(jnp.sum(r) + jnp.sum(f)))
                run()
                best = 1e9
                for _ in range(3):
                    t0 = time.monotonic()
                    run()
                    best = min(best, time.monotonic() - t0)
                results[f"m2^{m_log2}_t{tile}_qc{qc}"] = round(best * 1e3, 1)
                log(f"m=2^{m_log2} tile={tile} qc={qc}: {best*1e3:.1f} ms")
            finally:
                pk._pick_tile, pk._pick_qc = orig_t, orig_q

print(json.dumps({"section": "rank_tile_scan", **results}), flush=True)
