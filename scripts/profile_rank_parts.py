"""Decompose rank_sorted wrapper cost: transposes, qs searchsorted, kernel."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bloomfiltertrie_tpu.ops import pallas_kernels as pk
from bloomfiltertrie_tpu.ops import sortedset as ss


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, reps=3):
    def run():
        out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(l[:1].astype(jnp.int32)) for l in leaves)
        return int(jax.device_get(s))
    run()
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        run()
        best = min(best, time.monotonic() - t0)
    return best


CAP, W, M = 1 << 24, 4, 1 << 20
N = 8_945_664
QD = pk.QD

key = jax.random.PRNGKey(0)
tailmask = jnp.asarray([0xFFFFFFFF] * 3 + [0xFFFFFFFC], jnp.uint32)[None, :]
raw = jax.random.bits(key, (N, W), jnp.uint32) & tailmask
srt = jax.lax.sort(tuple(raw[:, i] for i in range(W)), num_keys=W)
keys = jnp.concatenate([
    jnp.stack(srt, axis=-1),
    jnp.full((CAP - N, W), ss.SENTINEL, jnp.uint32)])
n = jnp.asarray(N, jnp.int32)
qhit = keys[: M // 2]
qmiss = jax.random.bits(jax.random.PRNGKey(9), (M - M // 2, W),
                        jnp.uint32) & tailmask
q = jnp.concatenate([qhit, qmiss])
q_sorted = jnp.stack(
    jax.lax.sort(tuple(q[:, i] for i in range(W)), num_keys=W), axis=-1)
valid = jnp.ones((M,), bool)
jax.block_until_ready((keys, q_sorted))

tile = 512
n_tiles = CAP // tile

_qT = jax.jit(lambda q: jnp.concatenate(
    [q, jnp.full((QD, W), ss.SENTINEL, dtype=jnp.uint32)]).T)
t_tq = timeit(lambda: _qT(q_sorted))
log(f"query transpose: {t_tq*1e3:.2f} ms")

_kT = jax.jit(lambda k: k.T)
t_tt = timeit(lambda: _kT(keys))
log(f"table transpose: {t_tt*1e3:.2f} ms")


@jax.jit
def qs_only(keys, q_sorted):
    boundaries = keys[tile - 1::tile][: n_tiles - 1]
    qs_mid = ss.searchsorted(q_sorted, boundaries, side="right")
    return qs_mid


t_qs = timeit(lambda: qs_only(keys, q_sorted))
log(f"qs searchsorted ({n_tiles-1} boundaries over {M} queries): "
    f"{t_qs*1e3:.2f} ms")

# kernel alone, pre-transposed inputs
table_t = _kT(keys)
q_t = _qT(q_sorted)
_qsf = jax.jit(lambda keys, q_sorted, tl, ntl: jnp.concatenate([
    jnp.zeros((1,), jnp.int32),
    ss.searchsorted(q_sorted, keys[tl - 1::tl][: ntl - 1],
                    side="right").astype(jnp.int32),
    jnp.full((1,), M, jnp.int32)]), static_argnums=(2, 3))
qs_full = _qsf(keys, q_sorted, tile, n_tiles)
jax.block_until_ready((table_t, q_t, qs_full))

res = {"query_T_ms": round(t_tq * 1e3, 2), "table_T_ms": round(t_tt * 1e3, 2),
       "qs_ms": round(t_qs * 1e3, 2)}
for tl in (512, 2048):
    ntl = CAP // tl
    qsf = _qsf(keys, q_sorted, tl, ntl)
    jax.block_until_ready(qsf)
    for qc in (32, 128):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntl,),
            in_specs=[
                pl.BlockSpec((W, tl), lambda t, qs: (0, t)),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((W, QD), jnp.uint32),
                pltpu.VMEM((1, QD), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        kern = pl.pallas_call(
            functools.partial(pk._rank_kernel, w=W, tile=tl, n_tiles=ntl,
                              qc=qc),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, M + QD), jnp.int32),
        )
        kj = jax.jit(lambda qsf, table_t, q_t, kern=kern: kern(
            qsf, table_t, q_t))
        t_k = timeit(lambda: kj(qsf, table_t, q_t))
        log(f"kernel alone tile={tl} qc={qc}: {t_k*1e3:.2f} ms")
        res[f"kernel_t{tl}_qc{qc}_ms"] = round(t_k * 1e3, 2)

print(json.dumps({"section": "rank_parts", **res}), flush=True)
