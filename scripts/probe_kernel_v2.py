"""Probe: (a) two-stream banked scatter (_kernel2) vs the 3-stream one;
(b) lut_gather flat2d output vs the [M,1] column (including a downstream
mask consumer so XLA's relayout cost is exposed).

Chained distinct-input timing (the axon tunnel memoizes identical
dispatches — see scripts/probe_scatter_tune.py).

PYTHONPATH=.:/root/.axon_site python scripts/probe_kernel_v2.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_gnn_tpu.ops.scatter_pallas import banked_scatter_add, _round_up
from bliss_gnn_tpu.ops.gather_pallas import lut_gather

enable_compilation_cache()


def _kernel2(tile: int, unroll: int, n_rows: int):
    """Two-stream variant: row/lane/bank derived in-kernel from the raw key.
    ``banks == unroll`` makes the bank offset a STATIC constant per unrolled
    slot (element base+j always lands in bank j), eliminating one SMEM
    stream and the host-side row/lane prep pass."""

    def kern(key_ref, val_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                k = key_ref[base + j]
                r = (k >> 7) + j * n_rows  # static bank j
                onehot = jnp.where(lane_iota == (k & 127), val_ref[base + j], 0.0)
                acc_ref[pl.ds(r, 1), :] = acc_ref[pl.ds(r, 1), :] + onehot
            return 0

        jax.lax.fori_loop(0, tile // unroll, body, 0)

    return kern


def banked_scatter_add2(
    keys: jax.Array,
    vals: jax.Array,
    n_out: int,
    banks: int = 16,
    tile: int = 8192,
    interpret: bool = False,
) -> jax.Array:
    """Two-stream banked scatter-add (see _kernel2); banks == unroll."""
    e = keys.shape[0]
    e_pad = _round_up(max(e, tile), tile)
    if e_pad != e:
        keys = jnp.concatenate([keys, jnp.zeros(e_pad - e, keys.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros(e_pad - e, vals.dtype)])
    n_rows = _round_up(n_out, 128) // 128
    acc = pl.pallas_call(
        _kernel2(tile, banks, n_rows),
        out_shape=jax.ShapeDtypeStruct((banks * n_rows, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(e_pad // tile,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(keys.astype(jnp.int32), vals.astype(jnp.float32))
    return acc.reshape(banks, n_rows * 128).sum(axis=0)[:n_out]


E = 2_383_872
N = 232_965
CHAIN = 8

rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
vals = jnp.asarray(rng.random(E).astype(np.float32))


def timeit(f, *args, reps=3):
    def chained(s, *a):
        tot = jnp.float32(0)
        for k in range(CHAIN):
            out = f(s + k, *a)
            tot += jnp.asarray(out).reshape(-1)[0].astype(jnp.float32)
        return tot

    g = jax.jit(chained)
    float(g(jnp.float32(1.0), *args))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(g(jnp.float32(2.0 + r), *args))
        ts.append((time.perf_counter() - t0 - 0.033) / CHAIN)
    return min(ts)


t1 = timeit(lambda s, k, v: banked_scatter_add(k, v * s, N), keys, vals)
print(f"banked v1 (3-stream): {t1*1e3:6.1f} ms ({t1/E*1e9:4.2f} ns/elem)",
      flush=True)
t2 = timeit(lambda s, k, v: banked_scatter_add2(k, v * s, N), keys, vals)
print(f"banked v2 (2-stream): {t2*1e3:6.1f} ms ({t2/E*1e9:4.2f} ns/elem)",
      flush=True)
for banks in (8, 32):
    t = timeit(lambda s, k, v, b=banks: banked_scatter_add2(k, v * s, N,
                                                            banks=b),
               keys, vals)
    print(f"banked v2 banks={banks:2d} : {t*1e3:6.1f} ms "
          f"({t/E*1e9:4.2f} ns/elem)", flush=True)

# correctness cross-check on device
a = banked_scatter_add(keys, vals, N)
b = banked_scatter_add2(keys, vals, N)
err = float(jnp.max(jnp.abs(a - b)))
print(f"v1 vs v2 max abs diff: {err:.2e}", flush=True)

# ---- lut gather layouts, with a consumer (mask + count) -----------------
lut = jnp.asarray((rng.random(N) < 0.02).astype(np.float32))
mask = jnp.asarray(rng.random(E) < 0.9)
idxs = keys


def consume(out, m):
    kb = m & (out != 0)
    return jnp.cumsum(kb.astype(jnp.int32))  # forces a real 1-D consumer


tg1 = timeit(
    lambda s, i, m: consume(lut_gather(lut * (1 + s * 1e-9), i), m), idxs, mask
)
print(f"lut col  + consumer : {tg1*1e3:6.1f} ms ({tg1/E*1e9:4.2f} ns/elem)",
      flush=True)
tg2 = timeit(
    lambda s, i, m: consume(lut_gather(lut * (1 + s * 1e-9), i, flat2d=True), m),
    idxs, mask,
)
print(f"lut flat + consumer : {tg2*1e3:6.1f} ms ({tg2/E*1e9:4.2f} ns/elem)",
      flush=True)
g1 = lut_gather(lut, idxs)
g2 = lut_gather(lut, idxs, flat2d=True)
print("lut outputs equal:", bool(jnp.all(g1 == g2)), flush=True)
