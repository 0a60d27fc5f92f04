"""Probe: banked Pallas scatter-add vs XLA's ~7 ns/elem sequential scatter.

The sampler's biggest single cost is segment-summing ~2.5M f32 values by
candidate id into a [233k] accumulator (importance node prob).  XLA's
scatter executes one read-modify-write at a time; the idea here is B
independent accumulator banks in VMEM — element i updates bank i%B, so
consecutive RMW chains hit different addresses and can pipeline — plus a
final (tiny) bank reduction.

Key layout: acc [B * ceil(N/128), 128] f32; key k of bank b lands at row
b*rows + k//128, lane k%128 (lane-masked one-hot add).

PYTHONPATH=.:/root/.axon_site python scripts/probe_banked_scatter.py
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()


def _kernel(n_rows: int, banks: int, tile: int, unroll: int):
    def kern(row_ref, lane_ref, val_ref, acc_ref):
        # row_ref/lane_ref: SMEM [tile] int32 (row already includes bank
        # offset, precomputed on the XLA side); val_ref: SMEM [tile] f32
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                r = row_ref[base + j]
                ln = lane_ref[base + j]
                v = val_ref[base + j]
                onehot = jnp.where(lane_iota == ln, v, 0.0)
                acc_ref[pl.ds(r, 1), :] = acc_ref[pl.ds(r, 1), :] + onehot
            return 0

        jax.lax.fori_loop(0, tile // unroll, body, 0)

    return kern


def banked_scatter_add(keys, vals, n_out, banks=8, tile=8192, unroll=8,
                       interpret=False):
    e = keys.shape[0]
    assert e % tile == 0
    n_rows = (n_out + 127) // 128
    bank = (jnp.arange(e, dtype=jnp.int32) % banks) * n_rows
    row = bank + (keys >> 7)
    lane = keys & 127
    acc = pl.pallas_call(
        _kernel(n_rows, banks, tile, unroll),
        out_shape=jax.ShapeDtypeStruct((banks * n_rows, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(e // tile,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
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
    )(row, lane, vals)
    return acc.reshape(banks, n_rows * 128).sum(axis=0)[:n_out]


# correctness
rng = np.random.default_rng(0)
E, N = 65536, 10000
keys = rng.integers(0, N, size=E).astype(np.int32)
vals = rng.normal(size=E).astype(np.float32)
expect = np.zeros(N, np.float32)
np.add.at(expect, keys, vals)
try:
    got = np.asarray(jax.jit(
        functools.partial(banked_scatter_add, n_out=N)
    )(jnp.asarray(keys), jnp.asarray(vals)))
    err = np.abs(got - expect).max() / (np.abs(expect).max() + 1e-9)
    print(f"banked scatter-add correct, rel err {err:.2e}", flush=True)
except Exception as ex:  # noqa: BLE001
    print(f"banked scatter-add FAILED: {str(ex)[:300]}", flush=True)
    raise SystemExit(1)


def timeit(f, *args):
    fn = jax.jit(f)
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0 - 0.033)
    return min(ts)


E, N = 2_498_560, 233_088  # layer-0 frontier scale (tile-aligned)
keys = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
vals = jnp.asarray(rng.normal(size=E).astype(np.float32))
t = timeit(lambda k, v: jnp.zeros(N, jnp.float32).at[k].add(v), keys, vals)
print(f"XLA scatter-add    E={E}: {t*1e3:7.1f} ms  {t/E*1e9:.2f} ns/elem",
      flush=True)
for banks in (1, 4, 8, 16):
    for unroll in (8, 16):
        t = timeit(functools.partial(
            banked_scatter_add, n_out=N, banks=banks, unroll=unroll),
            keys, vals)
        print(f"banked B={banks:2d} u={unroll:2d}  E={E}: {t*1e3:7.1f} ms  "
              f"{t/E*1e9:.2f} ns/elem", flush=True)
