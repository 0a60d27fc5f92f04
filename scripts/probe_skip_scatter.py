"""Probe: predicated-skip banked scatter (compact_by_mask's workload).

At refit caps the compact scatter feeds ~95% zero-valued (masked) slots;
@pl.when(val != 0) around the RMW should cut those to the scalar-read
floor.  Honest protocol: K distinct-value scatters chained in one jit
(serial dependency via accumulator feedback), divide by K.

PYTHONPATH=.:/root/.axon_site python scripts/probe_skip_scatter.py [skip] [live]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()

E = 2_641_920
N_OUT = 125_185


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def kernel_skip(tile, unroll, skip):
    def kern(row_ref, lane_ref, val_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                v = val_ref[base + j]

                def rmw(v=v, j=j, base=base):
                    r = row_ref[base + j]
                    onehot = jnp.where(
                        lane_iota == lane_ref[base + j], v, 0.0
                    )
                    acc_ref[pl.ds(r, 1), :] = (
                        acc_ref[pl.ds(r, 1), :] + onehot
                    )

                if skip:
                    pl.when(v != 0.0)(rmw)
                else:
                    rmw()
            return 0

        jax.lax.fori_loop(0, tile // unroll, body, 0)

    return kern


def scatter(row, lane, vals, n_rows, banks=16, tile=8192, unroll=8,
            skip=False):
    e = row.shape[0]
    acc = pl.pallas_call(
        kernel_skip(tile, unroll, skip),
        out_shape=jax.ShapeDtypeStruct((banks * n_rows, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(e // tile,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(row, lane, vals)
    return acc


def main():
    skip = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
    live = float(sys.argv[2]) if len(sys.argv) > 2 else 0.047
    K = 3
    rng = np.random.default_rng(0)
    e_pad = _round_up(E, 8192)
    keys = rng.integers(0, N_OUT, e_pad).astype(np.int32)
    n_rows = _round_up(N_OUT, 128) // 128
    banks = 16
    bank = (np.arange(e_pad) % banks) * n_rows
    row = jnp.asarray(bank + (keys >> 7), jnp.int32)
    lane = jnp.asarray(keys & 127, jnp.int32)
    vals = jnp.asarray(
        (rng.random(e_pad) < live).astype(np.float32)
    )
    print(f"skip={skip} live={live}", flush=True)

    def chain(row, lane, vals, s):
        v = vals * (1 + s * 1e-6)
        tot = jnp.float32(0)
        for k in range(K):
            acc = scatter(row, lane, v + tot * 1e-20, n_rows, skip=skip)
            tot = tot + acc[0, 0]
        return tot

    f = jax.jit(chain)
    t0 = time.perf_counter()
    print("compiling...", flush=True)
    float(f(row, lane, vals, jnp.float32(0)))
    print(f"compiled+warm in {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(f(row, lane, vals, jnp.float32(1 + r)))
        ts.append(time.perf_counter() - t0 - 0.033)
    dt = min(ts) / K
    print(f"-> {dt*1e9/e_pad:5.2f} ns/elem ({dt*1e3:6.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
