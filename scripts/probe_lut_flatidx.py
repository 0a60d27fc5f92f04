"""Probe: lut_gather with the index operand as [M/128, 128] flat2d tiles.

The production kernel takes idx twice: SMEM [et] for row selection and
VMEM [et, 1] for the lane select — and XLA pays a T(1,128)->T(8,128)
relayout copy (~0.8 ns/elem, `copy.9` in the refit trace) to produce the
[M, 1] column.  If Mosaic supports the in-kernel [et/128,128] -> [et]
reshape (the flat2d OUTPUT path already does the inverse), the copy
disappears.

PYTHONPATH=.:/root/.axon_site python scripts/probe_lut_flatidx.py
"""
import math
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()

M = 2_641_920
N = 233_088


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(et, unroll):
    def kernel(idx_smem, idx2d, lut_ref, out_ref, msgs_ref):
        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                msgs_ref[pl.ds(base + j, 1), :] = lut_ref[
                    pl.ds(idx_smem[base + j] >> 7, 1), :
                ]
            return 0

        jax.lax.fori_loop(0, et // unroll, body, 0)
        rel = (idx2d[:, :] & 127).reshape(et)  # [et/128,128] -> [et]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (et, 128), 1)
        onehot = (lanes == rel[:, None]).astype(msgs_ref.dtype)
        col = jnp.sum(msgs_ref[:] * onehot, axis=1)
        out_ref[:, :] = col.reshape(et // 128, 128)

    return kernel


@partial(jax.jit, static_argnames=("et", "unroll"))
def lut_gather_flatidx(lut, idx, et=2048, unroll=32):
    n = lut.shape[0]
    lut2d = jnp.zeros((_round_up(n, 128) // 128, 128), jnp.int32)
    lut2d = lut2d.reshape(-1).at[:n].set(lut).reshape(-1, 128)
    m = idx.shape[0]
    mp = _round_up(m, et)
    idx_p = jnp.zeros(mp, jnp.int32).at[:m].set(idx)
    idx2d = idx_p.reshape(-1, 128)
    out = pl.pallas_call(
        _kernel(et, math.gcd(unroll, et)),
        out_shape=jax.ShapeDtypeStruct((mp // 128, 128), jnp.int32),
        grid=(mp // et,),
        in_specs=[
            pl.BlockSpec((et,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((et // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((et // 128, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(idx_p, idx2d, lut2d)
    return out.reshape(-1)[:m]


def main():
    rng = np.random.default_rng(0)
    lut = jnp.asarray(rng.integers(0, 1000, N), jnp.int32)
    idx = jnp.asarray(rng.integers(0, N, M), jnp.int32)
    # correctness
    out = np.asarray(lut_gather_flatidx(lut, idx[:4096]))
    ref = np.asarray(lut)[np.asarray(idx[:4096])]
    np.testing.assert_array_equal(out, ref)
    print("correct", flush=True)

    K = 3

    @jax.jit
    def chain(lut, idx, s):
        tot = jnp.int32(0)
        for k in range(K):
            o = lut_gather_flatidx(lut, idx + (tot & 0))
            tot = tot + o[k]
        return tot

    t0 = time.perf_counter()
    int(chain(lut, idx, jnp.float32(0)))
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        int(chain(lut, idx + r, jnp.float32(r)))
        ts.append(time.perf_counter() - t0 - 0.033)
    dt = min(ts) / K
    print(f"flatidx lut_gather: {dt*1e9/M:5.2f} ns/elem ({dt*1e3:6.2f} ms)",
          flush=True)

    # baseline: production kernel (includes the [M,1] copy in XLA)
    from bliss_gnn_tpu.ops.gather_pallas import lut_gather

    @jax.jit
    def chain_base(lut, idx, s):
        tot = jnp.int32(0)
        for k in range(K):
            o = lut_gather(lut, idx + (tot & 0), elem_dtype=jnp.int32,
                           flat2d=True)
            tot = tot + o[k]
        return tot

    int(chain_base(lut, idx, jnp.float32(0)))
    print("baseline compiled", flush=True)
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        int(chain_base(lut, idx + r, jnp.float32(r)))
        ts.append(time.perf_counter() - t0 - 0.033)
    dt = min(ts) / K
    print(f"baseline lut_gather: {dt*1e9/M:5.2f} ns/elem ({dt*1e3:6.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
