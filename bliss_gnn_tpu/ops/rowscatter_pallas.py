"""Pallas banked ROW scatter-add: out[ids[i], :] += data[i, :].

The 2-D generalization of ops/scatter_pallas.py for feature-matrix
segment sums that fit neither existing route: the banked scatter is
1-D-payload only, and the one-hot MXU segment-sum's cost is S*F MAC/edge
(ops/segment.py caps it at S*F <= 2^20 — the GAT sampled-block
aggregations at [E ~ 100k, H*O = 1024] into S = 3712..8064 slots are
3-8x past it and were riding XLA's scatter at ~3.8 ms each, r5 GAT
trace fusion.131/157/158; reference op: model.py:98 u_mul_e -> sum).

Layout: grid (F-tiles outer, edge tiles inner); the accumulator block
for one 128-lane F-tile stays VMEM-resident across every edge tile as
``banks`` independent copies [banks * S_pad, 128] — element i updates
bank i % banks so consecutive edges (dst-sorted: long equal-dst runs)
hit different copies and their read-modify-write chains pipeline instead
of serializing (same trick as the 1-D kernel).  A final reshape-sum
folds the banks.  Dynamic tail skip via ``n_valid`` as everywhere.

Measured (v5e, scripts/probe_rowscatter.py, honest distinct-input
chained timing): see the probe docstring for the committed numbers and
the routing decision.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the banked accumulator of ONE F-tile
MAX_ACC_BYTES = 48 * 1024 * 1024
MIN_ELEMS = 1 << 15
INTERPRET = False  # test hook


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(et: int, unroll: int, n_etiles: int):
    def kern(nv_ref, row_ref, data_ref, acc_ref):
        ft = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                r = row_ref[base + j]
                acc_ref[pl.ds(r, 1), :] = (
                    acc_ref[pl.ds(r, 1), :]
                    + data_ref[pl.ds(base + j, 1), :]
                )
            return 0

        @pl.when(t * et < nv_ref[0])
        def _():
            jax.lax.fori_loop(0, et // unroll, body, 0)

    return kern


def banked_row_scatter_add(
    ids: jax.Array,  # [E] int32 in [0, n_out)
    data: jax.Array,  # [E, F] f32/bf16 (zero rows on masked slots)
    n_out: int,
    banks: int = 4,
    et: int = 4096,
    unroll: int = 8,
    n_valid: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    e, f = data.shape
    assert f % 128 == 0
    # bf16 (1, F) dynamic row slices are unsupported on TPU (min sublane
    # tile 16 — the documented Mosaic gotcha); stream the payload as f32
    data = data.astype(jnp.float32)
    e_pad = _round_up(max(e, et), et)
    if e_pad != e:
        ids = jnp.concatenate([ids, jnp.zeros(e_pad - e, ids.dtype)])
        data = jnp.pad(data, ((0, e_pad - e), (0, 0)))
    s_pad = _round_up(n_out, 8)
    # bank rotation folded into the row id stream
    row = (jnp.arange(e_pad, dtype=jnp.int32) % banks) * s_pad + ids
    if n_valid is None:
        nv = jnp.full((1,), e_pad, jnp.int32)
    else:
        nv = jnp.minimum(jnp.asarray(n_valid, jnp.int32), e_pad).reshape(1)
    n_ftiles = f // 128
    n_etiles = e_pad // et
    acc = pl.pallas_call(
        _kernel(et, unroll, n_etiles),
        out_shape=jax.ShapeDtypeStruct((banks * s_pad, f), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_ftiles, n_etiles),
            in_specs=[
                pl.BlockSpec((et,), lambda ft, t, nv: (t,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((et, 128), lambda ft, t, nv: (t, ft),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (banks * s_pad, 128), lambda ft, t, nv: (0, ft),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nv, row, data)
    return acc.reshape(banks, s_pad, f).sum(axis=0)[:n_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _row_scatter_diff(ids, data, n_valid, n_out):
    return banked_row_scatter_add(ids, data, n_out, n_valid=n_valid,
                                  interpret=INTERPRET)


def _row_scatter_fwd(ids, data, n_valid, n_out):
    # residuals must be jax types: carry the primal dtype as an empty array
    return _row_scatter_diff(ids, data, n_valid, n_out), (
        ids, jnp.zeros((0,), data.dtype))


def _row_scatter_bwd(n_out, res, g):
    import numpy as np

    ids, dtype_probe = res
    data_dtype = dtype_probe.dtype
    # d/data of out[k, :] += row is g[k, :]; drop OOB like the forward;
    # cotangent must carry the PRIMAL dtype (data may be bf16 while the
    # accumulated output is f32)
    dd = jnp.take(g, ids, axis=0, mode="fill", fill_value=0).astype(
        data_dtype)
    return (np.zeros(ids.shape, dtype=jax.dtypes.float0), dd,
            np.zeros((1,), dtype=jax.dtypes.float0))


_row_scatter_diff.defvjp(_row_scatter_fwd, _row_scatter_bwd)


def maybe_row_scatter_add(
    ids: jax.Array, data: jax.Array, n_out: int,
    n_valid: jax.Array | None = None,
) -> jax.Array | None:
    """Route [E, F] segment sums through the banked row kernel when the
    shape profile fits (None -> caller falls back to XLA / one-hot).
    Conservative profile: only the measured regime — wide features
    (F >= 512, past the one-hot MXU route's S*F cap) at block-edge
    scale, where the kernel beats XLA 1.08-1.2x (probe_rowscatter.py);
    narrower payloads keep their existing routes."""
    banks = 4
    use = (
        (jax.default_backend() == "tpu" or INTERPRET)
        and data.ndim == 2
        and data.shape[1] % 128 == 0
        and data.shape[1] >= 512
        and data.shape[0] >= MIN_ELEMS
        # the kernel streams the payload as f32 (bf16 (1,F) dynamic rows
        # are unsupported): cap the materialized copy at 1 GB so
        # formula-cap (pre-refit) GAT programs don't OOM HBM — they keep
        # the XLA route until refit tightens the shapes
        and data.shape[0] * data.shape[1] * 4 <= (1 << 30)
        and jnp.issubdtype(data.dtype, jnp.floating)
        and banks * _round_up(n_out, 8) * 128 * 4 <= MAX_ACC_BYTES
    )
    if not use:
        return None
    if n_valid is None:
        nv = jnp.full((1,), data.shape[0], jnp.int32)
    else:
        nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    return _row_scatter_diff(ids, data, nv, n_out)
