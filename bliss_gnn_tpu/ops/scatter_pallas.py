"""Pallas banked scatter-add: out[k] += v for arbitrary per-element keys.

XLA's scatter-add on TPU executes one read-modify-write at a time
(~5-7 ns/element measured at the sampler's frontier scale — it is the
single biggest cost of the fused sampling step: the LADIES importance
node-probability is a segment-sum of ~2.5M r_ij^2 values by src id,
ops/segment.py:masked_segment_sum <- samplers._importance_node_prob;
reference semantics bandit_sampler.py:67-75).

This kernel keeps the accumulator resident in VMEM as ``banks``
independent copies laid out [banks * ceil(N/128), 128] f32.  Element i
updates bank i % banks at row key>>7, lane key&127 via a lane-masked
one-hot add.  Because consecutive elements hit different banks, their
read-modify-write chains are independent and pipeline instead of
serializing: measured 3.9 ns/element at 2.4M x 233k scale vs 6.3-6.4 for
the XLA scatter-add, insensitive to bank count (16/32/64) and key
distribution (uniform/zipf/monotone) — honest chained-dispatch timing,
scripts/probe_scatter_tune.py.  (Earlier 2.1 ns claims were an artifact
of the axon tunnel memoizing repeat dispatches with identical inputs.)
A 2-stream variant deriving row/lane in-kernel measured SLOWER (5.7 ns —
the scalar shift/mask arithmetic costs more than the third SMEM stream;
scripts/probe_kernel_v2.py).  A final [banks, N] reduce folds the banks
(order of f32 addition differs from XLA's — same tolerance class as any
segment-sum reordering).

Constraints (probed, same class as ops/spmm_pallas.py):
- keys/values are consumed scalar-by-scalar -> SMEM blocked inputs
  (>=1024-element tiles);
- the banked accumulator must fit VMEM: banks * round_up(N,128) * 4 bytes
  (~15 MB for 16 banks at N=233k; ``maybe_banked_scatter_add`` falls back
  to XLA above the budget or below the break-even size).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# break-even vs XLA scatter (kernel launch + bank reduce overhead).
# Probed on v5e (2026-08-21, chained K=64 distinct-input timing): the
# banked kernel wins 1.53x at 125k elems / 3.7k segments (3.84 ns/elem),
# 1.61x at 190k / 233k segments, 2.04x at 28k / 1.4k segments
# (1.47 ns/elem — the small accumulator pipelines better), so the old
# 1<<19 threshold left the sampler's block-build segment sums (d counts,
# wt_sum debias, the layer-2 importance scatter) on XLA's 7.5-8.7 ns path.
MIN_ELEMS = 1 << 14
# VMEM budget for the banked accumulator
MAX_ACC_BYTES = 64 * 1024 * 1024
# test hook: route through the kernel in Pallas interpret mode even off-TPU
# (lets the CPU suite exercise the sampler's real banked code path)
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(tile: int, unroll: int):
    def kern(nv_ref, row_ref, lane_ref, val_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                r = row_ref[base + j]
                onehot = jnp.where(
                    lane_iota == lane_ref[base + j], val_ref[base + j], 0.0
                )
                acc_ref[pl.ds(r, 1), :] = acc_ref[pl.ds(r, 1), :] + onehot
            return 0

        # dynamic tail skip: the caller's valid slots are a contiguous
        # prefix [0, nv) (frontier valid chunks / compacted outputs); the
        # padded tail carries val=0 so skipping its RMW chain is exact.
        # Partial tiles still run whole (vals are 0 there).
        @pl.when(t * tile < nv_ref[0])
        def _():
            jax.lax.fori_loop(0, tile // unroll, body, 0)

    return kern


def banked_scatter_add(
    keys: jax.Array,
    vals: jax.Array,
    n_out: int,
    banks: int = 16,
    tile: int = 8192,
    unroll: int = 8,
    interpret: bool = False,
    n_valid: jax.Array | None = None,
) -> jax.Array:
    """out[n_out] f32 with out[keys[i]] += vals[i].

    keys int32 in [0, n_out); vals f32 (zeros on padded/masked slots —
    adding 0 to key 0 is the masking convention, as in masked_segment_sum).

    ``n_valid``: optional dynamic scalar — all non-zero vals live in the
    contiguous prefix [0, n_valid); tiles beyond it skip their RMW chain
    entirely (the static capacity runs ~1.25x over the true stream under
    the refit slack, and this kernel's cost is per-SLOT, so the tail was
    pure waste).
    """
    e = keys.shape[0]
    e_pad = _round_up(max(e, tile), tile)
    if e_pad != e:
        keys = jnp.concatenate(
            [keys, jnp.zeros(e_pad - e, keys.dtype)]
        )
        vals = jnp.concatenate([vals, jnp.zeros(e_pad - e, vals.dtype)])
    n_rows = _round_up(n_out, 128) // 128
    bank = (jnp.arange(e_pad, dtype=jnp.int32) % banks) * n_rows
    row = bank + (keys >> 7)
    lane = keys & 127
    if n_valid is None:
        nv = jnp.full((1,), e_pad, jnp.int32)
    else:
        nv = jnp.minimum(jnp.asarray(n_valid, jnp.int32), e_pad).reshape(1)
    acc = pl.pallas_call(
        _kernel(tile, unroll),
        out_shape=jax.ShapeDtypeStruct((banks * n_rows, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(e_pad // tile,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i, nv: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile,), lambda i, nv: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile,), lambda i, nv: (i,),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nv, row, lane, vals.astype(jnp.float32))
    return acc.reshape(banks, n_rows * 128).sum(axis=0)[:n_out]




@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _scatter_add_diff(keys, vals, n_valid, n_out, banks):
    return banked_scatter_add(keys, vals, n_out, banks=banks,
                              interpret=INTERPRET, n_valid=n_valid)


def _scatter_add_fwd(keys, vals, n_valid, n_out, banks):
    return _scatter_add_diff(keys, vals, n_valid, n_out, banks), keys


def _scatter_add_bwd(n_out, banks, keys, g):
    import numpy as np

    # d/dvals of out[k] += v is g[k]; keys are integral (float0 cotangent).
    # Slots past n_valid get a (harmless) nonzero cotangent; every caller
    # masks vals upstream (jnp.where), which zeros those grads.
    return (
        np.zeros(keys.shape, dtype=jax.dtypes.float0),
        jnp.take(g, keys),
        np.zeros((1,), dtype=jax.dtypes.float0),
    )


_scatter_add_diff.defvjp(_scatter_add_fwd, _scatter_add_bwd)


def maybe_banked_scatter_add(
    keys: jax.Array, vals: jax.Array, n_out: int,
    n_valid: jax.Array | None = None,
) -> jax.Array | None:
    """The banked kernel when it wins, else None (caller falls back to the
    XLA scatter).  Routes only 1-D float payloads of frontier scale.
    Differentiable in ``vals`` (custom VJP: the gradient is a gather).
    ``n_valid``: dynamic contiguous-prefix bound, see banked_scatter_add."""
    banks = 16
    use = (
        (jax.default_backend() == "tpu" or INTERPRET)
        and vals.ndim == 1
        and jnp.issubdtype(vals.dtype, jnp.floating)
        and keys.shape[0] >= MIN_ELEMS
        and banks * _round_up(n_out, 128) * 4 <= MAX_ACC_BYTES
    )
    if not use:
        return None
    if n_valid is None:
        nv = jnp.full((1,), keys.shape[0], jnp.int32)
    else:
        nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    return _scatter_add_diff(keys, vals.astype(jnp.float32), nv, n_out,
                             banks)
