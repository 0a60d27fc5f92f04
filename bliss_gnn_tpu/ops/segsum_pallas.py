"""Pallas one-hot MXU segment-sum for sampled-block feature aggregation.

The model's per-block SpMM (u_mul_e -> sum over ~100k kept edges x 256
features into ~4k dst slots at the Reddit refit caps; reference
model.py:98 / SAGEConv message passing) runs as a chain of one-hot MXU
contractions.  The jnp formulation (segment.py scan of
``onehot[S, et] @ msg[et, F]``) is algebraically right, but XLA
materializes EVERY tile's one-hot into one stacked buffer regardless of
loop style (a [49, 3712, 2048] bf16 = 745 MB of HBM traffic per step at
the Reddit refit caps — trace fusion.965/while.39; the fori_loop +
dynamic-slice rewrite did not stop the hoist).  This kernel builds each
tile's one-hot in VMEM registers where it is consumed:

- forward: grid over edge tiles; per tile an iota-compare builds
  ``oh[S_pad, et]`` (~15 MB VMEM), one bf16 MXU dot accumulates into the
  resident f32 ``acc[S_pad, F]`` output block;
- backward (custom VJP, d/dmsg only — ids are integral): a plain XLA row
  gather ``g[ids]`` — d/dmsg of a segment-sum IS the per-edge gather of
  the output cotangent (the earlier matmul formulation oh_t^T @ g paid
  S*F MXU MACs per edge for what a bandwidth-bound take does: 4.4 vs
  2.9 ms at [100k, 1024], r4 GAT trace gatv2_layers_0.4).

Cost at the Reddit refit caps: ~0.4 ms one-hot VPU builds + ~1.1 ms MXU
per pass vs ~7.4 ms for the XLA-materialized scan family.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ET = 2048
# test hook: run under the Pallas interpreter off-TPU
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(S_pad: int, et: int):
    # ids ride as a (1, 8, et) block of an 8-sublane-replicated slab —
    # a (1, et) block of a [n_tiles, et] array is an illegal TPU block
    # shape (second-to-last dim must be divisible by 8)
    def kern(nv_ref, ids_ref, msg_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # dynamic tail skip (scatter_pallas._kernel convention): tiles
        # wholly past the valid prefix carry zero data -> contribute 0
        @pl.when(t * et < nv_ref[0])
        def _():
            ids = ids_ref[0, 0:1, :]  # (1, et)
            seg = jax.lax.broadcasted_iota(jnp.int32, (S_pad, et), 0)
            oh = (seg == ids).astype(jnp.bfloat16)
            acc_ref[...] += jnp.dot(
                oh, msg_ref[...], preferred_element_type=jnp.float32
            )

    return kern


def _pad_ids(ids: jax.Array, e: int, et: int):
    """[E] ids -> 8-sublane-replicated [n_tiles, 8, et] slab + padded E."""
    ep = _round_up(max(e, et), et)
    if ep != e:
        ids = jnp.pad(ids, (0, ep - e))  # pad -> segment 0 (data is 0)
    ids3 = jnp.broadcast_to(
        ids.astype(jnp.int32).reshape(-1, 1, et), (ep // et, 8, et)
    )
    return ids3, ep


def _pad_inputs(data: jax.Array, ids: jax.Array, et: int):
    e, _ = data.shape
    ids3, ep = _pad_ids(ids, e, et)
    if ep != e:
        data = jnp.pad(data, ((0, ep - e), (0, 0)))
    return data, ids3, ep


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def onehot_segment_sum(data: jax.Array, ids: jax.Array,
                       n_valid, num_segments: int):
    """sum of bf16 ``data`` [E, F] over ``ids`` segments via per-tile
    one-hot MXU contractions; returns [num_segments, F] in data.dtype
    (f32-accumulated).  F must be a lane multiple (128); padded/masked
    slots must carry zero data (the masked_segment_sum convention).
    ``n_valid``: dynamic contiguous-prefix bound (None = all) — edge
    tiles wholly past it skip their one-hot build + MXU dot."""
    return _fwd(data, ids, n_valid, num_segments)[0]


def _fwd(data, ids, n_valid, num_segments):
    e, f = data.shape
    et = ET
    s_pad = _round_up(num_segments, 16)
    data_p, ids2, ep = _pad_inputs(data, ids, et)
    if n_valid is None:
        nv = jnp.full((1,), ep, jnp.int32)
    else:
        nv = jnp.minimum(jnp.asarray(n_valid, jnp.int32), ep).reshape(1)
    acc = pl.pallas_call(
        _fwd_kernel(s_pad, et),
        out_shape=jax.ShapeDtypeStruct((s_pad, f), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ep // et,),
            in_specs=[
                pl.BlockSpec((1, 8, et), lambda t, nv: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((et, f), lambda t, nv: (t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((s_pad, f), lambda t, nv: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(nv, ids2, data_p.astype(jnp.bfloat16))
    return acc[:num_segments].astype(data.dtype), (ids, e, f, n_valid is None)


def _bwd(num_segments, res, g):
    import numpy as np

    ids, e, f, nv_was_none = res
    # out-of-range ids contribute ZERO forward (the one-hot matches no
    # segment, same as XLA segment_sum's drop semantics) — their gradient
    # must be zero too, not the clamp-to-last-row jnp.take defaults to
    dmsg = jnp.take(g, ids, axis=0, mode="fill", fill_value=0)
    # ids are integral: float0 cotangent, as jax requires
    nv_ct = None if nv_was_none else np.zeros((), dtype=jax.dtypes.float0)
    return (dmsg, np.zeros(ids.shape, dtype=jax.dtypes.float0), nv_ct)


onehot_segment_sum.defvjp(_fwd, _bwd)
