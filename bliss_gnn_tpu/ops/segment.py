"""Masked segment ops — the TPU-native g-SpMM / g-SDDMM layer.

The reference leans on DGL's CUDA gspmm/gsddmm kernels for every sparse op
(SURVEY.md §2b): ``copy_e_sum``, ``e_div_u``, ``e_div_v``, ``v_add_e``,
``e_mul_v``, ``u_div_e``, ``e_dot_v``, ``u_add_v``, ``edge_softmax``, and the
``u_mul_e -> sum`` message passing inside SAGEConv/GraphConv/GATv2Conv.

Here every sparse structure is a *padded edge list*: parallel arrays
``(e_src, e_dst, mask)`` of static length, where masked slots are ignored.
The g-SDDMM family degenerates to gathers + elementwise ops (XLA fuses these);
the g-SpMM family is a masked segment-sum.  A Pallas CSR kernel backs the
full-graph SpMM path (ops/spmm_pallas.py); these jnp forms are the
reference/correctness implementations and the default for sampled blocks,
where XLA's scatter-add + fusion is already strong.

Masking convention: out-of-range / padded edges carry ``mask == False``; data
is zeroed and indices clipped so no padded slot contributes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _clip_ids(ids: jax.Array, n: int, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return ids
    return jnp.where(mask, ids, 0)


def _mask_data(data: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return data
    m = mask
    while m.ndim < data.ndim:
        m = m[..., None]
    return jnp.where(m, data, jnp.zeros((), dtype=data.dtype))


def masked_segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    n_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """sum of data over segments; masked slots contribute zero.

    data: [E, ...]; segment_ids: [E] in [0, num_segments); out [num_segments, ...].

    Frontier-scale 1-D float sums route through the Pallas banked
    scatter-add (2.1 vs 5-7 ns/elem — ops/scatter_pallas.py); everything
    else stays on XLA's scatter.

    ``n_valid``: optional dynamic scalar asserting every unmasked slot
    lives in the contiguous prefix [0, n_valid) — the banked kernel then
    skips whole tiles past it (the static caps run ~1.25x over the true
    stream).  Only passed by callers whose masks are prefix-shaped
    (frontier valid chunks, compact_by_mask outputs).
    """
    data = _mask_data(data, mask)
    ids = _clip_ids(segment_ids, num_segments, mask)
    from bliss_gnn_tpu.ops.scatter_pallas import maybe_banked_scatter_add

    out = maybe_banked_scatter_add(ids, data, num_segments, n_valid=n_valid)
    if out is not None:
        return out.astype(data.dtype)
    out = _maybe_onehot_segment_sum(data, ids, num_segments, n_valid)
    if out is not None:
        return out
    from bliss_gnn_tpu.ops.rowscatter_pallas import maybe_row_scatter_add

    # wide-feature 2-D payloads past the one-hot cap (the GAT [E, H*O]
    # aggregations): banked row scatter, 1.08-1.2x XLA (probe_rowscatter)
    out = maybe_row_scatter_add(ids, data, num_segments, n_valid=n_valid)
    if out is not None:
        return out.astype(data.dtype)
    return jax.ops.segment_sum(data, ids, num_segments=num_segments)


# one-hot MXU segment-sum thresholds: the scatter-add it replaces runs
# ~12-17 ns/edge on a [100k, 256] block aggregation where the one-hot
# contraction is MXU-bound at S*F MAC/edge — i.e. its cost SCALES WITH
# num_segments: measured (r4 traces) 0.98 ms at S=3712 (beats the 1.23 ms
# XLA scatter) but 2.14 ms at S=8064 (loses).  The segment cap keeps the
# route on the winning side of that crossover; below the edge floor the
# launch overhead loses.
_OH_MIN_EDGES = 1 << 15
_OH_MAX_SEGMENTS = 4096
_OH_TILE = 2048
ONEHOT_SEGMENT_INTERPRET = False  # test hook


def _maybe_onehot_segment_sum(data, ids, num_segments, n_valid=None):
    """Feature-matrix segment-sum as per-tile one-hot MXU contractions:
    onehot[n_seg, et] @ msg[et, F] in bf16 with f32 accumulation
    (strictly better precision than XLA's elementwise bf16
    scatter-adds).  The sampled-block aggregation (u_mul_e_sum over
    ~100k edges x 256 features into ~1-4k dst slots at the Reddit refit
    caps) is the target; returns None when the shape is out of profile
    and the caller falls back to XLA.

    Runs as a Pallas kernel (ops/segsum_pallas.py): the jnp scan/fori
    forms were measured to make XLA materialize EVERY tile's one-hot
    into one stacked [n_tiles, S, et] buffer (~745 MB of HBM traffic
    per step at the Reddit refit caps, trace fusion.965/while.39)
    regardless of loop style."""
    use = (
        (jax.default_backend() == "tpu" or ONEHOT_SEGMENT_INTERPRET)
        and data.ndim == 2
        # bf16 only: f32 payloads would LOSE precision through the bf16
        # one-hot contraction vs XLA's f32 scatter-add
        and data.dtype == jnp.bfloat16
        and data.shape[0] >= _OH_MIN_EDGES
        and num_segments <= _OH_MAX_SEGMENTS
        # the MXU cost is S*F MAC/edge; the XLA scatter it displaces is
        # ~F-proportional bandwidth — measured crossover S*F ~ 1M
        # (S=3712,F=256: 0.98 vs 1.23 ms wins; S=3712,F=1024: 4.8 vs
        # 3.7 ms loses — r4 GAT trace)
        and num_segments * data.shape[1] <= 1 << 20
        and data.shape[1] % 128 == 0
    )
    if not use:
        return None
    from bliss_gnn_tpu.ops import segsum_pallas

    if n_valid is not None:
        n_valid = jnp.asarray(n_valid, jnp.int32).reshape(())
    if ONEHOT_SEGMENT_INTERPRET and jax.default_backend() != "tpu":
        # CPU test hook: interpret mode only for THIS call — save/restore
        # so interpret does not leak to later onehot_segment_sum calls
        # after a test resets ONEHOT_SEGMENT_INTERPRET
        prev = segsum_pallas.INTERPRET
        segsum_pallas.INTERPRET = True
        try:
            return segsum_pallas.onehot_segment_sum(data, ids, n_valid,
                                                    num_segments)
        finally:
            segsum_pallas.INTERPRET = prev
    return segsum_pallas.onehot_segment_sum(data, ids, n_valid, num_segments)


def masked_segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    initial: float = -jnp.inf,
) -> jax.Array:
    if mask is not None:
        m = mask
        while m.ndim < data.ndim:
            m = m[..., None]
        data = jnp.where(m, data, jnp.full((), initial, dtype=data.dtype))
        segment_ids = jnp.where(mask, segment_ids, 0)
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


# -- DGL-named aliases over padded edge lists -------------------------------


def copy_e_sum(e_vals, e_dst, n_dst, mask=None):
    """dgl.ops.copy_e_sum: per-dst sum of edge values (bandit_sampler.py:67,129)."""
    return masked_segment_sum(e_vals, e_dst, n_dst, mask)


def gather_u(x_src, e_src, mask=None):
    """Per-edge gather of the src-node operand (the 'u' side of g-SDDMM)."""
    out = jnp.take(x_src, e_src, axis=0)
    return _mask_data(out, mask)


def gather_v(x_dst, e_dst, mask=None):
    """Per-edge gather of the dst-node operand (the 'v' side of g-SDDMM)."""
    out = jnp.take(x_dst, e_dst, axis=0)
    return _mask_data(out, mask)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows(x, idx, n_rows, n_valid=None):
    """jnp.take whose VJP routes through masked_segment_sum: XLA's
    autodiff of take is a 2-D scatter-add (measured 1.23 ms on the l0
    block's [100k, 256] message gradient, trace fusion.121) where the
    one-hot MXU segment-sum runs it in ~0.35 ms.

    Out-of-range ids read ZERO forward (mode="fill") so the forward
    matches the backward's drop semantics (masked_segment_sum drops OOB
    segment ids) — the default clip mode would give an unmasked OOB
    index a forward contribution from the last row but zero gradient.

    ``n_valid``: contiguous-prefix bound forwarded to the VJP's
    segment-sum so the backward scatter skips the caps' slack tail
    (every consumer masks the gathered rows by the same prefix)."""
    return jnp.take(x, idx, axis=0, mode="fill", fill_value=0)


def _gather_rows_fwd(x, idx, n_rows, n_valid=None):
    return (jnp.take(x, idx, axis=0, mode="fill", fill_value=0),
            (idx, n_valid))


def _gather_rows_bwd(n_rows, res, g):
    import numpy as np

    idx, n_valid = res
    dx = masked_segment_sum(g, idx, n_rows, n_valid=n_valid)
    nv_ct = (None if n_valid is None
             else np.zeros(np.shape(n_valid), dtype=jax.dtypes.float0))
    return (dx, np.zeros(idx.shape, dtype=jax.dtypes.float0), nv_ct)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def u_mul_e_sum(x_src, e_src, e_vals, e_dst, n_dst, mask=None):
    """SpMM: sum_{e into i} w_e * x[src(e)]  (fn.u_mul_e + fn.sum, model.py:98,
    SAGEConv/GraphConv message passing).

    x_src [N_src, F]; e_vals [E] or [E, H]; out [n_dst, F] (or [n_dst, H, F']).
    """
    msg = _gather_rows(x_src, e_src, x_src.shape[0])
    w = e_vals
    while w.ndim < msg.ndim:
        w = w[..., None]
    return masked_segment_sum(msg * w.astype(msg.dtype), e_dst, n_dst, mask)


def copy_u_sum(x_src, e_src, e_dst, n_dst, mask=None):
    """SpMM with unit weights: sum_{e into i} x[src(e)]."""
    msg = _gather_rows(x_src, e_src, x_src.shape[0])
    return masked_segment_sum(msg, e_dst, n_dst, mask)


def segment_mean(data, segment_ids, num_segments, mask=None):
    """Per-segment mean; empty segments yield 0 (DGL fn.mean semantics)."""
    s = masked_segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones(data.shape[0], dtype=jnp.float32)
    cnt = masked_segment_sum(ones, segment_ids, num_segments, mask)
    cnt = jnp.maximum(cnt, 1.0)
    while cnt.ndim < s.ndim:
        cnt = cnt[..., None]
    return s / cnt.astype(s.dtype)


def edge_softmax(
    logits: jax.Array,
    e_dst: jax.Array,
    n_dst: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Segment softmax of edge scores over incoming edges per dst
    (dglnn.functional.edge_softmax, model.py:89).

    logits: [E] or [E, H]; returns same shape; masked edges get 0.
    Numerically stabilized with a per-segment max subtraction.
    """
    compute = logits.astype(jnp.float32)
    seg_max = masked_segment_max(compute, e_dst, n_dst, mask)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = compute - jnp.take(seg_max, _clip_ids(e_dst, n_dst, mask), axis=0)
    ex = jnp.exp(shifted)
    ex = _mask_data(ex, mask)
    denom = masked_segment_sum(ex, e_dst, n_dst, mask)
    denom = jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)
    out = ex / jnp.take(denom, _clip_ids(e_dst, n_dst, mask), axis=0)
    return _mask_data(out, mask).astype(logits.dtype)


def segment_count(segment_ids, num_segments, mask=None,
                  dtype=jnp.int32, n_valid=None) -> jax.Array:
    """Per-segment edge counts (in-degrees of a padded edge list).

    Counted in f32 so the banked Pallas scatter path applies (1.5-2x the
    XLA int scatter at block scales); exact — a segment's count is
    bounded by the edge capacity << 2^24.  Hot callers that consume the
    count as float pass ``dtype=jnp.float32`` to skip the
    round->int32->float32 conversion passes."""
    ones = jnp.ones(segment_ids.shape[0], dtype=jnp.float32)
    out = masked_segment_sum(ones, segment_ids, num_segments, mask,
                             n_valid=n_valid)
    if dtype == jnp.float32:
        return out
    return jnp.round(out).astype(dtype)
