"""Banded Pallas GATv2 attention aggregation (full-graph inference path).

Replaces the 3-pass XLA streaming softmax (ops/fullgraph.py:
full_gat_attention) with ONE banded sweep using flash-attention-style
online softmax: the accumulator block carries, per dst row and head, the
running max M, the running denominator d, and the weighted feature sums in
the running-max frame.  Each tile folds in:

    m_tile[w,h] = max over tile edges into w of logit e
    M'          = max(M, m_tile);  s = exp(M - M')
    w_e         = exp(e - M'[dst_e])          (0 on padded slots)
    acc'        = acc * s + sum_e w_e * feat_src(e)
    d'          = d * s + sum_e w_e

Same layout/aliasing contract as ops/spmm_pallas.py: tiles of a (band,
window) bucket are consecutive within a band sweep, the first tile of a
run reads the HBM accumulator, later tiles accumulate into the resident
output block.  GATv2 logit semantics mirror models/layers.py:GATv2Conv /
the reference's custom_GATv2Conv (model.py:80-98):
e = sum_O(leakyrelu(el_src + er_dst) * attn), softmax per dst per head,
message el_src * a.

Per-edge dst-side operands come from the resident window block via one-hot
MXU contractions (no dst gathers); per-edge src features use the same VMEM
row-gather loop as the SpMM kernel.

Performance floor (probed on v5e at full Reddit scale, H=1 O=256,
scripts/probe_gat_honest.py; cycles at ~0.94 GHz):

    base kernel   110.9 M edges/s (8.5 cy/edge)
    packed kernel 167.4 M edges/s (5.66 cy/edge, 1.51x) <- default at
                                                           H*O_pad <= 256

Packed budget per edge: 1.7 cy packed (1,128) row copy (the probed
fast-path floor, scripts/probe_gather.py) + 1.26 cy MXU (the er and
message contractions are each [256x2048]@[2048x256] = 134 M MAC/tile —
algorithmically required: one logit term, one weighted aggregate) + ~2.5
cy of [wr, et]-shaped VPU passes (two one-hot builds, the per-dst masked
max, the w_e mask, the denominator reduce — all inherent to online
softmax via one-hot scatter) ~= 5.5 cy/edge; the kernel runs at ~97% of
that floor.  Two levers probed and REJECTED:
- lane-aligning the accumulator's m/d columns into their own 128-lane
  groups (vs the f+2H misaligned width): 166.4 M — within noise, Mosaic
  already handles the masked tail well;
- replacing the rel_col / w_col [wr, et] masked-reduce derivations with
  direct lane->sublane relayouts (rel[:, None], (wv > 0)[None, :]):
  159.7 M base 108.2 — the explicit relayout of a lane-major [et] vector
  is SLOWER than re-deriving it through a [wr, et] reduce, which is why
  the kernel derives sublane-major operands the way it does.
Reaching ~200 M would require fewer [wr, et] passes per tile; with max,
mask, and denominator each needing one, the headroom is ~0.5 cy/edge.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_gnn_tpu.ops.spmm_pallas import DeviceBandedLayout, _round_up

NEG = -1e30


def _gat_kernel(et: int, wr: int, f: int, h: int, o: int, slope: float,
                unroll: int, mxu_dtype=jnp.bfloat16):
    def kernel(
        tile_win_ref,  # scalar prefetch [nt]
        tile_first_ref,  # scalar prefetch [nt]
        src_rel_ref,  # [et] SMEM
        dst_rel_ref,  # [1, 1, et] VMEM int32
        w_ref,  # [1, 1, et] VMEM f32 (0 = padded slot)
        attn_ref,  # [f, h] VMEM f32 (block-diagonal attention vector)
        band_ref,  # [band, f] VMEM f32 (src features, this band)
        win_ref,  # [wr, f] VMEM f32 (dst features, this tile's window)
        acc_in_ref,  # [wr, f + 2h] VMEM f32 (aliased)
        acc_out_ref,
        msgs_ref,  # scratch [et, f]
    ):
        t = pl.program_id(0)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                msgs_ref[pl.ds(base + j, 1), :] = band_ref[
                    pl.ds(src_rel_ref[base + j], 1), :
                ]
            return 0

        jax.lax.fori_loop(0, et // unroll, body, 0)

        rel = dst_rel_ref[0, 0, :]  # [et] lane-major
        wv = w_ref[0, 0, :]  # [et] lane-major
        rows = jax.lax.broadcasted_iota(jnp.int32, (wr, et), 0)
        onehot_w2e = rows == rel[None, :]  # [wr, et]

        # er per edge via one-hot MXU: [et, wr] @ [wr, f]
        cols = jax.lax.broadcasted_iota(jnp.int32, (et, wr), 1)
        rel_col = jnp.sum(
            jnp.where(onehot_w2e, rows, 0), axis=0
        )  # [et] = rel again (lane->sublane relayout happens at [:, None])
        onehot_e2w = (cols == rel_col[:, None]).astype(mxu_dtype)
        er = jnp.dot(
            onehot_e2w, win_ref[:].astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )  # [et, f]
        z = msgs_ref[:] + er
        z = jnp.where(z >= 0, z, slope * z)
        e = jnp.dot(
            z.astype(mxu_dtype), attn_ref[:].astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )  # [et, h]
        w_col = jnp.sum(
            jnp.where(onehot_w2e, wv[None, :], 0.0), axis=0
        )  # [et] sublane-major? axis=0 reduce of [wr, et] -> [et] lane-major
        # NOTE: reductions of [wr, et] along axis 0 give a lane-major [et]
        # vector; e is [et, h] sublane-major.  Mask via broadcast transpose:
        eT = e.T  # [h, et]
        validT = (w_col > 0)[None, :]  # [1, et]
        eT = jnp.where(validT, eT, NEG)

        # per-dst tile max, per head: [wr, et] masked by onehot
        m_parts = []
        for hh in range(h):
            masked = jnp.where(onehot_w2e, eT[hh][None, :], NEG)
            m_parts.append(jnp.max(masked, axis=1, keepdims=True))
        m_tile = jnp.concatenate(m_parts, axis=1)  # [wr, h]

        first = tile_first_ref[t] == 1

        def fold(acc_prev):
            feats = acc_prev[:, :f]
            m_old = acc_prev[:, f : f + h]
            d_old = acc_prev[:, f + h :]
            m_new = jnp.maximum(m_old, m_tile)
            scale = jnp.exp(m_old - m_new)  # [wr, h]
            # m per edge: [et, wr] @ [wr, h] in f32 — w_e and the d/scale
            # updates must use the SAME m frame; a bf16-rounded m here
            # would skew every weight by exp(m - round(m))
            m_e = jnp.dot(
                onehot_e2w.astype(jnp.float32), m_new,
                preferred_element_type=jnp.float32,
            )
            m_eT = m_e.T  # [h, et]
            w_eT = jnp.where(validT, jnp.exp(eT - m_eT), 0.0)  # [h, et]
            parts = []
            d_parts = []
            for hh in range(h):
                oneh = jnp.where(
                    onehot_w2e, w_eT[hh][None, :], 0.0
                )  # [wr, et] f32
                part = jnp.dot(
                    oneh.astype(mxu_dtype),
                    msgs_ref[:, hh * o : (hh + 1) * o].astype(mxu_dtype),
                    preferred_element_type=jnp.float32,
                )  # [wr, o]
                parts.append(part)
                d_parts.append(jnp.sum(oneh, axis=1, keepdims=True))
            part_all = jnp.concatenate(parts, axis=1)  # [wr, f]
            d_tile = jnp.concatenate(d_parts, axis=1)  # [wr, h]
            scale_f = jnp.repeat(scale, o, axis=1)  # [wr, f]
            feats = feats * scale_f + part_all
            d_new = d_old * scale + d_tile
            return jnp.concatenate([feats, m_new, d_new], axis=1)

        @pl.when(first)
        def _():
            acc_out_ref[:, :] = fold(acc_in_ref[:, :])

        @pl.when(jnp.logical_not(first))
        def _():
            acc_out_ref[:, :] = fold(acc_out_ref[:, :])

    return kernel


def banded_gat_attention(
    feat: jax.Array,  # [N, H, O] projected features (shared src/dst)
    attn: jax.Array,  # [1, H, O] (or [H, O]) attention vector
    negative_slope: float,
    layout: DeviceBandedLayout,
    n_nodes: int,
    unroll: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Full-graph GATv2 attention aggregation -> [N, H, O] f32.

    ``layout`` must be built with unit edge_vals (weights only mark valid
    slots).  O is lane-padded internally; H*O_pad must fit the VMEM budget
    (band f32 features resident per sweep).
    """
    m = layout.meta
    H, O = feat.shape[1], feat.shape[2]
    o_pad = _round_up(O, 128)
    f = H * o_pad
    # block-diagonal attention: attn_blk[h*o_pad + j, h] = attn[h, j]
    attn2 = attn.reshape(H, O).astype(jnp.float32)
    attn_blk = jnp.zeros((f, H), jnp.float32)
    for hh in range(H):
        attn_blk = attn_blk.at[
            hh * o_pad : hh * o_pad + O, hh
        ].set(attn2[hh])
    # padded flat features, [rows, f]
    rows_needed = max(m.n_bands * m.band, m.n_wins * m.wr)
    x = jnp.zeros((rows_needed, f), jnp.float32)
    src = feat.astype(jnp.float32)
    for hh in range(H):
        x = x.at[:n_nodes, hh * o_pad : hh * o_pad + O].set(src[:, hh, :])

    acc = jnp.zeros((m.n_wins * m.wr, f + 2 * H), jnp.float32)
    acc = acc.at[:, f : f + H].set(NEG)
    unroll = math.gcd(unroll, m.et)
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16
    kernel = _gat_kernel(m.et, m.wr, f, H, o_pad, negative_slope, unroll,
                         mxu_dtype)
    nt = m.nt_per_band
    for band_id in range(m.n_bands):
        t0, t1 = band_id * nt, (band_id + 1) * nt
        band_slice = jax.lax.dynamic_slice_in_dim(
            x, band_id * m.band, m.band, axis=0
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((m.et,), lambda i, tw, tf: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, m.et), lambda i, tw, tf: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, m.et), lambda i, tw, tf: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # attn_blk
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole band
                pl.BlockSpec((m.wr, f), lambda i, tw, tf: (tw[i], 0),
                             memory_space=pltpu.VMEM),  # window feats
                pl.BlockSpec((m.wr, f + 2 * H),
                             lambda i, tw, tf: (tw[i], 0),
                             memory_space=pltpu.VMEM),  # acc in
            ],
            out_specs=pl.BlockSpec(
                (m.wr, f + 2 * H), lambda i, tw, tf: (tw[i], 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((m.et, f), jnp.float32)],
        )
        acc = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (m.n_wins * m.wr, f + 2 * H), jnp.float32
            ),
            grid_spec=grid_spec,
            input_output_aliases={8: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            layout.tile_win[band_id],
            layout.tile_first[band_id],
            layout.src_rel[band_id],
            layout.dst_rel[t0:t1],
            layout.edge_w[t0:t1],
            attn_blk,
            band_slice,
            x[: m.n_wins * m.wr],
            acc,
        )
    feats = acc[:n_nodes, :f]
    d = jnp.maximum(acc[:n_nodes, f + H :], jnp.finfo(jnp.float32).tiny)
    out = jnp.zeros((n_nodes, H, O), jnp.float32)
    for hh in range(H):
        out = out.at[:, hh, :].set(
            feats[:, hh * o_pad : hh * o_pad + O] / d[:, hh : hh + 1]
        )
    return out


def _gat_kernel_packed(et: int, wr: int, f_half: int, h: int, o: int,
                       slope: float, unroll: int,
                       mxu_dtype=jnp.bfloat16):
    """bf16 pair-packed gather variant of ``_gat_kernel``.

    The src-feature row gather is the measured bottleneck of the banded GAT
    sweep (same ~5-7 cy/row loop as the SpMM kernel, scaling with lane
    count); the band arrives as f32 [band, f_half] with adjacent bf16
    feature pairs packed per lane (``pack_band_features`` trick,
    ops/spmm_pallas.py:_spmm_kernel_packed), halving the gathered lanes.
    The in-kernel bitcast unpack leaves messages in the FIXED [evens|odds]
    column permutation, so every per-feature operand (dst/window features,
    the block-diagonal attention matrix, the accumulator) lives in that
    permuted space too — the logit dot and leakyrelu are permutation-
    invariant, and per-head column ranges split into two contiguous slices
    (evens at [hh*o/2, (hh+1)*o/2), odds at f_half + the same range).
    """
    f = 2 * f_half
    oh = o // 2  # per-head half-width in the permuted space

    def kernel(
        tile_win_ref, tile_first_ref, src_rel_ref,
        dst_rel_ref,  # [1, 1, et] VMEM int32
        w_ref,  # [1, 1, et] VMEM f32 (0 = padded slot)
        attn_ref,  # [f, h] VMEM f32, ROWS PERMUTED ([evens|odds])
        band_ref,  # [band, f_half] f32 packed bf16 pairs
        win_ref,  # [wr, f] f32, COLUMNS PERMUTED
        acc_in_ref,  # [wr, f + 2h] (feats permuted; m, d appended)
        acc_out_ref,
        msgs_ref,  # scratch [et, f_half] f32 (packed)
    ):
        t = pl.program_id(0)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                msgs_ref[pl.ds(base + j, 1), :] = band_ref[
                    pl.ds(src_rel_ref[base + j], 1), :
                ]
            return 0

        jax.lax.fori_loop(0, et // unroll, body, 0)
        msgs = pltpu.bitcast(msgs_ref[:], jnp.bfloat16).reshape(et, f)

        rel = dst_rel_ref[0, 0, :]
        wv = w_ref[0, 0, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (wr, et), 0)
        onehot_w2e = rows == rel[None, :]
        cols = jax.lax.broadcasted_iota(jnp.int32, (et, wr), 1)
        rel_col = jnp.sum(jnp.where(onehot_w2e, rows, 0), axis=0)
        onehot_e2w = (cols == rel_col[:, None]).astype(mxu_dtype)
        er = jnp.dot(
            onehot_e2w, win_ref[:].astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )  # [et, f] permuted
        z = msgs.astype(jnp.float32) + er
        z = jnp.where(z >= 0, z, slope * z)
        e = jnp.dot(
            z.astype(mxu_dtype), attn_ref[:].astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )  # [et, h]
        w_col = jnp.sum(jnp.where(onehot_w2e, wv[None, :], 0.0), axis=0)
        eT = e.T
        validT = (w_col > 0)[None, :]
        eT = jnp.where(validT, eT, NEG)

        m_parts = []
        for hh in range(h):
            masked = jnp.where(onehot_w2e, eT[hh][None, :], NEG)
            m_parts.append(jnp.max(masked, axis=1, keepdims=True))
        m_tile = jnp.concatenate(m_parts, axis=1)  # [wr, h]

        first = tile_first_ref[t] == 1

        def fold(acc_prev):
            feats = acc_prev[:, :f]
            m_old = acc_prev[:, f : f + h]
            d_old = acc_prev[:, f + h :]
            m_new = jnp.maximum(m_old, m_tile)
            scale = jnp.exp(m_old - m_new)
            m_e = jnp.dot(
                onehot_e2w.astype(jnp.float32), m_new,
                preferred_element_type=jnp.float32,
            )
            m_eT = m_e.T
            w_eT = jnp.where(validT, jnp.exp(eT - m_eT), 0.0)
            parts_e = []
            parts_o = []
            d_parts = []
            for hh in range(h):
                oneh = jnp.where(onehot_w2e, w_eT[hh][None, :], 0.0)
                oneh_m = oneh.astype(mxu_dtype)
                parts_e.append(jnp.dot(
                    oneh_m, msgs[:, hh * oh : (hh + 1) * oh],
                    preferred_element_type=jnp.float32,
                ))
                parts_o.append(jnp.dot(
                    oneh_m, msgs[:, f_half + hh * oh : f_half + (hh + 1) * oh],
                    preferred_element_type=jnp.float32,
                ))
                d_parts.append(jnp.sum(oneh, axis=1, keepdims=True))
            pad_w = f_half - h * oh  # permuted tail when H*o_pad % 256 != 0
            if pad_w:
                zpad = jnp.zeros((wr, pad_w), jnp.float32)
                parts_e.append(zpad)
                parts_o.append(zpad)
            part_all = jnp.concatenate(parts_e + parts_o, axis=1)  # [wr, f]
            d_tile = jnp.concatenate(d_parts, axis=1)
            scale_h = jnp.repeat(scale, oh, axis=1)  # [wr, h*oh]
            if pad_w:
                scale_h = jnp.concatenate(
                    [scale_h, jnp.ones((wr, pad_w), jnp.float32)], axis=1)
            scale_f = jnp.concatenate([scale_h, scale_h], axis=1)
            feats = feats * scale_f + part_all
            d_new = d_old * scale + d_tile
            return jnp.concatenate([feats, m_new, d_new], axis=1)

        @pl.when(first)
        def _():
            acc_out_ref[:, :] = fold(acc_in_ref[:, :])

        @pl.when(jnp.logical_not(first))
        def _():
            acc_out_ref[:, :] = fold(acc_out_ref[:, :])

    return kernel


def banded_gat_attention_packed(
    feat: jax.Array,  # [N, H, O] projected features (shared src/dst)
    attn: jax.Array,  # [1, H, O] (or [H, O]) attention vector
    negative_slope: float,
    layout: DeviceBandedLayout,
    n_nodes: int,
    unroll: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Pair-packed-gather full-graph GATv2 attention -> [N, H, O] f32.

    Numerics: messages round through bf16 at the unpack (the TPU path of
    the base kernel feeds every MXU contraction in bf16 anyway, so the
    difference is one extra bf16 rounding of the message operand of the
    logit sum).  Requires H*round_up(O,128) padded to a multiple of 256
    (done internally; zero columns are inert in every contraction).
    """
    m = layout.meta
    H, O = feat.shape[1], feat.shape[2]
    o_pad = _round_up(O, 128)
    f = H * o_pad
    f_total = _round_up(f, 256)
    f_half = f_total // 2
    if o_pad % 2:
        raise ValueError("o_pad must be even")  # unreachable: 128-aligned
    attn2 = attn.reshape(H, O).astype(jnp.float32)
    attn_blk = jnp.zeros((f_total, H), jnp.float32)
    for hh in range(H):
        attn_blk = attn_blk.at[hh * o_pad : hh * o_pad + O, hh].set(attn2[hh])
    # permute attention rows into the packed kernel's [evens|odds] space
    attn_perm = jnp.concatenate([attn_blk[0::2], attn_blk[1::2]], axis=0)

    rows_needed = max(m.n_bands * m.band, m.n_wins * m.wr)
    x = jnp.zeros((rows_needed, f_total), jnp.float32)
    src = feat.astype(jnp.float32)
    for hh in range(H):
        x = x.at[:n_nodes, hh * o_pad : hh * o_pad + O].set(src[:, hh, :])
    # band side: adjacent bf16 pairs packed into f32 lanes
    xp = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16).reshape(rows_needed, f_half, 2), jnp.float32
    )
    # window (dst) side: plain f32, columns permuted to match the unpack
    x_perm = jnp.concatenate([x[:, 0::2], x[:, 1::2]], axis=1)

    acc = jnp.zeros((m.n_wins * m.wr, f_total + 2 * H), jnp.float32)
    acc = acc.at[:, f_total : f_total + H].set(NEG)
    unroll = math.gcd(unroll, m.et)
    mxu_dtype = jnp.float32 if interpret else jnp.bfloat16
    # per-head permuted half-width: o_pad//2 except the padding tail, which
    # only ever multiplies zero columns
    kernel = _gat_kernel_packed(m.et, m.wr, f_half, H, o_pad, negative_slope,
                                unroll, mxu_dtype)
    nt = m.nt_per_band
    for band_id in range(m.n_bands):
        t0, t1 = band_id * nt, (band_id + 1) * nt
        band_slice = jax.lax.dynamic_slice_in_dim(
            xp, band_id * m.band, m.band, axis=0
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((m.et,), lambda i, tw, tf: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, m.et), lambda i, tw, tf: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, m.et), lambda i, tw, tf: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # attn_perm
                pl.BlockSpec(memory_space=pltpu.VMEM),  # packed band
                pl.BlockSpec((m.wr, f_total), lambda i, tw, tf: (tw[i], 0),
                             memory_space=pltpu.VMEM),  # window feats (perm)
                pl.BlockSpec((m.wr, f_total + 2 * H),
                             lambda i, tw, tf: (tw[i], 0),
                             memory_space=pltpu.VMEM),  # acc in
            ],
            out_specs=pl.BlockSpec(
                (m.wr, f_total + 2 * H), lambda i, tw, tf: (tw[i], 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((m.et, f_half), jnp.float32)],
        )
        acc = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (m.n_wins * m.wr, f_total + 2 * H), jnp.float32
            ),
            grid_spec=grid_spec,
            input_output_aliases={8: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            layout.tile_win[band_id],
            layout.tile_first[band_id],
            layout.src_rel[band_id],
            layout.dst_rel[t0:t1],
            layout.edge_w[t0:t1],
            attn_perm,
            band_slice,
            x_perm[: m.n_wins * m.wr],
            acc,
        )
    # undo the [evens|odds] permutation, strip padding, normalize per head
    fp = acc[:n_nodes, :f_total]
    feats = jnp.zeros_like(fp)
    feats = feats.at[:, 0::2].set(fp[:, :f_half])
    feats = feats.at[:, 1::2].set(fp[:, f_half:])
    d = jnp.maximum(acc[:n_nodes, f_total + H :], jnp.finfo(jnp.float32).tiny)
    out = jnp.zeros((n_nodes, H, O), jnp.float32)
    for hh in range(H):
        out = out.at[:, hh, :].set(
            feats[:, hh * o_pad : hh * o_pad + O] / d[:, hh : hh + 1]
        )
    return out
