"""GNN convolution layers over capacity-padded blocks.

TPU-native equivalents of the DGL conv modules the reference uses:
- SAGEConv(mean, edge-weighted)  — dglnn.SAGEConv, model.py:303-308
- GraphConv(norm='both')         — dglnn.GraphConv, model.py:398-416
- GATv2Conv (shared weights, bias-free, pre-softmax logit export)
                                 — custom_GATv2Conv, model.py:13-112

Each layer consumes ``(block, h_src)`` where ``h_src`` is [n_src_cap, F]
aligned with the block's src table (dst nodes occupy the first n_dst_cap
slots, so ``h_dst = h_src[:n_dst_cap]``).  The MXU does the dense work
(feature projections, kept large and bf16); the VPU + scatter do the sparse
aggregation via the masked segment ops.  When ``in_feats > out_feats`` the
projection runs *before* aggregation (fewer FLOPs and bytes through the
segment-sum — the same algebraic rewrite DGL's lin_before_mp does).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bliss_gnn_tpu.ops.segment import (
    _gather_rows,
    edge_softmax,
    masked_segment_sum,
    segment_count,
)
from bliss_gnn_tpu.sampling.block import Block

_xavier = nn.initializers.xavier_uniform()
# DGL initializes SAGE/GAT weights with xavier gain sqrt(2): variance scale 2
_xavier_relu = nn.initializers.variance_scaling(2.0, "fan_avg", "uniform")


class SAGEConv(nn.Module):
    """GraphSAGE mean-aggregator with optional per-edge weights.

    h'_i = W_self h_i + W_neigh ( sum_e w_e h_src(e) / deg_i ) + b

    With the sampler's debiased weights (W-tilde, scaled by deg) the weighted
    mean is an unbiased estimator of the full mean aggregation.  Without
    weights (full/neighbor baselines) w_e = 1 gives the plain mean.
    """

    out_feats: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, block: Block, h_src: jax.Array) -> jax.Array:
        in_feats = h_src.shape[-1]
        n_dst = block.n_dst_cap
        h_src = h_src.astype(self.dtype)
        h_dst = h_src[:n_dst]
        fc_neigh = nn.Dense(
            self.out_feats, use_bias=False, kernel_init=_xavier_relu,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc_neigh",
        )
        fc_self = nn.Dense(
            self.out_feats, use_bias=False, kernel_init=_xavier_relu,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc_self",
        )
        lin_before = in_feats > self.out_feats
        src_val = fc_neigh(h_src) if lin_before else h_src
        # VJP of the message gather routes through the one-hot MXU
        # segment-sum instead of XLA's 2-D scatter-add (ops/segment.py)
        nv = block.n_valid_edges()
        msg = _gather_rows(src_val, block.e_src, src_val.shape[0],
                           n_valid=nv)
        msg = msg * block.e_weight[:, None].astype(self.dtype)
        agg = masked_segment_sum(msg, block.e_dst, n_dst, block.e_mask,
                                 n_valid=nv)
        deg = segment_count(block.e_dst, n_dst, block.e_mask,
                            dtype=jnp.float32, n_valid=nv)
        agg = agg / jnp.maximum(deg, 1.0)[:, None].astype(self.dtype)
        h_neigh = agg if lin_before else fc_neigh(agg)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_feats,), self.param_dtype
        )
        return fc_self(h_dst) + h_neigh + bias.astype(self.dtype)


class GraphConv(nn.Module):
    """GCN layer, norm='both', allow_zero_in_degree (degrees clamped to 1).

    h' = D_in^{-1/2} A_w D_out^{-1/2} h W + b, degrees taken on the block's
    kept edges (DGL computes them on the MFG), edge weights multiplying the
    messages (model.py:428-434 passes the sampler's W-tilde).
    """

    out_feats: int
    activation: Optional[Callable] = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, block: Block, h_src: jax.Array) -> jax.Array:
        in_feats = h_src.shape[-1]
        n_dst = block.n_dst_cap
        n_src = block.n_src_cap
        h_src = h_src.astype(self.dtype)
        dense = nn.Dense(
            self.out_feats, use_bias=True, kernel_init=_xavier,
            dtype=self.dtype, param_dtype=self.param_dtype, name="weight",
        )
        # src-side norm: out-degrees over kept edges
        nv = block.n_valid_edges()
        out_deg = segment_count(block.e_src, n_src, block.e_mask,
                                dtype=jnp.float32, n_valid=nv)
        src_norm = jax.lax.rsqrt(jnp.maximum(out_deg, 1.0)).astype(self.dtype)
        feat = h_src * src_norm[:, None]
        if in_feats > self.out_feats:
            feat = dense(feat)
        msg = _gather_rows(feat, block.e_src, feat.shape[0], n_valid=nv)
        msg = msg * block.e_weight[:, None].astype(self.dtype)
        rst = masked_segment_sum(msg, block.e_dst, n_dst, block.e_mask,
                                 n_valid=nv)
        if in_feats <= self.out_feats:
            rst = dense(rst)
        in_deg = segment_count(block.e_dst, n_dst, block.e_mask,
                               dtype=jnp.float32, n_valid=nv)
        dst_norm = jax.lax.rsqrt(jnp.maximum(in_deg, 1.0)).astype(self.dtype)
        rst = rst * dst_norm[:, None]
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class GATv2Conv(nn.Module):
    """GATv2 attention conv mirroring the reference's custom_GATv2Conv
    (model.py:13-112): shared projection weights, no bias, attention
    e = sum(leakyrelu(el_src + er_dst) * attn, -1), edge softmax per dst per
    head, message el_src * a, optional residual.  Returns (rst, e) — the
    *pre-softmax* logits e, which the bandit's GAT reward path consumes
    (model.py:108-110 returns e, not the softmaxed a).

    edge_weight multiplication is intentionally absent: the reference
    comments it out (model.py:92-96).

    --- Sampled-block GAT cost budget (r5 trace, Reddit refit caps,
    bs=256, heads (4,4,1), H*O = 1024 between layers) ---
    GAT fused step: 71.9 ms device vs SAGE's 44.2; sampling identical
    (27.8 — model-independent).  The GAT-specific ~28 ms decomposes as:
      ~11.4 ms  three [E=100k, H*O=1024] bf16 aggregation scatters /
                gather-VJPs (trace fusion.131/157/158, 3.8 ms each) —
                the layer-0 message segment-sum and the el/er gather
                backwards.  These cannot ride the 1-D banked scatter,
                and the one-hot MXU segment-sum's S*F MAC/edge cost is
                3-8x past its cap here (measured 4.8 vs XLA's 3.7 ms at
                S=3712/F=1024, r4 trace — the _OH_MAX cap in
                ops/segment.py encodes that crossover).  The r5 2-D
                banked ROW scatter (ops/rowscatter_pallas.py) was built
                and MEASURED at 3.44-3.90 ms vs XLA's 4.12-4.20
                (1.08-1.2x, probe_rowscatter.py — the RMW chain carries
                an extra (1,128) data load per element, so the 1-D
                kernel's 3.7 cy/elem becomes ~7 cy/row) and is wired as
                the route for wide 2-D payloads.  With the n_valid
                tail-skip threaded through the gather VJPs too
                (_gather_rows(n_valid=...)), the three ops measure
                2.15/2.15/2.22 ms vs XLA's 3.8 each — 1.74x, GAT step
                71.9 -> 68.7 ms device; the residual is the row-RMW
                issue floor at the ~56k true kept edges.
      ~7 ms     loop fusions: leaky_relu + attn dot + head reshapes.
      the [E, H=4] edge softmax itself (segment max/sum over 4 lanes)
      is NOT a significant term — the r4 move to 2-D [E, H*O] tensors
      already removed the 3-D scatter pathology (31.5 -> 26.7 ms
      fwd+bwd), and the remaining softmax segment ops are minor.
    Tracked in bench.py as gat_step_ms / gat_sampling_ms.
    """

    out_feats: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, block: Block, h_src: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        n_dst = block.n_dst_cap
        H, O = self.num_heads, self.out_feats
        h_src = h_src.astype(self.dtype)
        h_src = nn.Dropout(self.feat_drop, deterministic=deterministic)(h_src)
        h_dst = h_src[:n_dst]
        fc = nn.Dense(
            H * O, use_bias=False, kernel_init=_xavier_relu,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fc_src",
        )
        # per-edge tensors stay 2-D [E, H*O]: the 3-D [E, H, O] forms made
        # every take-VJP and the message segment-sum an XLA 3-D scatter
        # (3 x ~6 ms/step at the Reddit refit caps, trace fusion.157/131/
        # 158) where the 2-D forms ride _gather_rows' segment-sum VJP and
        # the one-hot MXU/banked kernels
        feat2 = fc(h_src)  # [N_src, H*O], share_weights=True
        attn = self.param("attn", _xavier_relu, (1, H, O), self.param_dtype)
        nv = block.n_valid_edges()
        el2 = _gather_rows(feat2, block.e_src, feat2.shape[0], n_valid=nv)
        er2 = _gather_rows(
            feat2[:n_dst], jnp.clip(block.e_dst, 0, n_dst - 1), n_dst,
            n_valid=nv,
        )
        el = el2.reshape(-1, H, O)
        e_full = nn.leaky_relu(
            el + er2.reshape(-1, H, O), negative_slope=self.negative_slope
        )
        e = jnp.sum(e_full * attn.astype(self.dtype), axis=-1)  # [E, H]
        a = edge_softmax(e, block.e_dst, n_dst, block.e_mask)
        a = nn.Dropout(self.attn_drop, deterministic=deterministic)(a)
        msg2 = (el * a[..., None].astype(self.dtype)).reshape(-1, H * O)
        rst = masked_segment_sum(
            msg2, block.e_dst, n_dst, block.e_mask, n_valid=nv
        ).reshape(n_dst, H, O)
        if self.residual:
            in_dst_feats = h_dst.shape[-1]
            if in_dst_feats != H * O:
                res = nn.Dense(
                    H * O, use_bias=False, kernel_init=_xavier,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="res_fc",
                )(h_dst).reshape(n_dst, H, O)
            else:
                res = h_dst.reshape(n_dst, H, O)
            rst = rst + res
        if self.activation is not None:
            rst = self.activation(rst)
        return rst, e
