"""Multi-layer GNN models over sampled blocks, with bandit side-channels.

Mirrors model.py's SAGE (:292-383), GCN (:386-488), GATv2 (:115-289).  The
reference *mutates* DGL blocks to leak the bandit's reward inputs
(``block.srcdata['embed_norm']`` model.py:318-320, ``block.edata['a_ij']``
:224-227); here those are explicit aux outputs of the forward pass — no
mutation, jit-friendly.

Forward contract:  ``model.apply(params, blocks, x, ...)`` returns
``(logits, aux)`` where ``logits`` is [n_dst_cap(last), n_classes] and
``aux = {'embed_norms': [L x [n_src_cap_l]], 'a_ijs': [L x [e_cap_l]] | None}``.

The CLI quirk that ``--model gcn`` actually trains a SAGE module
(train_lightning.py:597-607) is NOT reproduced: GCN here is a real GCN.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bliss_gnn_tpu.models.layers import GATv2Conv, GraphConv, SAGEConv
from bliss_gnn_tpu.sampling.block import Block


def _embed_norm(h: jax.Array, mask: jax.Array) -> jax.Array:
    """||h||_2 per src slot (model.py:318-320), masked to 0 on padding."""
    n = jnp.linalg.norm(h.astype(jnp.float32), axis=1)
    return jnp.where(mask, n, 0.0)


class SAGE(nn.Module):
    """n-layer GraphSAGE with ReLU + dropout between layers (model.py:292-333)."""

    n_hidden: int
    n_classes: int
    n_layers: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        blocks: Sequence[Block],
        x: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        h = x.astype(self.dtype)
        embed_norms: List[jax.Array] = []
        for l, block in enumerate(blocks):
            embed_norms.append(_embed_norm(h, block.src_mask))
            out = self.n_hidden if l < self.n_layers - 1 else self.n_classes
            h = SAGEConv(
                out, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layers_{l}",
            )(block, h)
            if l < self.n_layers - 1:
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h, {"embed_norms": embed_norms, "a_ijs": None}


class GCN(nn.Module):
    """n-layer GCN; activation fused into the conv, dropout between layers
    (model.py:386-439)."""

    n_hidden: int
    n_classes: int
    n_layers: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        blocks: Sequence[Block],
        x: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        h = x.astype(self.dtype)
        embed_norms: List[jax.Array] = []
        for l, block in enumerate(blocks):
            embed_norms.append(_embed_norm(h, block.src_mask))
            last = l == self.n_layers - 1
            h = GraphConv(
                self.n_classes if last else self.n_hidden,
                activation=None if last else nn.relu,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layers_{l}",
            )(block, h)
            if not last:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h, {"embed_norms": embed_norms, "a_ijs": None}


class GATv2(nn.Module):
    """Multi-head GATv2 stack (model.py:115-234): heads flattened between
    layers, averaged at the output; per-layer head-mean pre-softmax logits
    exported as a_ij for the bandit (model.py:224-227)."""

    n_hidden: int
    n_classes: int
    n_layers: int
    heads: Tuple[int, ...] = (4, 4, 1)
    feat_drop: float = 0.1
    attn_drop: float = 0.1
    negative_slope: float = 0.2
    residual: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        blocks: Sequence[Block],
        x: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        assert len(self.heads) == self.n_layers
        h = x.astype(self.dtype)
        embed_norms: List[jax.Array] = []
        a_ijs: List[jax.Array] = []
        for l, block in enumerate(blocks):
            embed_norms.append(_embed_norm(h, block.src_mask))
            last = l == self.n_layers - 1
            first = l == 0
            conv = GATv2Conv(
                out_feats=self.n_classes if last else self.n_hidden,
                num_heads=self.heads[l],
                feat_drop=self.feat_drop,
                attn_drop=self.attn_drop,
                negative_slope=self.negative_slope,
                residual=False if first else self.residual,
                activation=None if last else nn.elu,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"gatv2_layers_{l}",
            )
            h, e = conv(block, h, deterministic=deterministic)
            a_ijs.append(jnp.mean(e.astype(jnp.float32), axis=1))
            if not last:
                h = h.reshape(h.shape[0], -1)  # flatten heads
            else:
                h = jnp.mean(h, axis=1)  # average output heads
        return h, {"embed_norms": embed_norms, "a_ijs": a_ijs}


def build_model(
    name: str,
    n_hidden: int,
    n_classes: int,
    n_layers: int,
    dropout: float = 0.1,
    num_in_heads: int = 4,
    num_out_heads: int = 1,
    attn_drop: float = 0.1,
    negative_slope: float = 0.2,
    residual: bool = False,
    dtype=jnp.bfloat16,
    param_dtype=jnp.float32,
) -> nn.Module:
    """Model factory mirroring the CLI dispatch (train_lightning.py:581-618)."""
    name = name.lower()
    if name == "sage":
        return SAGE(n_hidden, n_classes, n_layers, dropout,
                    dtype=dtype, param_dtype=param_dtype)
    if name == "gcn":
        return GCN(n_hidden, n_classes, n_layers, dropout,
                   dtype=dtype, param_dtype=param_dtype)
    if name == "gat":
        heads = tuple([num_in_heads] * (n_layers - 1) + [num_out_heads])
        return GATv2(
            n_hidden, n_classes, n_layers, heads=heads, feat_drop=dropout,
            attn_drop=attn_drop, negative_slope=negative_slope,
            residual=residual, dtype=dtype, param_dtype=param_dtype,
        )
    raise ValueError(f"unknown model '{name}'")
