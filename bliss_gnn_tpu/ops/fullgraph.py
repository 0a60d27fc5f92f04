"""Memory-bounded full-graph sparse ops: chunked SpMM and edge softmax.

Full-graph layerwise inference (model.py:335-383) aggregates over ALL edges.
At Reddit scale (~115M edges) materializing per-edge messages is ~60GB — so
these ops stream the canonical (dst-sorted) edge list in fixed-size chunks
under ``lax.scan``, accumulating into an [N, F] f32 buffer.  Because
canonical edge order groups a dst's edges contiguously, per-chunk
segment-sums are sorted-id scatters (fast path) and a dst's edges span at
most two chunks' partial sums, which the accumulator resolves exactly.

The Pallas SpMM kernel (ops/spmm_pallas.py) replaces the scan path on TPU
for the hot benchmark; these remain the reference implementation and the
CPU/test path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_CHUNK = 1 << 20  # 1M edges per chunk


def _pad_edges(csc_src: jax.Array, n_edges: int, chunk: int):
    n_chunks = max(1, -(-n_edges // chunk))
    pad = n_chunks * chunk - n_edges
    src = jnp.pad(csc_src, (0, pad))
    return src, n_chunks, pad


def _chunk_dst(csc_indptr: jax.Array, start: jax.Array, chunk: int, n_edges: int):
    """dst node of each edge in [start, start+chunk) via binary search over
    indptr; padded slots masked."""
    idx = start + jnp.arange(chunk, dtype=jnp.int32)
    mask = idx < n_edges
    dst = jnp.searchsorted(
        csc_indptr, jnp.where(mask, idx, 0).astype(csc_indptr.dtype),
        side="right",
    ).astype(jnp.int32) - 1
    return jnp.where(mask, dst, 0), mask


def full_spmm_sum(
    x: jax.Array,
    csc_indptr: jax.Array,
    csc_src: jax.Array,
    n_nodes: int,
    n_edges: int,
    edge_vals: Optional[jax.Array] = None,
    chunk: int = DEFAULT_CHUNK,
) -> jax.Array:
    """sum_{e into i} w_e * x[src(e)] over the whole graph, chunked.

    x: [N, F]; edge_vals: [E] or None (unit weights); returns [N, F] f32.
    """
    chunk = min(chunk, max(128, n_edges))
    src_p, n_chunks, _ = _pad_edges(csc_src, n_edges, chunk)
    ev_p = None
    if edge_vals is not None:
        ev_p = jnp.pad(edge_vals, (0, src_p.shape[0] - n_edges))

    def body(acc, c):
        start = c * chunk
        srcs = jax.lax.dynamic_slice(src_p, (c * chunk,), (chunk,))
        dsts, mask = _chunk_dst(csc_indptr, start, chunk, n_edges)
        msg = jnp.take(x, srcs, axis=0).astype(jnp.float32)
        if ev_p is not None:
            w = jax.lax.dynamic_slice(ev_p, (c * chunk,), (chunk,))
            msg = msg * w.astype(jnp.float32)[:, None]
        msg = jnp.where(mask[:, None], msg, 0.0)
        acc = acc + jax.ops.segment_sum(
            msg, dsts, num_segments=n_nodes, indices_are_sorted=True
        )
        return acc, None

    acc = jnp.zeros((n_nodes, x.shape[1]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, jnp.arange(n_chunks, dtype=jnp.int32))
    return acc


def full_spmm_mean(
    x: jax.Array,
    csc_indptr: jax.Array,
    csc_src: jax.Array,
    n_nodes: int,
    n_edges: int,
    chunk: int = DEFAULT_CHUNK,
) -> jax.Array:
    """Mean over in-neighbors (zero for isolated nodes — DGL fn.mean)."""
    s = full_spmm_sum(x, csc_indptr, csc_src, n_nodes, n_edges, chunk=chunk)
    deg = (csc_indptr[1:] - csc_indptr[:-1]).astype(jnp.float32)
    return s / jnp.maximum(deg, 1.0)[:, None]


def full_gat_attention(
    feat: jax.Array,  # [N, H, O] projected features (shared src/dst weights)
    attn: jax.Array,  # [1, H, O]
    negative_slope: float,
    csc_indptr: jax.Array,
    csc_src: jax.Array,
    n_nodes: int,
    n_edges: int,
    chunk: int = DEFAULT_CHUNK // 4,
) -> jax.Array:
    """Full-graph GATv2 attention aggregation: sum_e softmax_dst(e_logit) *
    feat_src, streamed in three passes (max, exp-sum, weighted aggregate).

    Logits are recomputed per pass instead of stored (E x H floats would
    dwarf the activations; recompute is one gather + FMA per pass).
    """
    H, O = feat.shape[1], feat.shape[2]
    chunk = min(chunk, max(128, n_edges))
    src_p, n_chunks, _ = _pad_edges(csc_src, n_edges, chunk)
    attn_f = attn.astype(jnp.float32)

    def logits_for(c):
        start = c * chunk
        srcs = jax.lax.dynamic_slice(src_p, (c * chunk,), (chunk,))
        dsts, mask = _chunk_dst(csc_indptr, start, chunk, n_edges)
        el = jnp.take(feat, srcs, axis=0).astype(jnp.float32)
        er = jnp.take(feat, dsts, axis=0).astype(jnp.float32)
        z = el + er
        z = jnp.where(z >= 0, z, negative_slope * z)
        e = jnp.sum(z * attn_f, axis=-1)  # [chunk, H]
        return e, el, srcs, dsts, mask

    def max_body(acc, c):
        e, _, _, dsts, mask = logits_for(c)
        e = jnp.where(mask[:, None], e, -jnp.inf)
        m = jax.ops.segment_max(
            e, dsts, num_segments=n_nodes, indices_are_sorted=True
        )
        return jnp.maximum(acc, m), None

    seg_max = jnp.full((n_nodes, H), -jnp.inf, jnp.float32)
    seg_max, _ = jax.lax.scan(
        max_body, seg_max, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)

    def sum_body(acc, c):
        e, _, _, dsts, mask = logits_for(c)
        ex = jnp.exp(e - jnp.take(seg_max, dsts, axis=0))
        ex = jnp.where(mask[:, None], ex, 0.0)
        acc = acc + jax.ops.segment_sum(
            ex, dsts, num_segments=n_nodes, indices_are_sorted=True
        )
        return acc, None

    denom = jnp.zeros((n_nodes, H), jnp.float32)
    denom, _ = jax.lax.scan(
        sum_body, denom, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    denom = jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)

    def agg_body(acc, c):
        e, el, srcs, dsts, mask = logits_for(c)
        a = jnp.exp(e - jnp.take(seg_max, dsts, axis=0)) / jnp.take(
            denom, dsts, axis=0
        )
        a = jnp.where(mask[:, None], a, 0.0)
        msg = el * a[..., None]
        acc = acc + jax.ops.segment_sum(
            msg, dsts, num_segments=n_nodes, indices_are_sorted=True
        )
        return acc, None

    out = jnp.zeros((n_nodes, H, O), jnp.float32)
    out, _ = jax.lax.scan(
        agg_body, out, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return out
