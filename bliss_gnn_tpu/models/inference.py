"""Full-graph layerwise inference — the final-eval path.

Mirrors the reference's inference methods (SAGE model.py:335-383, GCN
:441-488, GATv2 :236-289): layer-at-a-time over ALL nodes with full
neighborhoods and no sampling weights, producing the [N, n_classes] logits
used for the Final Accuracy/{Train,Validation,Test} micro-F1
(train_lightning.py:686-705).

Where the reference minibatches nodes through a DataLoader per layer, the
TPU path simply runs each layer as one (chunked) full-graph aggregation —
layer-major like the reference, but without the host loop.  The math
mirrors models/layers.py exactly (verified by the sampled-full-block parity
test); weights are consumed straight from the trained flax params pytree.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.graph.structure import DeviceGraph
from bliss_gnn_tpu.ops.fullgraph import (
    full_gat_attention,
    full_spmm_mean,
    full_spmm_sum,
)


def _default_spmm(graph: DeviceGraph):
    """Unit-weight full-graph SpMM: [N, F'] -> [N, F'] f32 sums by dst."""
    def spmm(feat):
        return full_spmm_sum(
            feat, graph.csc_indptr, graph.csc_src, graph.n_nodes,
            graph.n_edges,
        )
    return spmm


def make_pallas_spmm(graph: DeviceGraph, band: int = 16384, wr: int = 256,
                     et: int = 2048):
    """Banded-Pallas-backed unit-weight SpMM closure for inference on TPU
    (ops/spmm_pallas.py); builds the layout once per graph."""
    from bliss_gnn_tpu.ops.spmm_pallas import (
        DeviceBandedLayout,
        build_banded_layout,
        spmm_via_pallas,
    )
    import numpy as np

    layout = build_banded_layout(
        np.asarray(graph.csc_indptr),
        np.asarray(graph.csc_src)[: graph.n_edges],  # trim EDGE_PAD
        None, band=band, wr=wr, et=et,
    )
    dl = DeviceBandedLayout.from_host(layout)

    def spmm(feat):
        return spmm_via_pallas(feat, dl, graph.n_nodes)
    return spmm


def make_pallas_gat(graph: DeviceGraph, band: int = 8192, wr: int = 256,
                    et: int = 2048):
    """Banded-Pallas GATv2 attention closure (ops/gat_pallas.py) — one
    online-softmax sweep instead of the 3-pass XLA streaming path
    (scripts/probe_gat_honest.py).  band=8192 keeps the f32 band block
    within VMEM up to H*O_pad = 1024 feature lanes.

    Routing mirrors spmm_via_pallas: when the flat feature width
    H*round_up(O, 128) fits one packed vreg lane group (<= 256), the bf16
    pair-packed gather variant is measured 1.64x the f32 kernel (186 vs
    113 M edges/s at probe scale — the (1, 128) row-copy fast path);
    wider shapes stay on the base kernel, where packing's 256+-lane copies
    lose the gain (same cliff as the SpMM, scripts/probe_packed.py)."""
    import numpy as np

    from bliss_gnn_tpu.ops.gat_pallas import (
        banded_gat_attention,
        banded_gat_attention_packed,
    )
    from bliss_gnn_tpu.ops.spmm_pallas import (
        DeviceBandedLayout,
        _round_up,
        build_banded_layout,
    )

    layout = build_banded_layout(
        np.asarray(graph.csc_indptr),
        np.asarray(graph.csc_src)[: graph.n_edges],
        None, band=band, wr=wr, et=et,
    )
    dl = DeviceBandedLayout.from_host(layout)

    def gat_attn(feat, attn, negative_slope):
        f = feat.shape[1] * _round_up(feat.shape[2], 128)
        kern = (banded_gat_attention_packed if f <= 256
                else banded_gat_attention)
        return kern(feat, attn, negative_slope, dl, graph.n_nodes)
    return gat_attn


def _sage_layer(p, graph: DeviceGraph, h: jax.Array, dtype,
                spmm=None) -> jax.Array:
    Wn = p["fc_neigh"]["kernel"].astype(dtype)
    Ws = p["fc_self"]["kernel"].astype(dtype)
    b = p["bias"].astype(jnp.float32)
    lin_before = h.shape[1] > Wn.shape[1]
    src_val = (h.astype(dtype) @ Wn) if lin_before else h.astype(dtype)
    spmm = spmm or _default_spmm(graph)
    deg = jnp.maximum(graph.in_degrees().astype(jnp.float32), 1.0)
    agg = spmm(src_val) / deg[:, None]
    h_neigh = agg if lin_before else agg.astype(dtype) @ Wn
    return (h.astype(dtype) @ Ws).astype(jnp.float32) + h_neigh + b


def _gcn_layer(p, graph: DeviceGraph, h: jax.Array, dtype,
               spmm=None) -> jax.Array:
    W = p["weight"]["kernel"].astype(dtype)
    b = p["weight"]["bias"].astype(jnp.float32)
    out_deg = graph.out_degrees().astype(jnp.float32)
    in_deg = graph.in_degrees().astype(jnp.float32)
    spmm = spmm or _default_spmm(graph)
    feat = h.astype(dtype) * jax.lax.rsqrt(jnp.maximum(out_deg, 1.0))[
        :, None
    ].astype(dtype)
    if h.shape[1] > W.shape[1]:
        agg = spmm(feat @ W)
    else:
        agg = spmm(feat).astype(dtype) @ W
        agg = agg.astype(jnp.float32)
    return agg * jax.lax.rsqrt(jnp.maximum(in_deg, 1.0))[:, None] + b


def _gat_layer(
    p, graph: DeviceGraph, h: jax.Array, num_heads: int, negative_slope: float,
    residual: bool, dtype, gat_attn=None,
) -> jax.Array:
    W = p["fc_src"]["kernel"].astype(dtype)
    attn = p["attn"]
    HO = W.shape[1]
    O = HO // num_heads
    feat = (h.astype(dtype) @ W).reshape(-1, num_heads, O)
    if gat_attn is not None:
        rst = gat_attn(feat, attn, negative_slope)
    else:
        rst = full_gat_attention(
            feat, attn, negative_slope, graph.csc_indptr, graph.csc_src,
            graph.n_nodes, graph.n_edges,
        )
    if residual:
        if "res_fc" in p:
            res = (h.astype(dtype) @ p["res_fc"]["kernel"].astype(dtype))
            res = res.reshape(-1, num_heads, O).astype(jnp.float32)
        else:
            res = h.reshape(-1, num_heads, O).astype(jnp.float32)
        rst = rst + res
    return rst


def layerwise_inference(
    model_name: str,
    params,
    graph: DeviceGraph,
    n_layers: int,
    heads: Optional[tuple] = None,
    negative_slope: float = 0.2,
    residual: bool = False,
    dtype=jnp.bfloat16,
    spmm=None,
    gat_attn=None,
) -> jax.Array:
    """Run every layer over the full graph; returns [N, n_classes] logits
    (f32).  Dropout off (eval), activations between layers per model
    (ReLU for SAGE, ReLU-in-conv for GCN, ELU + head flatten for GATv2).

    ``spmm``: optional unit-weight SpMM backend (e.g. make_pallas_spmm) for
    SAGE/GCN; ``gat_attn``: optional attention backend for GATv2 (e.g.
    make_pallas_gat), else the streaming-softmax XLA path."""
    p = params["params"]
    h = graph.ndata["features"].astype(jnp.float32)
    name = model_name.lower()
    for l in range(n_layers):
        last = l == n_layers - 1
        if name == "sage":
            h = _sage_layer(p[f"layers_{l}"], graph, h, dtype, spmm=spmm)
            if not last:
                h = jax.nn.relu(h)
        elif name == "gcn":
            h = _gcn_layer(p[f"layers_{l}"], graph, h, dtype, spmm=spmm)
            if not last:
                h = jax.nn.relu(h)
        elif name == "gat":
            first = l == 0
            rst = _gat_layer(
                p[f"gatv2_layers_{l}"], graph, h, heads[l], negative_slope,
                residual and not first, dtype, gat_attn=gat_attn,
            )
            if not last:
                rst = jax.nn.elu(rst)
                h = rst.reshape(rst.shape[0], -1)
            else:
                h = jnp.mean(rst, axis=1)
        else:
            raise ValueError(name)
    return h


def layerwise_inference_sharded(
    model_name: str,
    params,
    host_graph,
    mesh,
    n_layers: int,
    dtype=jnp.bfloat16,
    axis: str = "dp",
    features=None,
    heads: Optional[tuple] = None,
    negative_slope: float = 0.2,
    residual: bool = False,
) -> jax.Array:
    """Full-graph layerwise inference with activations NODE-SHARDED over the
    mesh — the multi-chip analog of the reference's node-minibatched
    inference (model.py:351-362 bounds memory with a DataLoader batch of
    128; here per-device memory is O(N/S * F + E/S) and the aggregation is
    the ring SpMM of parallel/edgeshard.py, S-1 ppermute rotations).

    GATv2 rides the same ring with a shard-local online edge softmax
    (edge softmax is per dst and shards are contiguous dst ranges —
    parallel/edgeshard.py:make_ring_gat); only src features rotate.
    Dense matmuls run on the row-sharded activations via GSPMD (no
    collectives); only the aggregation communicates.  Returns
    [N, n_classes] f32 logits (node-sharded; np.asarray gathers them)."""
    import numpy as np
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from bliss_gnn_tpu.parallel.edgeshard import (
        RingEdgeShards,
        make_ring_gat,
        make_ring_spmm,
    )

    name = model_name.lower()
    assert name in ("sage", "gcn", "gat"), name
    S = mesh.shape[axis]
    shards = RingEdgeShards.build(host_graph, S)
    node_per = shards.node_per_shard
    n_nodes = host_graph.n_nodes
    shard_rows = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    feats = np.asarray(
        features if features is not None
        else host_graph.ndata["features"]
    )
    # balanced-range shard layout: row s*node_per + i = node lo[s] + i
    h = jax.device_put(
        jnp.asarray(shards.shard_rows(feats.astype(np.float32))),
        shard_rows,
    )
    e_src = jax.device_put(shards.e_src_rel, shard_rows)
    e_dst = jax.device_put(shards.e_dst_rel, shard_rows)
    e_w = jax.device_put(shards.e_w, shard_rows)
    in_deg = jax.device_put(jnp.asarray(shards.shard_rows(
        np.asarray(host_graph.in_degrees(), np.float32)
    )), shard_rows)
    out_deg = jax.device_put(jnp.asarray(shards.shard_rows(
        np.asarray(host_graph.out_degrees(), np.float32)
    )), shard_rows)
    spmm_fn = make_ring_spmm(mesh, (node_per, S), axis)

    def spmm(feat):
        return spmm_fn(e_src, e_dst, e_w, feat.astype(jnp.float32))

    p = jax.device_put(params["params"], repl)
    if name == "gat":
        assert heads is not None, "GAT sharded inference needs per-layer heads"
        for l in range(n_layers):
            last = l == n_layers - 1
            first = l == 0
            lp = p[f"gatv2_layers_{l}"]
            W = lp["fc_src"]["kernel"].astype(dtype)
            attn = lp["attn"]
            HO = W.shape[1]
            O = HO // heads[l]
            feat = (h.astype(dtype) @ W).reshape(-1, heads[l], O)
            gat_fn = make_ring_gat(
                mesh, (node_per, S), heads[l], O, negative_slope, axis
            )
            rst = gat_fn(e_src, e_dst, e_w, feat.astype(jnp.float32), attn)
            if residual and not first:
                if "res_fc" in lp:
                    res = (h.astype(dtype) @ lp["res_fc"]["kernel"].astype(dtype))
                    res = res.reshape(-1, heads[l], O).astype(jnp.float32)
                else:
                    res = h.reshape(-1, heads[l], O).astype(jnp.float32)
                rst = rst + res
            if not last:
                rst = jax.nn.elu(rst)
                h = rst.reshape(rst.shape[0], -1)
            else:
                h = jnp.mean(rst, axis=1)
        return shards.unshard_rows(h)[:n_nodes]
    for l in range(n_layers):
        last = l == n_layers - 1
        lp = p[f"layers_{l}"]
        if name == "sage":
            Wn = lp["fc_neigh"]["kernel"].astype(dtype)
            Ws = lp["fc_self"]["kernel"].astype(dtype)
            b = lp["bias"].astype(jnp.float32)
            lin_before = h.shape[1] > Wn.shape[1]
            src_val = (h.astype(dtype) @ Wn) if lin_before else h.astype(dtype)
            agg = spmm(src_val) / jnp.maximum(in_deg, 1.0)[:, None]
            h_neigh = agg if lin_before else agg.astype(dtype) @ Wn
            h = (h.astype(dtype) @ Ws).astype(jnp.float32) + h_neigh + b
        else:  # gcn
            W = lp["weight"]["kernel"].astype(dtype)
            b = lp["weight"]["bias"].astype(jnp.float32)
            feat = h.astype(dtype) * jax.lax.rsqrt(
                jnp.maximum(out_deg, 1.0)
            )[:, None].astype(dtype)
            if h.shape[1] > W.shape[1]:
                agg = spmm(feat @ W)
            else:
                agg = spmm(feat).astype(dtype) @ W
                agg = agg.astype(jnp.float32)
            h = agg * jax.lax.rsqrt(jnp.maximum(in_deg, 1.0))[:, None] + b
        if not last:
            h = jax.nn.relu(h)
    return shards.unshard_rows(h)[:n_nodes]


def layerwise_inference_uva(
    model_name: str,
    params,
    host_graph,
    n_layers: int,
    heads: Optional[tuple] = None,
    negative_slope: float = 0.2,
    residual: bool = False,
    dtype=jnp.bfloat16,
    node_batch: int = 1 << 15,
    features=None,
) -> "np.ndarray":
    """Bounded-device-memory layerwise inference with HOST-resident
    activations — the single-chip UVA final eval (the reference streams
    node minibatches of 128 through a full-neighbor DataLoader with
    use_uva, model.py:351-362 / train_lightning.py:688-694; here the
    chunk is ``node_batch`` dst nodes).

    Per layer, per dst chunk: slice the chunk's CSC in-edges on host,
    fetch exactly the referenced src activation rows (np.unique working
    set), aggregate + apply the layer on device, write the chunk's output
    activations back to host.  Device memory is O(node_batch + working
    set); the full [N, F] never touches HBM.  Shapes are padded to
    per-layer maxima so every chunk reuses one compiled program.
    Returns [N, n_classes] f32 logits as a host array."""
    import numpy as np

    name = model_name.lower()
    p = params["params"]
    indptr = np.asarray(host_graph.csc_indptr)
    csc_src = np.asarray(host_graph.csc_src)[: host_graph.n_edges]
    n = host_graph.n_nodes
    in_deg = np.maximum(np.diff(indptr), 1).astype(np.float32)
    out_deg = np.maximum(
        np.asarray(host_graph.out_degrees()), 1
    ).astype(np.float32)
    h = features if features is not None else host_graph.ndata["features"]
    chunks = [(c0, min(n, c0 + node_batch)) for c0 in
              range(0, n, node_batch)]
    # static pad sizes shared by every chunk of a layer
    e_max = int(max(indptr[c1] - indptr[c0] for c0, c1 in chunks))
    u_max = 0
    uniq_cache = []
    for c0, c1 in chunks:
        src = csc_src[indptr[c0]:indptr[c1]]
        uniq, inv = np.unique(src, return_inverse=True)
        uniq_cache.append((uniq, inv.astype(np.int32)))
        u_max = max(u_max, len(uniq))
    u_max = max(u_max, 1)

    @partial(jax.jit, static_argnames=("kind", "nh"))
    def chunk_fn(lp, x_u, e_src, e_dst, e_mask, idg, odg_u, h_self,
                 kind: str, nh: int):
        n_dst = h_self.shape[0]
        if kind == "sage":
            Wn = lp["fc_neigh"]["kernel"].astype(dtype)
            Ws = lp["fc_self"]["kernel"].astype(dtype)
            b = lp["bias"].astype(jnp.float32)
            lin_before = x_u.shape[1] > Wn.shape[1]
            src_val = (x_u.astype(dtype) @ Wn) if lin_before \
                else x_u.astype(dtype)
            msg = jnp.take(src_val, e_src, axis=0)
            msg = jnp.where(e_mask[:, None], msg, 0)
            agg = jax.ops.segment_sum(
                msg.astype(jnp.float32), e_dst, num_segments=n_dst
            ) / idg[:, None]
            h_neigh = agg if lin_before else agg.astype(dtype) @ Wn
            return (h_self.astype(dtype) @ Ws).astype(jnp.float32) \
                + h_neigh + b
        if kind == "gcn":
            W = lp["weight"]["kernel"].astype(dtype)
            b = lp["weight"]["bias"].astype(jnp.float32)
            feat = x_u.astype(dtype) * jax.lax.rsqrt(odg_u)[:, None].astype(dtype)
            if x_u.shape[1] > W.shape[1]:
                feat = feat @ W
            msg = jnp.take(feat, e_src, axis=0)
            msg = jnp.where(e_mask[:, None], msg, 0)
            agg = jax.ops.segment_sum(
                msg.astype(jnp.float32), e_dst, num_segments=n_dst
            )
            if x_u.shape[1] <= W.shape[1]:
                agg = (agg.astype(dtype) @ W).astype(jnp.float32)
            return agg * jax.lax.rsqrt(idg)[:, None] + b
        # gat: chunk-local edge softmax (every in-edge of a dst is in its
        # chunk by construction)
        W = lp["fc_src"]["kernel"].astype(dtype)
        attn = lp["attn"].reshape(nh, -1).astype(jnp.float32)
        O = W.shape[1] // nh
        fs = (x_u.astype(dtype) @ W).reshape(-1, nh, O).astype(jnp.float32)
        fd = (h_self.astype(dtype) @ W).reshape(-1, nh, O).astype(jnp.float32)
        z = jnp.take(fs, e_src, axis=0) + jnp.take(fd, e_dst, axis=0)
        z = jnp.where(z >= 0, z, negative_slope * z)
        e = jnp.einsum("ehc,hc->eh", z, attn)
        e = jnp.where(e_mask[:, None], e, -1e30)
        m = jax.ops.segment_max(e, e_dst, num_segments=n_dst)
        w_e = jnp.where(
            e_mask[:, None], jnp.exp(e - jnp.take(m, e_dst, axis=0)), 0.0
        )
        num = jax.ops.segment_sum(
            jnp.take(fs, e_src, axis=0) * w_e[:, :, None], e_dst,
            num_segments=n_dst,
        )
        den = jax.ops.segment_sum(w_e, e_dst, num_segments=n_dst)
        rst = num / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)[:, :, None]
        return rst  # [n_dst, H, O]

    for l in range(n_layers):
        last = l == n_layers - 1
        if name == "gat":
            lp = p[f"gatv2_layers_{l}"]
            nh = heads[l]
            O = lp["fc_src"]["kernel"].shape[1] // nh
            out_w = O * nh if not last else O
        else:
            lp = p[f"layers_{l}"]
            key = "fc_neigh" if name == "sage" else "weight"
            out_w = lp[key]["kernel"].shape[1]
            nh = 0
        out = np.zeros((n, out_w), np.float32)
        for (c0, c1), (uniq, inv) in zip(chunks, uniq_cache):
            e_cnt = len(inv)
            dst = np.repeat(
                np.arange(c1 - c0, dtype=np.int32),
                np.diff(indptr[c0:c1 + 1]).astype(np.int64),
            )
            x_u = np.zeros((u_max, h.shape[1]), np.float32)
            x_u[: len(uniq)] = h[uniq]
            e_src = np.zeros(e_max, np.int32)
            e_src[:e_cnt] = inv
            e_dst = np.zeros(e_max, np.int32)
            e_dst[:e_cnt] = dst
            e_mask = np.zeros(e_max, bool)
            e_mask[:e_cnt] = True
            res = chunk_fn(
                lp, jnp.asarray(x_u), jnp.asarray(e_src),
                jnp.asarray(e_dst), jnp.asarray(e_mask),
                jnp.asarray(in_deg[c0:c1]),
                jnp.asarray(np.pad(out_deg[uniq],
                                   (0, u_max - len(uniq)),
                                   constant_values=1.0)),
                jnp.asarray(np.asarray(h[c0:c1], np.float32)),
                kind=name, nh=nh,
            )
            res = np.asarray(res)
            if name == "gat":
                first = l == 0
                if residual and not first:
                    lp_l = p[f"gatv2_layers_{l}"]
                    h_chunk = np.asarray(h[c0:c1], np.float32)
                    if "res_fc" in lp_l:
                        rker = np.asarray(lp_l["res_fc"]["kernel"],
                                          np.float32)
                        res = res + (h_chunk @ rker).reshape(res.shape)
                    else:
                        res = res + h_chunk.reshape(res.shape)
                if not last:
                    res = np.where(res > 0, res, np.expm1(res))  # elu
                    res = res.reshape(res.shape[0], -1)
                else:
                    res = res.mean(axis=1)
            elif not last:
                res = np.maximum(res, 0.0)  # relu
            out[c0:c1] = res
        h = out
    return h


def make_hybrid_spmm(graph: DeviceGraph, dense_t: int = 300,
                     cache_path: str | None = None,
                     band: int = 16384, wr: int = 256, sub: int = 256,
                     et_d: int = 512):
    """Hybrid dense-block + gather SpMM closure (ops/spmm_pallas.py,
    degree-sorted node space handled internally) — measured 1.27x the base
    banded kernel at Reddit scale (scripts/probe_hybrid.py).  The one-time
    host layout build is O(E log E); pass ``cache_path`` to persist it."""
    import os

    import numpy as np

    from bliss_gnn_tpu.ops.spmm_pallas import (
        DeviceHybridLayout,
        build_hybrid_layout,
        load_hybrid_layout,
        save_hybrid_layout,
        spmm_via_pallas_hybrid,
    )

    want = dict(n_nodes=graph.n_nodes, n_edges=graph.n_edges,
                dense_t=dense_t, band=band, wr=wr, sub=sub, et_d=et_d)
    if cache_path and os.path.exists(cache_path):
        layout = load_hybrid_layout(cache_path)
        lm = layout.meta
        # validate the FULL tiling signature, not just the graph shape — a
        # cache built with different band/wr/sub/et_d would load silently
        # and quietly ignore the requested tiling (advisor finding)
        got = {k: getattr(lm, k) for k in want}
        if got != want:
            raise ValueError(
                f"hybrid layout cache {cache_path} was built for {got}, "
                f"not the requested {want} — delete it or pass a "
                f"different path"
            )
    else:
        layout = build_hybrid_layout(
            np.asarray(graph.csc_indptr),
            np.asarray(graph.csc_src)[: graph.n_edges],
            None, band=band, wr=wr, sub=sub, et_d=et_d, dense_t=dense_t,
        )
        if cache_path:
            save_hybrid_layout(cache_path, layout)
    dl = DeviceHybridLayout.from_host(layout)

    def spmm(feat):
        return spmm_via_pallas_hybrid(feat, dl, graph.n_nodes)
    return spmm


def dual_spmm_hbm_bytes(n_nodes: int, n_edges: int, n_feats: int) -> int:
    """Upper estimate of the extra HBM the dual-routing backend needs:
    hybrid layout (~12 B/edge-slot: int32 dst_rel + int32 src_rel + f32 w,
    ~1.2x slot padding) + banded gather layout (~9 B/slot) + the banded
    f32 feature / accumulator copies both kernels materialize
    (2 paths x (n_bands*band + n_wins*wr) x f_pad x 4).  Measured ~2.3 GB
    at Reddit scale (233k nodes / 115M edges / F=602), which this formula
    puts at ~2.9 GB — deliberately conservative."""
    f_pad = _round_up_128(max(n_feats, 256))
    layouts = int(1.2 * n_edges * (12 + 9))
    feat_copies = 2 * 2 * n_nodes * f_pad * 4
    return layouts + feat_copies


def _round_up_128(x: int) -> int:
    return ((x + 127) // 128) * 128


def free_device_hbm() -> int:
    """Free bytes on the default device, best effort.  When memory_stats is
    unavailable the answer must fail TOWARD the non-hybrid backend (report
    0 free): a too-generous guess routes final eval into the dual-layout
    path and OOMs it, while 0 merely falls back to the plain banded
    kernel."""
    try:
        st = jax.devices()[0].memory_stats()
        return int(st["bytes_limit"]) - int(st["bytes_in_use"])
    except Exception:
        return 0


def make_dual_spmm(graph: DeviceGraph, dense_t: int = 300,
                   cache_path: str | None = None):
    """Best-of-both full-graph SpMM: the degree-sorted hybrid kernel for
    wide features (F > 256 — 173 vs 137 M edges/s at Reddit F=602) and the
    bf16 pair-packed banded kernel for hidden layers (F <= 256 — 367 vs
    172 M edges/s; scripts/probe_packed_honest.py).  Builds both layouts
    once per graph (~2.3 GB HBM at Reddit scale)."""
    hybrid = make_hybrid_spmm(graph, dense_t=dense_t, cache_path=cache_path)
    banded = make_pallas_spmm(graph)

    def spmm(feat):
        if feat.shape[1] > 256:
            return hybrid(feat)
        return banded(feat)

    return spmm
