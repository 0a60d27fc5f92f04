"""Model-layer tests: aggregation parity vs dense references on full blocks,
aux side-channel correctness, shape/mask discipline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bliss_gnn_tpu.models.gnn import GATv2, GCN, SAGE, build_model
from bliss_gnn_tpu.models.layers import GATv2Conv, GraphConv, SAGEConv
from bliss_gnn_tpu.sampling.block import Block, CapacityPlan
from bliss_gnn_tpu.sampling.samplers import SamplerConfig, sample_blocks


def _full_block(g, batch):
    """Full-neighbor block over the first `batch` nodes via the full sampler."""
    dg = g.to_device()
    cfg = SamplerConfig(kind="full", fanouts=(0,))
    plan = CapacityPlan.build(batch, (0,), g.n_nodes, g.n_edges, kind="full",
                              frontier_slack=16.0)
    seeds = jnp.arange(batch, dtype=jnp.int32)
    blocks, _ = sample_blocks(dg, cfg, plan, jax.random.PRNGKey(0), seeds,
                              jnp.ones(batch, bool))
    return blocks[0], dg


def test_sage_conv_matches_dense_mean(small_synth):
    """SAGEConv on a full block == W_self h + W_neigh (mean over in-nbrs)."""
    g, _, _ = small_synth
    batch = 8
    b, dg = _full_block(g, batch)
    f_in, f_out = 16, 12
    x = np.asarray(dg.ndata["features"], np.float32)
    h_src = jnp.take(jnp.asarray(x), b.src_gids, axis=0)
    conv = SAGEConv(f_out, dtype=jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), b, h_src)
    out = np.asarray(conv.apply(params, b, h_src), np.float32)[:batch]

    Wn = np.asarray(params["params"]["fc_neigh"]["kernel"], np.float32)
    Ws = np.asarray(params["params"]["fc_self"]["kernel"], np.float32)
    bias = np.asarray(params["params"]["bias"], np.float32)
    gs, gd = g.edges()
    ref = np.zeros((batch, f_out), np.float32)
    for i in range(batch):
        nbrs = gs[gd == i]
        mean = x[nbrs].mean(0) if len(nbrs) else np.zeros(x.shape[1])
        ref[i] = x[i] @ Ws + mean @ Wn + bias
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_graph_conv_matches_dense_norm(small_synth):
    """GraphConv norm='both' on a full block == D^-1/2 A D^-1/2 X W + b,
    degrees from the block's kept edges, clamped at 1."""
    g, _, _ = small_synth
    batch = 8
    b, dg = _full_block(g, batch)
    x = np.asarray(dg.ndata["features"], np.float32)
    h_src = jnp.take(jnp.asarray(x), b.src_gids, axis=0)
    conv = GraphConv(12, dtype=jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), b, h_src)
    out = np.asarray(conv.apply(params, b, h_src), np.float32)[:batch]

    W = np.asarray(params["params"]["weight"]["kernel"], np.float32)
    bias = np.asarray(params["params"]["weight"]["bias"], np.float32)
    # degrees on the block: out-deg over kept edges (src side), in-deg dst side
    e_mask = np.asarray(b.e_mask)
    e_src = np.asarray(b.e_src)[e_mask]
    e_dst = np.asarray(b.e_dst)[e_mask]
    w_e = np.asarray(b.e_weight)[e_mask]
    out_deg = np.bincount(e_src, minlength=b.n_src_cap)
    in_deg = np.bincount(e_dst, minlength=b.n_dst_cap)
    src_gids = np.asarray(b.src_gids)
    feat = x[src_gids] / np.sqrt(np.maximum(out_deg, 1))[:, None]
    # in > out: project before aggregation
    feat = feat @ W
    agg = np.zeros((b.n_dst_cap, feat.shape[1]), np.float32)
    for k in range(len(e_src)):
        agg[e_dst[k]] += w_e[k] * feat[e_src[k]]
    ref = agg / np.sqrt(np.maximum(in_deg, 1))[:, None] + bias
    np.testing.assert_allclose(out, ref[:batch], rtol=2e-4, atol=2e-4)


def test_gatv2_conv_attention_properties(small_synth):
    g, _, _ = small_synth
    batch = 8
    b, dg = _full_block(g, batch)
    x = jnp.take(dg.ndata["features"].astype(jnp.float32), b.src_gids, axis=0)
    conv = GATv2Conv(out_feats=6, num_heads=3, dtype=jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), b, x)
    rst, e = conv.apply(params, b, x)
    assert rst.shape == (b.n_dst_cap, 3, 6)
    assert e.shape == (b.e_cap, 3)
    # pre-softmax logits: recompute softmax and check aggregation parity
    from bliss_gnn_tpu.ops.segment import edge_softmax, masked_segment_sum
    W = params["params"]["fc_src"]["kernel"]
    feat = (x @ W).reshape(-1, 3, 6)
    a = edge_softmax(e, b.e_dst, b.n_dst_cap, b.e_mask)
    msg = jnp.take(feat, b.e_src, axis=0) * a[..., None]
    ref = masked_segment_sum(msg, b.e_dst, b.n_dst_cap, b.e_mask)
    np.testing.assert_allclose(np.asarray(rst), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["sage", "gcn", "gat"])
def test_models_forward_shapes_and_aux(small_synth, name):
    g, nc, _ = small_synth
    dg = g.to_device()
    cfg = SamplerConfig(kind="poisson-bandit", fanouts=(16, 8), model=name)
    plan = CapacityPlan.build(4, (16, 8), g.n_nodes, g.n_edges, kind=cfg.kind)
    from bliss_gnn_tpu.sampling.samplers import init_exp3_weights
    exp3 = init_exp3_weights(2, g.n_edges)
    seeds = jnp.arange(4, dtype=jnp.int32)
    blocks, _ = sample_blocks(dg, cfg, plan, jax.random.PRNGKey(0), seeds,
                              jnp.ones(4, bool), exp3)
    model = build_model(name, 32, nc, 2)
    x = jnp.take(dg.ndata["features"], blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)
    logits, aux = model.apply(params, blocks, x)
    assert logits.shape == (blocks[-1].n_dst_cap, nc)
    assert not bool(jnp.any(jnp.isnan(logits.astype(jnp.float32))))
    assert len(aux["embed_norms"]) == 2
    for l, b in enumerate(blocks):
        en = aux["embed_norms"][l]
        assert en.shape == (b.n_src_cap,)
        # masked slots have zero norm
        assert np.all(np.asarray(en)[~np.asarray(b.src_mask)] == 0)
    if name == "gat":
        assert len(aux["a_ijs"]) == 2
        assert aux["a_ijs"][0].shape == (blocks[0].e_cap,)
    else:
        assert aux["a_ijs"] is None


def test_embed_norm_values(small_synth):
    g, nc, _ = small_synth
    dg = g.to_device()
    cfg = SamplerConfig(kind="ladies", fanouts=(16,))
    plan = CapacityPlan.build(4, (16,), g.n_nodes, g.n_edges, kind="ladies")
    seeds = jnp.arange(4, dtype=jnp.int32)
    blocks, _ = sample_blocks(dg, cfg, plan, jax.random.PRNGKey(0), seeds,
                              jnp.ones(4, bool))
    model = SAGE(8, nc, 1, dtype=jnp.float32)
    x = jnp.take(dg.ndata["features"].astype(jnp.float32), blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)
    _, aux = model.apply(params, blocks, x)
    en = np.asarray(aux["embed_norms"][0])
    ref = np.linalg.norm(np.asarray(x), axis=1)
    m = np.asarray(blocks[0].src_mask)
    np.testing.assert_allclose(en[m], ref[m], rtol=1e-5)


def test_dropout_determinism_flag(small_synth):
    g, nc, _ = small_synth
    dg = g.to_device()
    cfg = SamplerConfig(kind="ladies", fanouts=(16, 8))
    plan = CapacityPlan.build(4, (16, 8), g.n_nodes, g.n_edges, kind="ladies")
    seeds = jnp.arange(4, dtype=jnp.int32)
    blocks, _ = sample_blocks(dg, cfg, plan, jax.random.PRNGKey(0), seeds,
                              jnp.ones(4, bool))
    model = SAGE(8, nc, 2, dropout=0.5)
    x = jnp.take(dg.ndata["features"], blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)
    l1, _ = model.apply(params, blocks, x, deterministic=True)
    l2, _ = model.apply(params, blocks, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    l3, _ = model.apply(params, blocks, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.array_equal(np.asarray(l1), np.asarray(l3))
