"""Full-graph layerwise inference == sampled full-neighbor forward.

The reference's accuracy-parity harness (SURVEY.md §3.4): per-layer
activations over the whole graph with no sampling randomness.  Here the
full-sampler block over all nodes and the chunked layerwise inference must
agree exactly (both eval-mode, same params).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bliss_gnn_tpu.models.gnn import build_model
from bliss_gnn_tpu.models.inference import layerwise_inference
from bliss_gnn_tpu.ops.fullgraph import full_spmm_mean, full_spmm_sum
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import SamplerConfig, sample_blocks


def _all_nodes_blocks(g, n_layers):
    dg = g.to_device()
    fan = tuple([0] * n_layers)
    cfg = SamplerConfig(kind="full", fanouts=fan)
    plan = CapacityPlan.build(g.n_nodes, fan, g.n_nodes, g.n_edges,
                              kind="full", frontier_slack=20.0)
    seeds = jnp.arange(g.n_nodes, dtype=jnp.int32)
    blocks, _ = sample_blocks(dg, cfg, plan, jax.random.PRNGKey(0), seeds,
                              jnp.ones(g.n_nodes, bool))
    return blocks, dg


def test_full_spmm_matches_segment_sum(small_synth):
    g, _, _ = small_synth
    dg = g.to_device()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(g.n_nodes, 9)),
                    jnp.float32)
    # tiny chunk to force multi-chunk accumulation
    out = full_spmm_sum(x, dg.csc_indptr, dg.csc_src, g.n_nodes, g.n_edges,
                        chunk=128)
    gs, gd = g.edges()
    ref = np.zeros((g.n_nodes, 9), np.float32)
    for e in range(g.n_edges):
        ref[gd[e]] += np.asarray(x)[gs[e]]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    m = full_spmm_mean(x, dg.csc_indptr, dg.csc_src, g.n_nodes, g.n_edges,
                       chunk=128)
    deg = np.maximum(g.in_degrees(), 1)
    np.testing.assert_allclose(np.asarray(m), ref / deg[:, None],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name,n_layers", [
    ("sage", 2), ("gcn", 2), ("gat", 2), ("sage", 1),
])
def test_layerwise_inference_matches_block_forward(small_synth, name, n_layers):
    g, nc, _ = small_synth
    blocks, dg = _all_nodes_blocks(g, n_layers)
    model = build_model(name, 12, nc, n_layers, dropout=0.0,
                        dtype=jnp.float32)
    x = jnp.take(dg.ndata["features"].astype(jnp.float32),
                 blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)
    logits_block, _ = model.apply(params, blocks, x, deterministic=True)
    heads = (4, 1)[:n_layers] if n_layers > 1 else (1,)
    if name == "gat":
        heads = tuple([4] * (n_layers - 1) + [1])
    logits_full = layerwise_inference(
        name, params, dg, n_layers, heads=heads, dtype=jnp.float32,
    )
    lb = np.asarray(logits_block, np.float32)[: g.n_nodes]
    lf = np.asarray(logits_full, np.float32)
    np.testing.assert_allclose(lb, lf, rtol=5e-3, atol=5e-3)


def test_layerwise_inference_pallas_backend_interpret(small_synth):
    """SAGE inference with the banded-Pallas SpMM backend (interpret mode)
    matches the XLA chunked backend."""
    import functools
    from bliss_gnn_tpu.models.inference import make_pallas_spmm
    from bliss_gnn_tpu.ops import spmm_pallas

    g, nc, _ = small_synth
    dg = g.to_device()
    blocks, dg2 = _all_nodes_blocks(g, 2)
    model = build_model("sage", 12, nc, 2, dropout=0.0, dtype=jnp.float32)
    x = jnp.take(dg.ndata["features"].astype(jnp.float32),
                 blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)
    ref = layerwise_inference("sage", params, dg, 2, dtype=jnp.float32)
    # interpret-mode pallas closure
    orig = spmm_pallas.spmm_via_pallas
    spmm_interp = None

    def patched(feat, dl, n, interpret=True):
        return orig(feat, dl, n, interpret=True)

    spmm_pallas.spmm_via_pallas = patched
    try:
        spmm = make_pallas_spmm(dg, band=256, wr=64, et=256)
        got = layerwise_inference("sage", params, dg, 2, dtype=jnp.float32,
                                  spmm=spmm)
    finally:
        spmm_pallas.spmm_via_pallas = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_dual_spmm_routing(monkeypatch):
    """make_dual_spmm routes F>256 to the hybrid closure and F<=256 to the
    packed banded closure."""
    import jax.numpy as jnp

    import bliss_gnn_tpu.models.inference as I

    calls = []
    monkeypatch.setattr(
        I, "make_hybrid_spmm",
        lambda g, **kw: lambda f: calls.append(("hybrid", f.shape[1])) or f,
    )
    monkeypatch.setattr(
        I, "make_pallas_spmm",
        lambda g, **kw: lambda f: calls.append(("banded", f.shape[1])) or f,
    )
    spmm = I.make_dual_spmm(None)
    spmm(jnp.zeros((4, 602)))
    spmm(jnp.zeros((4, 256)))
    assert calls == [("hybrid", 602), ("banded", 256)]


@pytest.mark.parametrize("name", ["sage", "gcn", "gat"])
def test_layerwise_inference_uva_matches_full(small_synth, name):
    """Host-chunked UVA inference (bounded device memory, host-resident
    activations — the reference's use_uva DataLoader inference,
    model.py:351-362) == the one-shot full-graph path, multi-chunk."""
    from bliss_gnn_tpu.models.inference import layerwise_inference_uva

    g, nc, _ = small_synth
    blocks, dg = _all_nodes_blocks(g, 2)
    model = build_model(name, 12, nc, 2, dropout=0.0, dtype=jnp.float32)
    x = jnp.take(dg.ndata["features"].astype(jnp.float32),
                 blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)
    heads = (4, 1)
    ref = layerwise_inference(
        name, params, dg, 2, heads=heads, dtype=jnp.float32,
    )
    feats = np.asarray(dg.ndata["features"].astype(jnp.float32))
    # node_batch=64 forces several chunks over the 200-node graph
    uva = layerwise_inference_uva(
        name, params, g, 2, heads=heads, dtype=jnp.float32,
        node_batch=64, features=feats,
    )
    np.testing.assert_allclose(
        np.asarray(uva), np.asarray(ref), rtol=2e-4, atol=2e-4,
    )
