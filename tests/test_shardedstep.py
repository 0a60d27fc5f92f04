"""Edge-partitioned sampled training (parallel/shardedstep.py) on the
virtual 8-device CPU mesh.

The contract under test (SURVEY.md §5.8): with the same PRNG and the same
seed shards, training over SHARDED storage (graph/features/EXP3 split into
contiguous ranges, O(E/S + N/S) per device) is numerically equivalent to
the replicated-storage DP step — the distributed row gather serves
identical values, EXP3 updates are disjoint-support across shards."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.graph.datasets import synthetic_graph
from bliss_gnn_tpu.graph.structure import Graph, normalized_edata
from bliss_gnn_tpu.models.gnn import build_model
from bliss_gnn_tpu.parallel.dp import make_dp_train_step
from bliss_gnn_tpu.parallel.mesh import make_mesh
from bliss_gnn_tpu.parallel.shardedstep import (
    ShardedDeviceGraph,
    make_sharded_eval_step,
    make_sharded_renorm,
    make_sharded_train_step,
    shard_exp3,
    unshard_exp3,
)
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import (
    SamplerConfig,
    init_exp3_weights,
    normalize_exp3_weights,
    sample_blocks,
)
from bliss_gnn_tpu.train.steps import TrainState, make_optimizer


def _setup(local_batch=4, kind="poisson-bandit", n_layers=2):
    g, nc, ml = synthetic_graph(300, 2400, 16, 4, seed=5)
    g = Graph.canonicalize(g)
    g.edata["w"] = normalized_edata(g)
    dg = g.to_device()
    fanouts = (16, 8)[:n_layers]
    cfg = SamplerConfig(kind=kind, fanouts=fanouts, eta=0.1)
    plan = CapacityPlan.build(local_batch, fanouts, g.n_nodes, g.n_edges,
                              kind=kind)
    model = build_model("sage", 16, nc, n_layers)
    tx = make_optimizer(0.01, 10, gamma=0.5, step_size=100)
    exp3 = init_exp3_weights(n_layers, g.n_edges) if "bandit" in kind else None
    seeds0 = jnp.arange(local_batch, dtype=jnp.int32)
    blocks, _ = sample_blocks(dg, cfg, plan, jax.random.PRNGKey(0), seeds0,
                              jnp.ones(local_batch, bool), exp3)
    x = jnp.take(dg.ndata["features"], blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)

    def mk_state(e3):
        # fresh buffers per state: the steps donate their argument, and two
        # states sharing params would invalidate each other
        p = jax.tree.map(jnp.copy, params)
        return TrainState(params=p, opt_state=tx.init(p),
                          exp3_weights=e3, key=jax.random.PRNGKey(2),
                          step=jnp.zeros((), jnp.int32))

    return g, dg, cfg, plan, model, tx, mk_state, exp3, ml


@pytest.mark.parametrize("shard_indptr", [False, True])
def test_sharded_step_matches_replicated_dp(shard_indptr):
    """3 chained steps: params, metrics, and the (unsharded) EXP3 state all
    match the replicated DP step bit-for-bit-modulo-rounding — with the
    [N+1] csc_indptr either replicated or node-range sharded (NShard)."""
    n_dev = 8
    mesh = make_mesh(n_dev)
    g, dg, cfg, plan, model, tx, mk_state, exp3, ml = _setup()
    sg = ShardedDeviceGraph.build(g, n_dev, shard_indptr=shard_indptr)
    if shard_indptr:
        assert sg.csc_indptr.shape == (n_dev, sg.npr)  # O(N/S)/device

    dp_step = make_dp_train_step(mesh, dg, model, tx, cfg, plan, ml,
                                 exp3_normalize=False)
    sh_step = make_sharded_train_step(mesh, sg, model, tx, cfg, plan, ml,
                                      exp3_normalize=False)

    st_dp = mk_state(exp3)
    st_sh = mk_state(shard_exp3(exp3, cfg.n_layers, g.n_edges, n_dev))
    B = plan.batch_size * n_dev
    rng = np.random.default_rng(0)
    for it in range(3):
        seeds = jnp.asarray(
            rng.integers(0, g.n_nodes, B).astype(np.int32))
        smask = jnp.ones(B, bool)
        st_dp, m_dp = dp_step(st_dp, seeds, smask, dg)
        st_sh, m_sh = sh_step(st_sh, seeds, smask, sg)

    # identical sampling -> identical counts
    for k in m_dp:
        if k.startswith("num_"):
            assert int(m_dp[k]) == int(m_sh[k]), k
    np.testing.assert_allclose(
        float(m_dp["train_loss"]), float(m_sh["train_loss"]),
        rtol=1e-5, atol=1e-6,
    )
    # parameters replicated AND equal to the replicated-storage run
    for (p_dp, p_sh) in zip(jax.tree.leaves(st_dp.params),
                            jax.tree.leaves(st_sh.params)):
        np.testing.assert_allclose(
            np.asarray(p_dp), np.asarray(p_sh), rtol=2e-5, atol=2e-6,
        )
    # EXP3 state: unshard and compare against the replicated global rows
    w_sh = np.asarray(
        unshard_exp3(st_sh.exp3_weights, cfg.n_layers, g.n_edges)
        .astype(jnp.float32))
    w_dp = np.asarray(st_dp.exp3_weights.astype(jnp.float32))
    np.testing.assert_allclose(w_sh, w_dp, rtol=2e-2, atol=1e-6)
    # the update actually touched weights (not a vacuous comparison)
    assert (w_dp != w_dp[0]).sum() > 0


def test_sharded_memory_is_partitioned():
    """Per-device addressable graph state is O(E/S + N/S): the stacked
    leaves carry 1/S of every edge- and node-indexed array."""
    n_dev = 8
    g, dg, cfg, plan, model, tx, mk_state, exp3, ml = _setup()
    sg = ShardedDeviceGraph.build(g, n_dev)
    S = n_dev
    assert sg.csc_src_sh.shape[0] == S
    # each shard's slice is ~1/S of the padded edge range
    assert sg.epr * S < g.n_edges + S * 256
    assert sg.npr * S < g.n_nodes + S * 16
    assert sg.features_sh.shape == (S, sg.npr, 16)
    # sharded EXP3 per-device length ~ 1/S of the global flat state
    st = shard_exp3(exp3, cfg.n_layers, g.n_edges, S)
    assert st.shape == (S, cfg.n_layers * sg.epr + 1)
    # ~1/S of the L*E edge weights each (the canonical [L, R, 128]
    # grid's TILE_ROWS padding is NOT distributed)
    assert st.shape[1] * S < cfg.n_layers * (g.n_edges + S * 256) + S
    # roundtrip is exact
    np.testing.assert_array_equal(
        np.asarray(unshard_exp3(st, cfg.n_layers, g.n_edges)),
        np.asarray(exp3),
    )


def test_sharded_renorm_matches_global():
    n_dev = 4
    mesh = make_mesh(n_dev)
    g, dg, cfg, plan, model, tx, mk_state, exp3, ml = _setup()
    # make rows non-trivial
    rng = np.random.default_rng(1)
    w = np.asarray(exp3, np.float32)
    noise = rng.random(w.shape).astype(np.float32) + 0.5
    w = jnp.asarray(np.where(w > 0, w * noise, 0.0), exp3.dtype)
    stacked = shard_exp3(w, cfg.n_layers, g.n_edges, n_dev)
    epr = (stacked.shape[1] - 1) // cfg.n_layers
    renorm = make_sharded_renorm(mesh, cfg.n_layers, epr)
    out = unshard_exp3(renorm(stacked), cfg.n_layers, g.n_edges)
    ref = normalize_exp3_weights(w, cfg.n_layers)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=1e-8,
    )


@pytest.mark.parametrize("model_kind", ["sage", "gat"])
def test_trainer_shard_graph_end_to_end(tmp_path, model_kind):
    """The PRODUCT path: Trainer(--dp 8 --shard-graph) trains, validates,
    renormalizes the sharded EXP3 state, and runs final full-graph eval —
    for GATv2 through the sharded ring attention (no replicated upload)."""
    from bliss_gnn_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        dataset="synth-small", model=model_kind, sampler="poisson-bandit",
        fan_out=(16, 8), num_layers=2, num_hidden=16, num_in_heads=2,
        batch_size=32, num_steps=4, num_epochs=1,
        disable_checkpoint=True, logdir=str(tmp_path),
        inference_backend="xla", dp=8, shard_graph=True,
        refit_after=2, exp3_renorm_every=2,
    )
    tr = Trainer(cfg)
    # no replicated device graph was uploaded for training
    assert isinstance(tr.graph.csc_src, jax.ShapeDtypeStruct)
    assert tr.sharded_graph.csc_src_sh.shape[0] == 8
    tr.fit()
    final = tr.final_eval()
    assert np.isfinite(final["Test"])
    # the state's EXP3 leaf is the stacked sharded layout
    assert tr.state.exp3_weights.shape[0] == 8


@pytest.mark.parametrize("model_kind", ["sage", "gcn", "gat"])
def test_sharded_layerwise_inference_matches_single_device(model_kind):
    """Node-sharded ring inference == single-device layerwise inference
    (the reference's final-eval math, model.py:335-383).  GATv2 rides the
    ring with a shard-local online edge softmax (softmax is per dst;
    shards are contiguous dst ranges — VERDICT r2 missing #1)."""
    from bliss_gnn_tpu.models.inference import (
        layerwise_inference,
        layerwise_inference_sharded,
    )

    n_dev = 8
    mesh = make_mesh(n_dev)
    g, dg, cfg, plan, model, tx, mk_state, exp3, ml = _setup()
    heads = (2, 1) if model_kind == "gat" else None
    if model_kind == "sage":
        params = mk_state(exp3).params
    else:  # same block shapes, GCN/GAT parameterization
        mdl = build_model(model_kind, 16, 4, 2, num_in_heads=2,
                          num_out_heads=1)
        seeds0 = jnp.arange(plan.batch_size, dtype=jnp.int32)
        blocks, _ = sample_blocks(
            dg, cfg, plan, jax.random.PRNGKey(0), seeds0,
            jnp.ones(plan.batch_size, bool), exp3,
        )
        x = jnp.take(dg.ndata["features"], blocks[0].src_gids, axis=0)
        params = mdl.init(jax.random.PRNGKey(1), blocks, x)
    ref = layerwise_inference(
        model_kind, params, dg, 2, dtype=jnp.float32, heads=heads,
    )
    # feed the same bf16-rounded features the device graph holds
    feats = np.asarray(dg.ndata["features"].astype(jnp.float32))
    shd = layerwise_inference_sharded(
        model_kind, params, g, mesh, 2, dtype=jnp.float32, features=feats,
        heads=heads,
    )
    np.testing.assert_allclose(
        np.asarray(shd), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_sharded_eval_matches_dp_eval():
    from bliss_gnn_tpu.parallel.dp import make_dp_eval_step

    n_dev = 8
    mesh = make_mesh(n_dev)
    g, dg, cfg, plan, model, tx, mk_state, exp3, ml = _setup()
    sg = ShardedDeviceGraph.build(g, n_dev)
    st_dp = mk_state(exp3)
    st_sh = mk_state(shard_exp3(exp3, cfg.n_layers, g.n_edges, n_dev))
    ev_dp = make_dp_eval_step(mesh, model, cfg, plan, ml)
    ev_sh = make_sharded_eval_step(mesh, sg, model, cfg, plan, ml)
    B = plan.batch_size * n_dev
    seeds = jnp.arange(B, dtype=jnp.int32)
    smask = jnp.ones(B, bool)
    key = jax.random.PRNGKey(7)
    f1_dp, l_dp, n_dp = ev_dp(st_dp, key, seeds, smask, dg)
    f1_sh, l_sh, n_sh = ev_sh(st_sh, key, seeds, smask, sg)
    assert int(n_dp) == int(n_sh)
    np.testing.assert_allclose(float(l_dp), float(l_sh), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(f1_dp), jax.tree.leaves(f1_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
