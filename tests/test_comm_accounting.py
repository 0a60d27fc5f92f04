"""Communication contract of the DP step (VERDICT r4 ask #3a).

Pins, from the actual lowered module, that the DP step's collectives are
O(step working set): gradient/metric psums plus the EXP3 sparse-delta
all-gathers sized by the block edge caps — NOT a dense O(L x E)
arm-weight sync.  A regression that silently densifies the EXP3 sync
(the single scaling-destroying failure mode of this design,
parallel/dp.py docstring) fails these assertions at lowering time, long
before any hardware run.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bliss_gnn_tpu.graph.datasets import synthetic_graph
from bliss_gnn_tpu.graph.structure import Graph, normalized_edata
from bliss_gnn_tpu.models.gnn import build_model
from bliss_gnn_tpu.parallel.commstats import (
    collectives_from_text,
    comm_summary,
    predicted_scaling_pct,
)
from bliss_gnn_tpu.parallel.dp import make_dp_train_step
from bliss_gnn_tpu.parallel.mesh import make_mesh
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import (
    SamplerConfig,
    init_exp3_weights,
    sample_blocks,
)
from bliss_gnn_tpu.train.steps import TrainState, make_optimizer


N_DEV = 8
LOCAL_BATCH = 4
# big enough that a dense EXP3 sync (L x E x 2 bytes) would dwarf the
# sparse delta lists — the discriminating regime
N_EDGES = 200_000


@pytest.fixture(scope="module")
def dp_lowering():
    g, nc, ml = synthetic_graph(20_000, N_EDGES, 16, 4, seed=5)
    g = Graph.canonicalize(g)
    g.edata["w"] = normalized_edata(g)
    dg = g.to_device()
    cfg = SamplerConfig(kind="poisson-bandit", fanouts=(16, 8), eta=0.1)
    plan = CapacityPlan.build(LOCAL_BATCH, cfg.fanouts, g.n_nodes,
                              g.n_edges, kind=cfg.kind)
    model = build_model("sage", 16, nc, 2)
    tx = make_optimizer(0.01, 10, gamma=0.5, step_size=100)
    exp3 = init_exp3_weights(2, g.n_edges)
    seeds0 = jnp.arange(LOCAL_BATCH, dtype=jnp.int32)
    blocks, _ = sample_blocks(dg, cfg, plan, jax.random.PRNGKey(0), seeds0,
                              jnp.ones(LOCAL_BATCH, bool), exp3)
    x = jnp.take(dg.ndata["features"], blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)
    state = TrainState(params=params, opt_state=tx.init(params),
                       exp3_weights=exp3, key=jax.random.PRNGKey(2),
                       step=jnp.zeros((), jnp.int32))
    mesh = make_mesh(N_DEV)
    step = make_dp_train_step(mesh, dg, model, tx, cfg, plan, ml)
    seeds = jnp.arange(N_DEV * LOCAL_BATCH, dtype=jnp.int32)
    mask = jnp.ones(N_DEV * LOCAL_BATCH, bool)
    lowered = step.lower(state, seeds, mask, dg)
    return lowered, plan, params, g


def test_collectives_extracted(dp_lowering):
    lowered, plan, params, g = dp_lowering
    entries = collectives_from_text(lowered.as_text())
    kinds = {c.kind for c in entries}
    assert "all_reduce" in kinds, "gradient psum missing"
    assert "all_gather" in kinds, "EXP3 sparse-delta all-gather missing"


def test_exp3_sync_is_sparse_not_dense(dp_lowering):
    lowered, plan, params, g = dp_lowering
    entries = collectives_from_text(lowered.as_text())
    # the dense failure mode: an [L, E]-sized collective
    dense_bytes = 2 * g.n_edges * 2  # L=2 layers x E x bf16
    largest = max(c.out_bytes for c in entries)
    assert largest < dense_bytes / 2, (
        f"a collective of {largest} bytes looks O(E) "
        f"(dense EXP3 sync would be {dense_bytes})"
    )
    # all-gathers must account exactly as the sparse lists: per layer,
    # eid (int32) + exponent (f32), each [n_dev, block_e_cap] after
    # gathering
    ag = [c for c in entries if c.kind == "all_gather"]
    expected = sum(N_DEV * cap * (4 + 4) for cap in plan.block_e_caps)
    got = sum(c.out_bytes for c in ag)
    assert got <= expected * 1.25 + 4096, (
        f"all-gather bytes {got} exceed the sparse-delta budget "
        f"{expected}"
    )


def test_allreduce_budget_is_params_plus_metrics(dp_lowering):
    lowered, plan, params, g = dp_lowering
    entries = collectives_from_text(lowered.as_text())
    ar_bytes = sum(c.out_bytes for c in entries if c.kind == "all_reduce")
    param_bytes = sum(
        np.prod(p.shape) * p.dtype.itemsize
        for p in jax.tree.leaves(params)
    )
    # grads (~param_bytes) + F1/loss/count/refit-max scalars and small
    # vectors; 4x slack for dtype upcasts and duplicated partial reduces
    assert ar_bytes < 4 * param_bytes + (1 << 20), (
        f"all-reduce volume {ar_bytes} vs params {param_bytes}"
    )


def test_predicted_scaling_model_arithmetic():
    # 36.6 ms step, 10 MB moved at 200 GB/s -> 50 us comm -> ~99.9%
    pct = predicted_scaling_pct(36.6e-3, 10e6)
    assert 99.0 < pct < 100.0
    # a dense 690 MB sync would crater it
    pct_dense = predicted_scaling_pct(36.6e-3, 2 * 690e6 * 7 / 8)
    assert pct_dense < 90.0


def test_hlo_parser_matches_stablehlo_parser(dp_lowering):
    """The post-compile HLO parser agrees with the StableHLO parser on
    the same program (CPU compile at this small config is cheap)."""
    lowered, plan, params, g = dp_lowering
    stable = collectives_from_text(lowered.as_text())
    compiled = lowered.compile()
    hlo = collectives_from_text(compiled.as_text())
    if not hlo:
        pytest.skip("backend inlined all collectives (single-host CPU)")
    # compilers may fuse/split; totals must agree within 2x
    sb = sum(c.out_bytes for c in stable)
    hb = sum(c.out_bytes for c in hlo)
    assert 0.5 < (hb + 1) / (sb + 1) < 2.0
