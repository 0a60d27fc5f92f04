"""Sampler semantic tests: block well-formedness, probability math parity
with the reference equations, Poisson budget control, selection statistics,
estimator unbiasedness, EXP3 update math."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bliss_gnn_tpu.graph.structure import Graph, normalized_edata
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import (
    SamplerConfig,
    exp3_update,
    init_exp3_weights,
    sample_blocks,
)

KINDS = ["ladies", "poisson-ladies", "bandit", "poisson-bandit", "neighbor", "full"]


def _sample(g, kind, fanouts, batch, key=0, eta=0.1, exp3=None, slack=16.0,
            dense=None):
    dg = g.to_device()
    cfg = SamplerConfig(kind=kind, fanouts=tuple(fanouts), eta=eta)
    plan = CapacityPlan.build(
        batch, fanouts, g.n_nodes, g.n_edges, kind=kind, frontier_slack=slack,
        dense_candidates=dense,
    )
    if exp3 is None and cfg.is_bandit:
        exp3 = init_exp3_weights(len(fanouts), g.n_edges)
    seeds = jnp.arange(batch, dtype=jnp.int32)
    smask = jnp.ones(batch, bool)
    blocks, stats = sample_blocks(
        dg, cfg, plan, jax.random.PRNGKey(key), seeds, smask, exp3
    )
    return blocks, stats, dg, cfg, plan


@pytest.mark.parametrize("dense", [None, False])
@pytest.mark.parametrize("kind", KINDS)
def test_blocks_well_formed(small_synth, kind, dense):
    g, _, _ = small_synth
    blocks, stats, dg, cfg, plan = _sample(g, kind, (16, 8), 4, dense=dense)
    seeds = np.arange(4)
    for l, b in enumerate(blocks):
        src_gids = np.asarray(b.src_gids)
        src_mask = np.asarray(b.src_mask)
        e_mask = np.asarray(b.e_mask)
        e_src = np.asarray(b.e_src)
        e_dst = np.asarray(b.e_dst)
        # dst slots of the LAST block are the original seeds
        if l == len(blocks) - 1:
            np.testing.assert_array_equal(src_gids[: b.n_dst_cap][src_mask[: b.n_dst_cap]], seeds)
        # valid src gids unique
        valid = src_gids[src_mask]
        assert len(np.unique(valid)) == len(valid)
        # edges reference valid slots
        assert np.all(src_mask[e_src[e_mask]])
        assert np.all(e_dst[e_mask] < b.n_dst_cap)
        assert np.all(src_mask[: b.n_dst_cap][e_dst[e_mask]])
        # every kept edge exists in the graph with matching endpoints
        eids = np.asarray(b.eid)[e_mask]
        gs, gd = g.edges()
        np.testing.assert_array_equal(gs[eids], src_gids[e_src[e_mask]])
        np.testing.assert_array_equal(gd[eids], src_gids[e_dst[e_mask]])
        # no frontier overflow under generous slack
        assert int(stats[f"layer{l}/frontier_overflow"]) == 0
    # chained frontier: block l's dst table == block l+1's src table
    for l in range(len(blocks) - 1):
        hi, lo = blocks[l + 1], blocks[l]
        np.testing.assert_array_equal(
            np.asarray(hi.src_gids), np.asarray(lo.src_gids)[: hi.n_src_cap]
        )


def test_ladies_node_prob_math(toy):
    """q_j = sqrt(sum over edges j->i of w_e^2) — ladies_sampler.py:44-48,
    checked by sampling with a huge fanout so every candidate is selected and
    P (node_prob) is exported unchanged for non-poisson? P is only stored for
    chosen nodes; instead check via the debiased weights of the full
    selection: W-tilde = w/P * d."""
    g, _, _ = toy
    blocks, stats, dg, cfg, plan = _sample(g, "ladies", (5,), 2)
    b = blocks[0]
    # Hand-compute: seeds {0,1}; in-edges (with self loops, canonical order):
    # dst0: src {0,2,3}, w=1/3 each;  dst1: src {1,3,4}, w=1/3 each
    # q_j = sqrt(sum_j w^2): node0: 1/3; node1: 1/3; node2: 1/3;
    # node3: sqrt(2)/3; node4: 1/3
    expect_prob = {
        0: 1 / 3, 1: 1 / 3, 2: 1 / 3, 3: np.sqrt(2) / 3, 4: 1 / 3,
    }
    e_mask = np.asarray(b.e_mask)
    src_gids = np.asarray(b.src_gids)
    wt = np.asarray(b.e_weight)[e_mask]
    e_src = np.asarray(b.e_src)[e_mask]
    e_dst = np.asarray(b.e_dst)[e_mask]
    # with fanout >= n_candidates every node is selected, d = full in-degree
    # W-tilde = (w / P_src) * d_dst  (ladies_sampler.py:94-97)
    for k in range(len(wt)):
        w_e = 1 / 3
        p = expect_prob[src_gids[e_src[k]]]
        d = {0: 3, 1: 3}[src_gids[e_dst[k]]]
        np.testing.assert_allclose(wt[k], w_e / p * d, rtol=1e-5)


def test_poisson_budget(small_synth):
    """Poisson scaling: E[#selected] ~= num (sum of capped probs), seeds
    forced to probability 1 (bandit_sampler.py:403-404)."""
    g, _, _ = small_synth
    counts = []
    for k in range(20):
        blocks, stats, dg, cfg, plan = _sample(
            g, "poisson-ladies", (32,), 16, key=k
        )
        b = blocks[0]
        # seeds all present: first 16 src slots valid
        assert np.all(np.asarray(b.src_mask)[:16])
        np.testing.assert_array_equal(
            np.asarray(b.src_node_prob)[:16], np.ones(16, np.float32)
        )
        counts.append(int(stats["layer0/n_selected"]))
    mean_sel = np.mean(counts)
    # E[#selected] = sum(min(c q,1)) ~ num, but seeds (p=1) push it up by
    # at most batch; candidates < num clamps it down
    assert 16 <= mean_sel <= 32 + 16 + 10, counts


def test_gumbel_topk_selection_statistics(small_synth):
    """Single-draw marginal of gumbel top-1 == normalized probs."""
    from bliss_gnn_tpu.sampling.samplers import _gumbel_topk_select

    probs = jnp.array([0.1, 0.2, 0.3, 0.4, 0.0])
    mask = jnp.ones(5, bool)
    f = jax.jit(lambda k: _gumbel_topk_select(k, probs, mask, 1))
    counts = np.zeros(5)
    n = 3000
    sels = jax.vmap(f)(jax.random.split(jax.random.PRNGKey(0), n))
    counts = np.asarray(jnp.sum(sels, axis=0), np.float64)
    freq = counts / n
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4, 0.0], atol=0.03)


def test_poisson_ladies_unbiased_aggregation(small_synth):
    """Property test (SURVEY.md §4): E[W-tilde-weighted mean aggregation]
    equals the full weighted aggregation.  For Poisson sampling the node
    inclusion probability is exactly P, and the model's mean division by the
    kept degree cancels the d factor in W-tilde, so
    E[sum_kept (w_e/P_src) x_src] = sum_frontier w_e x_src."""
    g, _, _ = small_synth
    dg = g.to_device()
    batch = 4
    x = np.asarray(dg.ndata["features"], np.float32)
    # full weighted aggregation for the seed nodes
    gs, gd = g.edges()
    w = g.edata["w"]
    full = np.zeros((batch, x.shape[1]), np.float32)
    for e in range(g.n_edges):
        if gd[e] < batch:
            full[gd[e]] += w[e] * x[gs[e]]

    cfg = SamplerConfig(kind="poisson-ladies", fanouts=(24,))
    plan = CapacityPlan.build(batch, (24,), g.n_nodes, g.n_edges,
                              kind="poisson-ladies", frontier_slack=16.0)
    seeds = jnp.arange(batch, dtype=jnp.int32)
    smask = jnp.ones(batch, bool)

    def one(key):
        blocks, _ = sample_blocks(dg, cfg, plan, key, seeds, smask, None)
        b = blocks[0]
        xs = jnp.take(dg.ndata["features"].astype(jnp.float32), b.src_gids, axis=0)
        msg = xs[b.e_src] * b.e_weight[:, None]
        agg = jax.ops.segment_sum(
            jnp.where(b.e_mask[:, None], msg, 0.0),
            jnp.where(b.e_mask, b.e_dst, 0),
            num_segments=b.n_dst_cap,
        )
        deg = jax.ops.segment_sum(
            jnp.where(b.e_mask, 1.0, 0.0), jnp.where(b.e_mask, b.e_dst, 0),
            num_segments=b.n_dst_cap,
        )
        return agg[:batch] / jnp.maximum(deg[:batch], 1.0)[:, None]

    n_trials = 600
    outs = jax.vmap(jax.jit(one))(jax.random.split(jax.random.PRNGKey(3), n_trials))
    est = np.asarray(jnp.mean(outs, axis=0))
    scale = np.abs(full).mean() + 1e-6
    tol = 0.1 * scale + 0.05 * np.abs(full)
    bad = np.abs(est - full) > tol
    assert not bad.any(), (
        f"{bad.sum()} / {bad.size} entries off; max err "
        f"{np.abs(est - full).max():.4f} vs scale {scale:.4f}"
    )


def test_bandit_uniform_weights_match_ladies_probs(toy):
    """With uniform EXP3 weights, q_ij = (1-eta)/n_i + eta/n_i = 1/n_i =
    the normalized graph weight, so bandit node probs == ladies node probs."""
    g, _, _ = toy
    b1, _, dg, cfg1, _ = _sample(g, "bandit", (5,), 2, key=5, eta=0.3)
    b2, _, _, cfg2, _ = _sample(g, "ladies", (5,), 2, key=5)
    # same selection under the same key when probabilities coincide
    np.testing.assert_array_equal(
        np.asarray(b1[0].src_gids), np.asarray(b2[0].src_gids)
    )
    np.testing.assert_array_equal(
        np.asarray(b1[0].e_mask), np.asarray(b2[0].e_mask)
    )
    # q_ij stored = 1/in_deg(dst)
    e_mask = np.asarray(b1[0].e_mask)
    q = np.asarray(b1[0].e_q)[e_mask]
    gd = g.edges()[1]
    indeg = g.in_degrees()
    eids = np.asarray(b1[0].eid)[e_mask]
    np.testing.assert_allclose(q, 1.0 / indeg[gd[eids]], rtol=1e-5)


def test_exp3_update_math(toy):
    """Hand-check STEP_05..07 (bandit_sampler.py:140-249) on a sampled toy
    block with known embed norms."""
    g, _, _ = toy
    blocks, stats, dg, cfg, plan = _sample(g, "poisson-bandit", (5,), 2, key=1)
    L = 1
    exp3 = init_exp3_weights(L, g.n_edges, dtype=jnp.float32)
    b = blocks[0]
    emb = jnp.arange(b.n_src_cap, dtype=jnp.float32) + 1.0
    new = exp3_update(dg, cfg, exp3, blocks, [emb])
    # layer plane of the [L, R, 128] grid state, padding trimmed
    new = np.asarray(new, np.float64).reshape(1, -1)[0, : g.n_edges]
    # reference computation in numpy
    e_mask = np.asarray(b.e_mask)
    e_src = np.asarray(b.e_src)[e_mask]
    e_dst = np.asarray(b.e_dst)[e_mask]
    eid = np.asarray(b.eid)[e_mask]
    q = np.asarray(b.e_q)[e_mask].astype(np.float64)
    P = np.asarray(b.src_node_prob).astype(np.float64)
    gsrc, gdst = g.edges()
    w_graph = g.edata["w"]
    indeg = g.in_degrees()
    k_i = np.zeros(b.n_dst_cap)
    np.add.at(k_i, e_dst, 1)
    emb_np = np.asarray(emb, np.float64)
    ref = np.ones(g.n_edges, np.float64)
    src_gids = np.asarray(b.src_gids)
    for j in range(len(eid)):
        alpha = w_graph[eid[j]]
        r = alpha**2 / k_i[e_dst[j]] * emb_np[e_src[j]] ** 2 / q[j] ** 2
        rhat = r / P[e_src[j]]
        n_i = indeg[src_gids[e_dst[j]]]
        dr = min(rhat * 0.01 / n_i, 1.0)
        ref[eid[j]] *= np.exp(dr)
    ref = ref / np.abs(ref).sum()
    np.testing.assert_allclose(new, ref, rtol=1e-4)


@pytest.mark.parametrize("kind", ["ladies", "poisson-bandit"])
def test_dense_vs_compact_candidates_equivalent(small_synth, kind):
    """dense_candidates (position == gid) and compact_candidates (dgl
    compact_graphs parity) must produce the same blocks when selection is
    deterministic — huge fanout makes every candidate selected, removing
    the RNG-slot dependence."""
    g, _, _ = small_synth
    fan = (4 * g.n_nodes,)
    b_dense, s_dense, *_ = _sample(g, kind, fan, 6, key=3, dense=True)
    b_comp, s_comp, *_ = _sample(g, kind, fan, 6, key=3, dense=False)
    assert int(s_dense["layer0/n_candidates"]) == int(
        s_comp["layer0/n_candidates"]
    )
    for bd, bc in zip(b_dense, b_comp):
        md, mc = np.asarray(bd.e_mask), np.asarray(bc.e_mask)
        ed = np.asarray(bd.eid)[md]
        ec = np.asarray(bc.eid)[mc]
        od, oc = np.argsort(ed), np.argsort(ec)
        np.testing.assert_array_equal(ed[od], ec[oc])
        np.testing.assert_allclose(
            np.asarray(bd.e_weight)[md][od],
            np.asarray(bc.e_weight)[mc][oc], rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(bd.e_q)[md][od],
            np.asarray(bc.e_q)[mc][oc], rtol=1e-5,
        )
        # same src-node sets
        np.testing.assert_array_equal(
            np.sort(np.asarray(bd.src_gids)[np.asarray(bd.src_mask)]),
            np.sort(np.asarray(bc.src_gids)[np.asarray(bc.src_mask)]),
        )


def test_sampling_deterministic_per_key(small_synth):
    g, _, _ = small_synth
    b1, _, _, _, _ = _sample(g, "poisson-bandit", (16, 8), 4, key=11)
    b2, _, _, _, _ = _sample(g, "poisson-bandit", (16, 8), 4, key=11)
    b3, _, _, _, _ = _sample(g, "poisson-bandit", (16, 8), 4, key=12)
    np.testing.assert_array_equal(np.asarray(b1[0].src_gids), np.asarray(b2[0].src_gids))
    assert not np.array_equal(np.asarray(b1[0].src_gids), np.asarray(b3[0].src_gids))


def test_neighbor_sampler_fanout_bound(small_synth):
    g, _, _ = small_synth
    blocks, stats, dg, cfg, plan = _sample(g, "neighbor", (4, 3), 6)
    for l, b in enumerate(blocks):
        deg = np.asarray(b.in_degrees())
        assert deg.max() <= (4, 3)[l]
        # every dst with in-edges in g has at least one kept edge
        indeg_g = g.in_degrees()
        dst_gids = np.asarray(b.dst_gids)
        dst_mask = np.asarray(b.dst_mask)
        for i in np.where(dst_mask)[0]:
            if indeg_g[dst_gids[i]] > 0:
                assert deg[i] >= 1


def test_full_sampler_keeps_everything(small_synth):
    g, _, _ = small_synth
    blocks, stats, dg, cfg, plan = _sample(g, "full", (0, 0), 6)
    b = blocks[-1]
    indeg_g = g.in_degrees()
    deg = np.asarray(b.in_degrees())
    np.testing.assert_array_equal(deg[:6], indeg_g[:6])


def test_overflow_truncates_gracefully(small_synth):
    """Tiny capacities: edges beyond the frontier cap are dropped, the
    overflow is reported, and blocks remain structurally valid."""
    g, _, _ = small_synth
    dg = g.to_device()
    cfg = SamplerConfig(kind="poisson-ladies", fanouts=(16,))
    plan = CapacityPlan.build(8, (16,), g.n_nodes, g.n_edges,
                              kind="poisson-ladies", frontier_slack=16.0)
    # shrink the frontier capacity below the true edge count
    small = dataclasses_replace(plan, frontier_caps=(16,), cand_caps=(64,),
                                block_e_caps=(16,))
    seeds = jnp.arange(8, dtype=jnp.int32)
    blocks, stats = sample_blocks(dg, cfg, small, jax.random.PRNGKey(0),
                                  seeds, jnp.ones(8, bool))
    assert int(stats["layer0/frontier_overflow"]) > 0
    b = blocks[0]
    e_mask = np.asarray(b.e_mask)
    assert e_mask.sum() <= 16
    e_src = np.asarray(b.e_src)[e_mask]
    assert np.all(np.asarray(b.src_mask)[e_src])


def dataclasses_replace(plan, **kw):
    import dataclasses
    return dataclasses.replace(plan, **kw)


def test_capacity_refit_preserves_sampling(small_synth):
    """Refit to measured maxima must not change WHAT gets sampled — only
    the static padding.  The kept-edge order (seed position, eid) is
    capacity-invariant, so the refit blocks are a prefix of the originals."""
    g, _, _ = small_synth
    blocks, stats, dg, cfg, plan = _sample(g, "poisson-bandit", (16, 8), 4,
                                           key=5)
    L = len(cfg.fanouts)
    fr = [int(stats[f"layer{l}/frontier_edges"]) for l in range(L)]
    be = [int(stats[f"layer{l}/n_block_edges_true"]) for l in range(L)]
    tight = plan.refit(fr, be)
    for l in range(L):
        assert tight.frontier_caps[l] <= plan.frontier_caps[l]
        assert tight.block_e_caps[l] <= plan.block_e_caps[l]
        assert tight.block_e_caps[l] >= be[l]
        # shapes the model params depend on are untouched
        assert tight.dst_caps[l] == plan.dst_caps[l]
        assert tight.extra_caps[l] == plan.extra_caps[l]
        assert tight.cand_caps[l] == plan.cand_caps[l]
    exp3 = init_exp3_weights(L, g.n_edges)
    seeds = jnp.arange(4, dtype=jnp.int32)
    smask = jnp.ones(4, bool)
    blocks2, stats2 = sample_blocks(
        dg, cfg, tight, jax.random.PRNGKey(5), seeds, smask, exp3
    )
    for b1, b2 in zip(blocks, blocks2):
        np.testing.assert_array_equal(
            np.asarray(b1.src_gids), np.asarray(b2.src_gids))
        np.testing.assert_array_equal(
            np.asarray(b1.src_mask), np.asarray(b2.src_mask))
        k = b2.e_cap
        np.testing.assert_array_equal(
            np.asarray(b1.e_mask)[:k], np.asarray(b2.e_mask))
        m = np.asarray(b2.e_mask)
        for f in ("e_src", "e_dst", "eid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(b1, f))[:k][m],
                np.asarray(getattr(b2, f))[m], err_msg=f)
        np.testing.assert_allclose(
            np.asarray(b1.e_weight)[:k][m], np.asarray(b2.e_weight)[m],
            rtol=1e-6)


def test_capacity_widen_grows_block_caps(small_synth):
    g, _, _ = small_synth
    plan = CapacityPlan.build(4, (16, 8), g.n_nodes, g.n_edges,
                              kind="poisson-bandit")
    tight = plan.refit([100, 100], [10, 10])
    wide = tight.widen(1.5)
    for l in range(2):
        assert wide.block_e_caps[l] >= tight.block_e_caps[l]
        assert wide.block_e_caps[l] <= wide.frontier_caps[l]
        assert wide.frontier_caps[l] == tight.frontier_caps[l]
    wide2 = tight.widen(2.0, frontier=True)
    assert all(a >= b for a, b in zip(wide2.frontier_caps, tight.frontier_caps))


def test_gat_alpha_renormalization_math(toy):
    """GAT reward alpha (bandit_sampler.py:146-158): alpha = nan_to_num(
    a_ij / sum_dst a_ij) * sum_dst q_ij, hand-checked on a toy block."""
    from bliss_gnn_tpu.sampling.samplers import _calculate_alpha

    g, _, _ = toy
    blocks, stats, dg, cfg, plan = _sample(g, "poisson-bandit", (5,), 2,
                                           key=1)
    cfg_gat = SamplerConfig(kind="poisson-bandit", fanouts=(5,), model="gat")
    b = blocks[0]
    e_mask = np.asarray(b.e_mask)
    n_e = b.e_cap
    a_ij = jnp.asarray(np.linspace(0.1, 1.0, n_e), jnp.float32)
    alpha = np.asarray(_calculate_alpha(dg, cfg_gat, b, a_ij))
    # numpy reference
    e_dst = np.asarray(b.e_dst)
    q = np.asarray(b.e_q, np.float64)
    a = np.asarray(a_ij, np.float64)
    q_sum = np.zeros(b.n_dst_cap)
    a_sum = np.zeros(b.n_dst_cap)
    np.add.at(q_sum, e_dst[e_mask], q[e_mask])
    np.add.at(a_sum, e_dst[e_mask], a[e_mask])
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.nan_to_num(a / a_sum[e_dst])
    ref = ratio * q_sum[e_dst]
    ref[~e_mask] = 0.0
    np.testing.assert_allclose(alpha, ref, rtol=1e-4)
