"""EXP3 deferred-renormalization equivalence and the paper's delta formula.

The fused step runs apply_exp3_deltas(normalize=False) and the Trainer
L1-renormalizes every --exp3-renorm-every steps (default 64); the reference
normalizes every step (bandit_sampler.py:249).  The invariance argument:
every consumer renormalizes per dst (exp3_probabilities divides by the
per-dst sum), so a row-constant rescale cannot change sampling — exact in
exact arithmetic.  These tests demonstrate it:

- trajectory equivalence over 128 steps in f32 state (renorm_every 64 == 1);
- the bf16 probability-invariance bound for a single renorm (consumers see
  probabilities equal within bf16 rounding).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from bliss_gnn_tpu.models.gnn import build_model
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import (
    SamplerConfig,
    _exp3_edge_prob,
    exp3_row,
    init_exp3_weights,
    normalize_exp3_weights,
    sample_blocks,
)
from bliss_gnn_tpu.sampling.frontier import gather_in_edges
from bliss_gnn_tpu.train.steps import TrainState, make_optimizer, make_train_step


def _setup(small_synth, kind="poisson-bandit", exp3_dtype=jnp.float32,
           **cfg_kw):
    g, nc, ml = small_synth
    dg = g.to_device()
    cfg = SamplerConfig(kind=kind, fanouts=(16, 8), eta=0.1, **cfg_kw)
    plan = CapacityPlan.build(4, cfg.fanouts, g.n_nodes, g.n_edges, kind=kind)
    model = build_model("sage", 16, nc, 2)
    tx = make_optimizer(0.01, 10, gamma=0.5, step_size=1000)
    exp3 = init_exp3_weights(2, g.n_edges, dtype=exp3_dtype)
    seeds0 = jnp.arange(4, dtype=jnp.int32)
    blocks, _ = sample_blocks(dg, cfg, plan, jax.random.PRNGKey(0), seeds0,
                              jnp.ones(4, bool), exp3)
    x = jnp.take(dg.ndata["features"], blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)
    state = TrainState(params=params, opt_state=tx.init(params),
                       exp3_weights=exp3, key=jax.random.PRNGKey(2),
                       step=jnp.zeros((), jnp.int32))
    return g, dg, cfg, plan, model, tx, state, ml


def _run(step, state, dg, g, renorm_every, n_steps=128):
    renorm = jax.jit(lambda w: normalize_exp3_weights(w, 2))
    rng = np.random.default_rng(0)
    train_ids = np.where(g.ndata["train_mask"])[0]
    for it in range(n_steps):
        seeds = jnp.asarray(
            rng.choice(train_ids, 4, replace=False).astype(np.int32)
        )
        state, _ = step(state, seeds, jnp.ones(4, bool), dg)
        if (it + 1) % renorm_every == 0:
            state = dataclasses.replace(
                state, exp3_weights=renorm(state.exp3_weights)
            )
    return dataclasses.replace(state, exp3_weights=renorm(state.exp3_weights))


def test_renorm_every_64_matches_every_1_f32(small_synth):
    """128-step trajectories (params AND normalized arm weights) agree
    between renorm_every=64 and =1 — the deferred renorm is semantics-
    preserving, not an approximation (f32 state isolates the argument from
    bf16 quantization; the bf16 bound is the next test)."""
    g, dg, cfg, plan, model, tx, state, ml = _setup(small_synth)
    step = make_train_step(dg, model, tx, cfg, plan, ml, donate=False)
    s64 = _run(step, state, dg, g, renorm_every=64)
    s1 = _run(step, state, dg, g, renorm_every=1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=1e-6,
        ),
        s64.params, s1.params,
    )
    np.testing.assert_allclose(
        np.asarray(s64.exp3_weights), np.asarray(s1.exp3_weights),
        rtol=1e-3, atol=1e-9,
    )


def test_renorm_invariance_of_sampling_probs_bf16(small_synth):
    """What consumers SEE — the per-dst-renormalized edge probabilities —
    is invariant to an L1 row renorm within bf16 rounding (one renorm
    perturbs each weight by <= 2^-8 relative; the per-dst division cancels
    the row constant)."""
    g, dg, cfg, plan, model, tx, state, ml = _setup(
        small_synth, exp3_dtype=jnp.bfloat16
    )
    # knock the state away from uniform first
    step = make_train_step(dg, model, tx, cfg, plan, ml, donate=False)
    state = _run(step, state, dg, g, renorm_every=1000, n_steps=8)
    w_raw = state.exp3_weights
    w_norm = normalize_exp3_weights(w_raw, 2)
    seeds = jnp.arange(8, dtype=jnp.int32)
    smask = jnp.ones(8, bool)
    frontier = gather_in_edges(dg.csc_indptr, dg.csc_src, seeds, smask, 512)
    q_raw = _exp3_edge_prob(
        dg, exp3_row(w_raw, 0, 2), 0.1, frontier, seeds, 8
    )
    q_norm = _exp3_edge_prob(
        dg, exp3_row(w_norm, 0, 2), 0.1, frontier, seeds, 8
    )
    np.testing.assert_allclose(
        np.asarray(q_raw), np.asarray(q_norm), rtol=2 ** -7, atol=1e-9
    )


def test_delta_formula_runs_and_differs(small_synth):
    """--exp3-delta-formula: the paper's per-dst learning rate
    (bandit_sampler.py:226-233, commented out upstream) produces a valid,
    different update than the constant delta."""
    g, dg, cfg, plan, model, tx, state, ml = _setup(small_synth)
    cfg_f = dataclasses.replace(cfg, exp3_delta_formula=True, exp3_T=100)
    step_c = make_train_step(dg, model, tx, cfg, plan, ml, donate=False)
    step_f = make_train_step(dg, model, tx, cfg_f, plan, ml, donate=False)
    seeds = jnp.arange(4, dtype=jnp.int32)
    sc, _ = step_c(state, seeds, jnp.ones(4, bool), dg)
    sf, _ = step_f(state, seeds, jnp.ones(4, bool), dg)
    wc = np.asarray(sc.exp3_weights, np.float32)
    wf = np.asarray(sf.exp3_weights, np.float32)
    assert np.all(np.isfinite(wf)) and np.all(wf >= 0)  # 0 = EDGE_PAD slots
    assert not np.allclose(wc, wf)  # a different learning rate moved
    # formula deltas are tiny at T=100 on this graph: weights stay near 1
    assert np.all(wf[wf != 0] <= np.exp(1.0) + 1e-3)
