"""Calibrate the honest time-to-val-F1 bench (VERDICT r2 ask #5).

Runs the PR1-style config (3-layer SAGE-256, poisson-bandit, fanouts
512/256/128, bs=1024) on a synthetic stand-in and prints the sampled-VAL
micro-F1 trajectory per chained-train-step dispatch, for two arms:

  A (default)      : the real fused step — EXP3 learns.
  B (--break-exp3) : the bandit update is thrown away every chain (weights
                     reset to the uniform init) — what a silently broken
                     EXP3 implementation degrades to.

The bench's target F1 must sit where arm A reaches it in >= 50 train steps
and arm B visibly later (or never) — that is what makes the bench metric
sensitive to sampler-quality regressions rather than a vanity constant.

Usage (CPU mesh, honest trajectories — the axon tunnel memoization does
not apply because the state changes every chain):
    JAX_PLATFORMS=cpu python scripts/calibrate_ttvf1.py \
        --dataset synth-pubmed-hard --chains 20 [--break-exp3]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synth-pubmed-hard")
    ap.add_argument("--chains", type=int, default=20)
    ap.add_argument("--k", type=int, default=8, help="train steps per chain")
    ap.add_argument("--kv", type=int, default=4, help="val batches per eval")
    ap.add_argument("--bs", type=int, default=1024)
    ap.add_argument("--break-exp3", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--homophily", type=float, default=None,
                    help="override: build the synth directly")
    ap.add_argument("--noise", type=float, default=None)
    ap.add_argument("--fanouts", default="512,256,128")
    ap.add_argument("--beacon-frac", type=float, default=1.0)
    ap.add_argument("--beacon-scale", type=float, default=1.0)
    args = ap.parse_args()

    from bliss_gnn_tpu.graph.datasets import load_dataset
    from bliss_gnn_tpu.graph.structure import Graph, normalized_edata
    from bliss_gnn_tpu.models.gnn import build_model
    from bliss_gnn_tpu.sampling.block import CapacityPlan
    from bliss_gnn_tpu.sampling.samplers import (
        SamplerConfig,
        init_exp3_weights,
        sample_blocks,
    )
    from bliss_gnn_tpu.train.metrics import f1_compute
    from bliss_gnn_tpu.train.steps import (
        TrainState,
        make_multi_eval_step,
        make_multi_train_step,
        make_optimizer,
    )

    from bliss_gnn_tpu.utils.logging import enable_compilation_cache
    enable_compilation_cache()
    if args.homophily is not None or args.noise is not None:
        from bliss_gnn_tpu.graph.datasets import DATASET_STATS, synthetic_graph
        base = args.dataset.replace("synth-", "").replace("-hard", "")
        n, e, f, c, ml_ = DATASET_STATS[base]
        g, n_classes, ml = synthetic_graph(
            n, e, f, c, multilabel=ml_, seed=args.seed,
            homophily=args.homophily or 0.0,
            feature_noise=args.noise if args.noise is not None else 2.0,
            beacon_frac=args.beacon_frac, beacon_scale=args.beacon_scale)
    else:
        g, n_classes, ml = load_dataset(args.dataset, seed=args.seed)
    g = Graph.canonicalize(g)
    g.edata["w"] = normalized_edata(g)
    dg = g.to_device()
    bs, K, Kv = args.bs, args.k, args.kv
    fanouts = tuple(int(x) for x in args.fanouts.split(","))
    cfg = SamplerConfig(kind="poisson-bandit", fanouts=fanouts)
    plan = CapacityPlan.build(bs, cfg.fanouts, g.n_nodes, g.n_edges,
                              kind=cfg.kind)
    model = build_model("sage", 256, n_classes, 3)
    exp3_init = init_exp3_weights(3, g.n_edges)
    rng = np.random.default_rng(args.seed)
    train_ids = np.where(g.ndata["train_mask"])[0]
    val_ids = np.where(g.ndata["val_mask"])[0]
    seeds0 = jnp.asarray(rng.choice(train_ids, bs), jnp.int32)
    blocks, _ = jax.jit(
        lambda k, g_, s, e: sample_blocks(g_, cfg, plan, k, s,
                                          jnp.ones(bs, bool), e)
    )(jax.random.PRNGKey(0), dg, seeds0, exp3_init)
    x = jnp.take(dg.ndata["features"], blocks[0].src_gids, axis=0)
    params = model.init(jax.random.PRNGKey(1), blocks, x)
    tx = make_optimizer(2e-3, max(1, len(train_ids) // bs))
    state = TrainState(params=params, opt_state=tx.init(params),
                       exp3_weights=exp3_init, key=jax.random.PRNGKey(2),
                       step=jnp.zeros((), jnp.int32))
    multi = make_multi_train_step(dg, model, tx, cfg, plan, ml, K)
    eval_multi = make_multi_eval_step(model, cfg, plan, ml)

    # FIXED val seed set (same batches at every measurement point)
    vs = rng.choice(val_ids, (Kv, bs)).astype(np.int32)
    val_seeds = jnp.asarray(vs)
    val_mask = jnp.ones((Kv, bs), bool)
    eval_key = jax.random.PRNGKey(7)

    def val_f1(state):
        f1, _, _, _ = eval_multi(state, eval_key, val_seeds, val_mask, dg)
        return float(f1_compute(f1, ml))

    def chain_batch():
        s = rng.choice(train_ids, (K, bs)).astype(np.int32)
        return jnp.asarray(s), jnp.ones((K, bs), bool)

    arm = "B(broken-exp3)" if args.break_exp3 else "A(real)"
    print(f"# arm={arm} dataset={args.dataset} K={K} bs={bs}", flush=True)
    t0 = time.time()
    print(f"step 0 val_f1 {val_f1(state):.4f} t {time.time()-t0:.1f}s",
          flush=True)
    for c in range(args.chains):
        s, m = chain_batch()
        state, mstack = multi(state, s, m, dg)
        if args.break_exp3:
            # fresh uniform weights (the original init buffer was donated
            # into the first chain and no longer exists)
            state = dataclasses.replace(
                state, exp3_weights=init_exp3_weights(3, g.n_edges))
        tr = float(f1_compute(
            jax.tree.map(lambda a: a[-1], mstack["f1"]), ml))
        print(f"step {(c+1)*K} val_f1 {val_f1(state):.4f} "
              f"train_f1 {tr:.4f} t {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
