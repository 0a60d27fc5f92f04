"""Communication accounting of the Reddit-config DP step (bench helper).

Lowers the SAME fused DP training step the bench times (SAGE-256,
poisson-bandit, fanouts 4096/2048/1024, batch 256/device) over a virtual
8-device CPU mesh — entirely ABSTRACTLY (ShapeDtypeStruct leaves, no
arrays materialized) — then extracts every collective op and its byte
count from the lowered module (parallel/commstats.py).  Prints ONE JSON
line with the per-device per-step communication volume and the analytic
weak-scaling prediction inputs.

Run standalone:
  python scripts/comm_account.py '{"frontier": [...], "block_e": [...],
                                   "step_ms": 36.6}'
or let bench.py spawn it with the measured refit caps.

This is accounting, not measurement: the byte counts come from the real
compiled program's collectives; the time model (ring collectives at v5e
ICI bandwidth, no overlap) is in commstats.predicted_scaling_pct with
its arithmetic documented.
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    args = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    n_nodes = int(args.get("n_nodes", 232_965))
    n_edges = int(args.get("n_edges", 114_848_857))
    n_feats = int(args.get("n_feats", 602))
    step_ms = float(args.get("step_ms", 0.0))
    n_dev = 8

    from bliss_gnn_tpu.graph.structure import DeviceGraph
    from bliss_gnn_tpu.models.gnn import build_model
    from bliss_gnn_tpu.parallel.commstats import (
        collectives_from_text,
        comm_summary,
        predicted_scaling_pct,
    )
    from bliss_gnn_tpu.parallel.dp import make_dp_train_step
    from bliss_gnn_tpu.parallel.mesh import make_mesh
    from bliss_gnn_tpu.sampling.block import CapacityPlan
    from bliss_gnn_tpu.sampling.frontier import EDGE_PAD, GRID_W
    from bliss_gnn_tpu.sampling.samplers import SamplerConfig, sample_blocks
    from bliss_gnn_tpu.train.steps import TrainState, make_optimizer

    bs = 256
    cfg = SamplerConfig(kind="poisson-bandit", fanouts=(4096, 2048, 1024))
    plan = CapacityPlan.build(bs, cfg.fanouts, n_nodes, n_edges,
                              kind=cfg.kind)
    if "frontier" in args:
        import dataclasses

        plan = dataclasses.replace(
            plan,
            frontier_caps=tuple(args["frontier"]),
            block_e_caps=tuple(args["block_e"]),
        )

    S = jax.ShapeDtypeStruct
    ep = n_edges + EDGE_PAD
    rows = -(-n_edges // GRID_W)
    dummy = S((1,), jnp.int32)
    graph = DeviceGraph(
        n_nodes=n_nodes, n_edges=n_edges,
        csc_indptr=S((n_nodes + 1,), jnp.int32),
        csc_src=S((ep,), jnp.int32),
        csr_indptr=dummy, csr_dst=dummy, csr_eid=dummy,
        ndata=dict(features=S((n_nodes, n_feats), jnp.bfloat16),
                   labels=S((n_nodes,), jnp.int32)),
        edata=dict(w=S((ep,), jnp.bfloat16),
                   __grid__csc_src=S((rows, GRID_W), jnp.int32),
                   __grid__w=S((rows, GRID_W), jnp.bfloat16)),
    )
    R = -(-(n_edges + EDGE_PAD) // 128)
    exp3 = S((3, R, 128), jnp.bfloat16)
    key = S((2,), jnp.uint32)
    seeds_l = S((bs,), jnp.int32)
    mask_l = S((bs,), jnp.bool_)

    blocks, _ = jax.eval_shape(
        lambda k, s, m, g, e: sample_blocks(g, cfg, plan, k, s, m, e),
        key, seeds_l, mask_l, graph, exp3,
    )
    model = build_model("sage", 256, 41, 3)
    x = S((blocks[0].src_gids.shape[0], n_feats), jnp.bfloat16)
    params = jax.eval_shape(model.init, key, blocks, x)
    tx = make_optimizer(2e-3, 100)
    opt_state = jax.eval_shape(tx.init, params)
    state = TrainState(params=params, opt_state=opt_state,
                       exp3_weights=exp3, key=key,
                       step=S((), jnp.int32))

    mesh = make_mesh(n_dev)
    step = make_dp_train_step(mesh, graph, model, tx, cfg, plan, False)
    seeds = S((n_dev * bs,), jnp.int32)
    mask = S((n_dev * bs,), jnp.bool_)
    lowered = step.lower(state, seeds, mask, graph)
    entries = collectives_from_text(lowered.as_text())
    summ = comm_summary(entries, n_dev)
    out = {
        "dp_comm_bytes_per_step": int(summ["moved_bytes_per_device"]),
        "dp_collectives": summ["n_collectives"],
        "dp_largest_collective_bytes": summ["largest_collective_bytes"],
        "per_kind": {
            k: {"count": v["count"], "out_bytes": v["out_bytes"]}
            for k, v in summ["per_kind"].items()
        },
    }
    if step_ms > 0:
        out["dp_predicted_scaling_pct_8"] = round(
            predicted_scaling_pct(step_ms * 1e-3,
                                  summ["moved_bytes_per_device"]), 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
