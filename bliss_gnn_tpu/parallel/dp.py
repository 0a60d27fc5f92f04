"""Data-parallel fused training step over a device mesh (shard_map).

Design (SURVEY.md §5.8; no reference counterpart — the reference is strictly
single-device, train_lightning.py:648-650):

- the seed batch is sharded over the ``dp`` axis: each device samples its own
  blocks from the (replicated) graph with a device-folded PRNG key;
- gradients are ``psum``-averaged — standard seed-batch data parallelism;
- the EXP3 arm-weight state is replicated and kept *globally consistent* by
  all-gathering each shard's sparse update lists (eid, exponent) — a few KB
  per step — and applying every shard's multiplicative update everywhere.
  Multiplicative updates compose by scatter-mul, so devices touching the
  same edge compose exactly as sequential updates would (the reference's
  semantics is a single sequential stream; concurrent shards are the natural
  batched generalization, and the L1 normalization is computed identically
  on every device after combining);
- Adam runs redundantly-replicated on every device (identical inputs ->
  identical outputs), avoiding parameter broadcasts.

Edge-sharding of the graph itself (for graphs larger than one HBM) is the
next layer — see parallel/edgeshard.py.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from bliss_gnn_tpu.graph.structure import DeviceGraph
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import (
    SamplerConfig,
    apply_exp3_deltas,
    exp3_edge_deltas,
    sample_blocks,
)
from bliss_gnn_tpu.train.metrics import F1State, f1_update
from bliss_gnn_tpu.train.steps import TrainState, cross_entropy_loss


def make_dp_train_step(
    mesh: Mesh,
    graph: DeviceGraph,
    model,
    tx: optax.GradientTransformation,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    axis: str = "dp",
    exp3_normalize: bool = True,
) -> Callable[[TrainState, jax.Array, jax.Array], Tuple[TrainState, Dict]]:
    """Build the sharded fused step.

    The caller passes a GLOBAL seed batch of shape [n_dev * local_batch]
    (plan.batch_size is the LOCAL batch).  State and graph are replicated;
    the graph flows through as a shard_map argument (closed-over arrays
    become compile-payload constants — measured to blow up remote
    compilation at Reddit scale).
    """
    del graph  # bound at call time

    def local_step(state: TrainState, seeds, seeds_mask, graph: DeviceGraph):
        features = graph.ndata["features"]
        labels_all = graph.ndata["labels"]
        me = jax.lax.axis_index(axis)
        key, k_sample, k_drop = jax.random.split(state.key, 3)
        k_sample = jax.random.fold_in(k_sample, me)
        k_drop = jax.random.fold_in(k_drop, me)
        blocks, _ = sample_blocks(
            graph, sampler_cfg, plan, k_sample, seeds, seeds_mask,
            state.exp3_weights,
        )
        x = jnp.take(features, blocks[0].src_gids, axis=0)
        labels = jnp.take(labels_all, blocks[-1].dst_gids, axis=0)
        dst_mask = blocks[-1].dst_mask

        def loss_fn(params):
            logits, aux = model.apply(
                params, blocks, x, deterministic=False,
                rngs={"dropout": k_drop},
            )
            loss = cross_entropy_loss(logits, labels, dst_mask, multilabel)
            return loss, (logits, aux)

        (loss, (logits, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, axis)
        loss_g = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        if sampler_cfg.is_bandit:
            deltas = exp3_edge_deltas(
                graph, sampler_cfg, blocks, aux["embed_norms"], aux["a_ijs"]
            )
            # all-gather each layer's sparse update list across the dp axis;
            # every device then applies every shard's update -> replicated,
            # globally consistent arm weights
            gathered = [
                (
                    jax.lax.all_gather(eid, axis),
                    jax.lax.all_gather(dr, axis),
                )
                for (eid, dr) in deltas
            ]
            exp3 = apply_exp3_deltas(
                state.exp3_weights, gathered, normalize=exp3_normalize
            )
        else:
            exp3 = state.exp3_weights

        f1 = f1_update(F1State.zero(), logits, labels, dst_mask, multilabel)
        f1 = jax.tree.map(lambda v: jax.lax.psum(v, axis), f1)
        metrics = {"train_loss": loss_g, "f1": f1}
        for i, b in enumerate(blocks):
            metrics[f"num_nodes/{i}"] = jax.lax.psum(b.num_src(), axis)
            metrics[f"num_edges/{i}"] = jax.lax.psum(b.num_edges(), axis)
        metrics[f"num_nodes/{len(blocks)}"] = jax.lax.psum(
            blocks[-1].num_dst(), axis
        )
        new_state = TrainState(
            params=params, opt_state=opt_state, exp3_weights=exp3,
            key=key, step=state.step + 1,
        )
        return new_state, metrics

    from jax import shard_map

    step_fn = shard_map(
        local_step,
        mesh=mesh,
        # P() broadcasts over every leaf of a pytree argument: state and
        # graph stay replicated, seeds/mask split over the dp axis
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step_fn, donate_argnums=(0,))
