"""Data-parallel fused training/eval steps over a device mesh (shard_map).

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

The per-device body is train.steps._make_step_fn(dp_axis=...) — the SAME
code path as the single-device fused step, so metrics/stat names (and the
capacity-refit inputs) are identical; the Trainer consumes either
interchangeably.

Edge-sharding of the graph itself (for graphs larger than one HBM) is
parallel/edgeshard.py (full-graph aggregation) and parallel/sampled
training in parallel/shardedstep.py.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import optax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from bliss_gnn_tpu.graph.structure import DeviceGraph
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import SamplerConfig
from bliss_gnn_tpu.train.steps import TrainState, _make_eval_fn, _make_step_fn


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
    local_step = _make_step_fn(
        graph, model, tx, sampler_cfg, plan, multilabel,
        dp_axis=axis, exp3_normalize=exp3_normalize,
    )
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


def make_dp_multi_train_step(
    mesh: Mesh,
    graph: DeviceGraph,
    model,
    tx: optax.GradientTransformation,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    n_steps: int,
    axis: str = "dp",
    exp3_normalize: bool = True,
) -> Callable:
    """Chain ``n_steps`` DP steps inside one jitted lax.scan dispatch
    (steps.make_multi_train_step over the sharded body): seeds/masks are
    [n_steps, n_dev * local_batch]; metrics come back stacked [n_steps, ...].
    """
    single = _make_step_fn(
        graph, model, tx, sampler_cfg, plan, multilabel,
        dp_axis=axis, exp3_normalize=exp3_normalize,
    )

    def multi(state: TrainState, seeds, seeds_mask, graph: DeviceGraph):
        def body(st, xs):
            s, m = xs
            return single(st, s, m, graph)

        return jax.lax.scan(body, state, (seeds, seeds_mask))

    from jax import shard_map

    step_fn = shard_map(
        multi,
        mesh=mesh,
        # the leading scan axis is unsharded; axis 1 (the global batch)
        # splits over dp
        in_specs=(P(), P(None, axis), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step_fn, donate_argnums=(0,))


def make_dp_multi_eval_step(
    mesh: Mesh,
    model,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    axis: str = "dp",
) -> Callable:
    """Scan-chained DP validation: seeds/masks [K, n_dev * local_batch],
    one dispatch for K sampled val batches (steps._make_multi_eval_fn
    under shard_map); returns psum-reduced (f1, loss*n, n, carry_key)."""
    from jax import shard_map

    from bliss_gnn_tpu.train.steps import _make_multi_eval_fn

    fn = shard_map(
        _make_multi_eval_fn(model, sampler_cfg, plan, multilabel,
                            dp_axis=axis),
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P(None, axis), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_dp_eval_step(
    mesh: Mesh,
    model,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    axis: str = "dp",
) -> Callable:
    """Sharded sampled-validation step: each device evaluates its seed shard
    with a device-folded key; returns globally psum-reduced
    (f1, loss*n, n) — same contract as steps.make_eval_step."""
    local_eval = _make_eval_fn(
        model, sampler_cfg, plan, multilabel, dp_axis=axis
    )
    from jax import shard_map

    fn = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
