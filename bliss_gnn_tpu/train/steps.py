"""Fused training / evaluation steps.

The reference's per-step critical path spans three host-coordinated phases
(SURVEY.md §3.2-3.3): DGL dataloader sampling (possibly in worker
processes), the Lightning forward/backward, and the bandit update in a
callback — with up to 50 host syncs per layer inside Poisson scaling.  Here
the entire step is ONE jitted device program:

    (state, seed_batch) -> (state', metrics)
      = sample_blocks  ->  gather features  ->  forward  ->  loss/grad
        ->  adam update  ->  EXP3 reward + arm-weight update

State is a donated pytree, so the EXP3 buffers (L x E) update in place in
HBM.  No host round-trips; the sampler consumes the *current* arm weights
and the update runs post-backward, exactly like the reference's
on_train_batch_end ordering (train_lightning.py:463-471).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from bliss_gnn_tpu.graph.structure import DeviceGraph
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import (
    SamplerConfig,
    apply_exp3_deltas,
    exp3_edge_deltas,
    exp3_update,
    sample_blocks,
)
from bliss_gnn_tpu.train.metrics import F1State, f1_update


class StepStorage:
    """How the step body reads node rows and owns the EXP3 state.

    The default is single-buffer HBM residency (the graph/features/EXP3
    state fully resident, possibly replicated per device under DP).
    parallel/shardedstep.py substitutes edge/node-range sharded storage —
    same step semantics, O(E/S + N/S) per-device memory."""

    def node_rows(self, graph, name: str, gids: jax.Array) -> jax.Array:
        return jnp.take(graph.ndata[name], gids, axis=0)

    def exp3_view(self, exp3):
        """What sample_blocks / exp3_row consume as the arm-weight state."""
        return exp3

    def sync_deltas(self, deltas, dp_axis):
        """Under DP, all-gather each shard's sparse (eid, exponent) lists
        (a few KB/step) so every holder of the state applies every
        shard's multiplicative update."""
        if dp_axis is None:
            return deltas
        return [
            (
                jax.lax.all_gather(eid, dp_axis),
                jax.lax.all_gather(dr, dp_axis),
            )
            for (eid, dr) in deltas
        ]

    def apply_deltas(self, exp3, deltas, normalize: bool):
        """Returns (exp3', n_overflow) — overflow counts updates the
        streaming kernel skipped (ops/exp3_pallas.py; 0 on the exact
        XLA/sharded paths), surfaced as the exp3_apply_overflow metric."""
        return apply_exp3_deltas(exp3, deltas, normalize=normalize,
                                 return_overflow=True)


_DEFAULT_STORAGE = StepStorage()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """The full per-run device state — checkpointable as one pytree.

    Unlike the reference (which never checkpoints the EXP3 state, SURVEY.md
    §5.4), this carries {params, opt_state, exp3_weights, prng_key, step}.
    """

    params: Any
    opt_state: Any
    exp3_weights: Optional[jax.Array]
    key: jax.Array
    step: jax.Array


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, mask: jax.Array, multilabel: bool
) -> jax.Array:
    """CE for multiclass, mean-reduced BCE-with-logits for multilabel
    (train_lightning.py:77-79), masked over padded dst slots."""
    logits = logits.astype(jnp.float32)
    if multilabel:
        per = optax.sigmoid_binary_cross_entropy(logits, labels).mean(axis=-1)
    else:
        per = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        )
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, per, 0.0)) / denom


def _block_count_metrics(blocks) -> Dict[str, jax.Array]:
    """Per-layer sampled node/edge counts (the num_nodes/{i}, num_edges/{i}
    series, train_lightning.py:104-136)."""
    out = {}
    for i, b in enumerate(blocks):
        out[f"num_nodes/{i}"] = b.num_src()
        out[f"num_edges/{i}"] = b.num_edges()
    out[f"num_nodes/{len(blocks)}"] = blocks[-1].num_dst()
    return out


def make_train_step(
    graph: DeviceGraph,
    model,
    tx: optax.GradientTransformation,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    donate: bool = True,
) -> Callable[[TrainState, jax.Array, jax.Array], Tuple[TrainState, Dict]]:
    """Build the fused jitted train step.

    The graph is an ARGUMENT of the jitted function, not a closure: closed-
    over arrays become compile-payload constants (hundreds of MB at Reddit
    scale — measured to blow up remote compilation).  The returned callable
    still has the (state, seeds, mask) signature; the graph rides along via
    a default-bound pytree argument."""
    step = _make_step_fn(graph, model, tx, sampler_cfg, plan, multilabel)
    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def bound(state, seeds, seeds_mask, graph):
        return jitted(state, seeds, seeds_mask, graph)

    return bound


def make_eval_step(
    graph: DeviceGraph,
    model,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
) -> Callable:
    """Sampled validation step: same sampler consuming the current arm
    weights, NO exp3 update (SURVEY.md §3.5).  Returns (f1_delta, loss,
    n_valid) so the caller can accumulate epoch metrics.  As with the train
    step, the graph is a jit argument (no giant closure constants)."""
    del graph
    return jax.jit(
        _make_eval_fn(model, sampler_cfg, plan, multilabel)
    )


def _make_eval_fn(model, sampler_cfg, plan, multilabel,
                  dp_axis: Optional[str] = None,
                  storage: Optional[StepStorage] = None):
    """The raw eval body; with ``dp_axis`` each device samples/evaluates its
    seed shard (device-folded key) and the (f1, loss*n, n) tuple is
    psum-reduced — the sharded half of parallel.dp.make_dp_eval_step."""
    storage = storage or _DEFAULT_STORAGE

    def step(state: TrainState, key: jax.Array, seeds, seeds_mask,
             graph: DeviceGraph):
        if dp_axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(dp_axis))
        blocks, _ = sample_blocks(
            graph, sampler_cfg, plan, key, seeds, seeds_mask,
            storage.exp3_view(state.exp3_weights),
        )
        x = storage.node_rows(graph, "features", blocks[0].src_gids)
        labels = storage.node_rows(graph, "labels", blocks[-1].dst_gids)
        dst_mask = blocks[-1].dst_mask
        logits, _ = model.apply(state.params, blocks, x, deterministic=True)
        loss = cross_entropy_loss(logits, labels, dst_mask, multilabel)
        f1 = f1_update(F1State.zero(), logits, labels, dst_mask, multilabel)
        n = jnp.sum(dst_mask)
        out = (f1, loss * n, n)
        if dp_axis is not None:
            out = jax.tree.map(lambda v: jax.lax.psum(v, dp_axis), out)
        return out

    return step


def _make_multi_eval_fn(model, sampler_cfg, plan, multilabel, dp_axis=None,
                        storage=None):
    """Scan-chained eval body: K sampled validation batches per dispatch.

    Epoch validation otherwise pays one dispatch round-trip per batch
    (~33 ms through this environment's tunnel — more than the eval itself
    on small configs).  The key chain replicates the unchained loop's
    ``key, sub = split(key)`` sequence exactly, so accumulated
    (f1, loss*n, n) equal the per-batch loop's sums bit-for-bit."""
    single = _make_eval_fn(model, sampler_cfg, plan, multilabel,
                           dp_axis=dp_axis, storage=storage)

    def multi(state: TrainState, key, seeds, seeds_mask, graph):
        def body(carry, xs):
            key, f1, ln, n = carry
            s, m = xs
            key, sub = jax.random.split(key)
            df1, dln, dn = single(state, sub, s, m, graph)
            f1 = jax.tree.map(lambda a, b: a + b, f1, df1)
            return (key, f1, ln + dln, n + dn), None

        z = (key, F1State.zero(), jnp.zeros((), jnp.float32),
             jnp.zeros((), jnp.int32))
        (key, f1, ln, n), _ = jax.lax.scan(
            body, z, (seeds, seeds_mask)
        )
        # the carry key comes back so unchained tail batches continue the
        # exact split sequence (metric equality with the per-batch loop)
        return f1, ln, n, key

    return multi


def make_multi_eval_step(model, sampler_cfg, plan, multilabel):
    """Single-device chained validation (seeds/masks [K, B])."""
    return jax.jit(
        _make_multi_eval_fn(model, sampler_cfg, plan, multilabel)
    )


def make_multi_train_step(
    graph: DeviceGraph,
    model,
    tx: optax.GradientTransformation,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    n_steps: int,
) -> Callable:
    """Chain ``n_steps`` fused train steps inside one jitted ``lax.scan``
    (one dispatch per chain).  Dispatch latency is dead time the reference
    pays per DataLoader batch; on TPU one scan amortizes it to ~zero —
    through this environment's tunnel each dispatch costs ~33 ms, i.e.
    more than a whole small-config step.

    seeds/masks are [n_steps, B]; returns (state', metrics stacked
    [n_steps, ...])."""
    single = _make_step_fn(graph, model, tx, sampler_cfg, plan, multilabel)

    def multi(state: TrainState, seeds, seeds_mask, graph: DeviceGraph):
        def body(st, xs):
            s, m = xs
            st2, metrics = single(st, s, m, graph)
            return st2, metrics

        return jax.lax.scan(body, state, (seeds, seeds_mask))

    return jax.jit(multi, donate_argnums=(0,))


def _make_step_fn(graph, model, tx, sampler_cfg, plan, multilabel,
                  dp_axis: Optional[str] = None,
                  exp3_normalize: bool = False,
                  storage: Optional[StepStorage] = None):
    """The raw (untraced) fused step body shared by make_train_step,
    make_multi_train_step, and (under shard_map) parallel.dp's
    make_dp_train_step.

    With ``dp_axis`` set the body is the per-device half of seed-batch data
    parallelism (SURVEY.md §5.8; no reference counterpart — the reference is
    strictly single-device, train_lightning.py:648-650):
    - the PRNG keys are folded by device index (independent sampling);
    - gradients/loss are ``pmean``-averaged; Adam then runs redundantly-
      replicated (identical inputs -> identical outputs, no broadcasts);
    - the EXP3 arm weights stay *globally consistent* by all-gathering each
      shard's sparse update list (eid, exponent) — a few KB/step — and
      applying every shard's multiplicative update everywhere (multiplicative
      updates compose by scatter-mul exactly as a sequential stream would);
    - count/F1 metrics are ``psum``-reduced; the refit-input maxima
      (frontier_edges / n_block_edges_true) are ``pmax``-reduced so the
      capacity refit sees the worst shard.
    """
    del graph
    storage = storage or _DEFAULT_STORAGE

    def step(state: TrainState, seeds, seeds_mask, graph: DeviceGraph):
        key, k_sample, k_drop = jax.random.split(state.key, 3)
        if dp_axis is not None:
            me = jax.lax.axis_index(dp_axis)
            k_sample = jax.random.fold_in(k_sample, me)
            k_drop = jax.random.fold_in(k_drop, me)
        blocks, samp_stats = sample_blocks(
            graph, sampler_cfg, plan, k_sample, seeds, seeds_mask,
            storage.exp3_view(state.exp3_weights),
        )
        x = storage.node_rows(graph, "features", blocks[0].src_gids)
        labels = storage.node_rows(graph, "labels", blocks[-1].dst_gids)
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
        if dp_axis is not None:
            grads = jax.lax.pmean(grads, dp_axis)
            loss = jax.lax.pmean(loss, dp_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if sampler_cfg.is_bandit and not sampler_cfg.exp3_freeze:
            # normalize=False (default): consumers renormalize per dst, so
            # the L1 row normalization is deferred to the Trainer's periodic
            # renormalize (exp3_renorm_every) — see apply_exp3_deltas
            deltas = exp3_edge_deltas(
                graph, sampler_cfg, blocks, aux["embed_norms"], aux["a_ijs"]
            )
            deltas = storage.sync_deltas(deltas, dp_axis)
            exp3, exp3_over = storage.apply_deltas(
                state.exp3_weights, deltas, exp3_normalize
            )
        else:
            exp3 = state.exp3_weights
            exp3_over = jnp.zeros((), jnp.int32)
        f1 = f1_update(F1State.zero(), logits, labels, dst_mask, multilabel)
        metrics = {
            "train_loss": loss,
            "f1": f1,
            "exp3_apply_overflow": exp3_over,
            **_block_count_metrics(blocks),
            # overflow counters + the measured sizes the capacity refit needs
            **{
                k: v
                for k, v in samp_stats.items()
                if "overflow" in k
                or "frontier_edges" in k
                or "n_block_edges_true" in k
            },
        }
        if dp_axis is not None:
            for k in list(metrics):
                if k == "train_loss":
                    continue
                if "frontier_edges" in k or "n_block_edges_true" in k:
                    metrics[k] = jax.lax.pmax(metrics[k], dp_axis)
                else:  # counts, overflow counters, F1 state: global totals
                    metrics[k] = jax.tree.map(
                        lambda v: jax.lax.psum(v, dp_axis), metrics[k]
                    )
        new_state = TrainState(
            params=params, opt_state=opt_state, exp3_weights=exp3,
            key=key, step=state.step + 1,
        )
        return new_state, metrics

    return step


def make_uva_steps(
    model,
    tx: optax.GradientTransformation,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    mesh=None,
    axis: str = "dp",
    storage: Optional[StepStorage] = None,
):
    """Split steps for host-resident features (the UVA/gpu_cache analog,
    train_lightning.py:376-380,:394 — see graph/featurecache.py).

    The fused step assumes features live in HBM; at papers100M scale they
    don't fit, so the step splits at the one unavoidable host boundary:

        sample_fn (jit)  ->  FeatureCache.gather (host fetch of misses)
        ->  train_fn / eval_fn (jit, takes the gathered [B, F] block)

    Returns (sample_fn, train_fn, eval_fn).  Sampling still runs fully
    on device; only the feature rows cross the host boundary.

    With ``mesh`` the three functions run under shard_map over ``axis``:
    each device samples its seed shard (device-folded keys), blocks come
    back mesh-STACKED (leading dim = shard) for the host feature gather,
    and train_fn applies the usual DP reductions (pmean'd grads,
    all-gathered sparse EXP3 deltas, psum'd metrics — same contract as
    parallel.dp.make_dp_train_step).  ``storage`` may supply sharded label
    residency (graph sharding × UVA: parallel/shardedstep.py).
    """
    dp_axis = axis if mesh is not None else None
    storage = storage or _DEFAULT_STORAGE

    def sample_fn(state: TrainState, seeds, seeds_mask, graph):
        key, k_sample, k_drop = jax.random.split(state.key, 3)
        if dp_axis is not None:
            k_sample = jax.random.fold_in(
                k_sample, jax.lax.axis_index(dp_axis)
            )
        blocks, samp_stats = sample_blocks(
            graph, sampler_cfg, plan, k_sample, seeds, seeds_mask,
            storage.exp3_view(state.exp3_weights),
        )
        if dp_axis is not None:
            for k in list(samp_stats):
                if "frontier_edges" in k or "n_block_edges_true" in k:
                    samp_stats[k] = jax.lax.pmax(samp_stats[k], dp_axis)
                else:
                    samp_stats[k] = jax.lax.psum(samp_stats[k], dp_axis)
        return blocks, samp_stats, k_drop, key

    def train_fn(state: TrainState, blocks, x, k_drop, key, graph):
        if dp_axis is not None:
            k_drop = jax.random.fold_in(k_drop, jax.lax.axis_index(dp_axis))
        labels = storage.node_rows(graph, "labels", blocks[-1].dst_gids)
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
        if dp_axis is not None:
            grads = jax.lax.pmean(grads, dp_axis)
            loss = jax.lax.pmean(loss, dp_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if sampler_cfg.is_bandit:
            # normalize=False: consumers renormalize per dst, so the L1 row
            # normalization is deferred to the Trainer's periodic
            # renormalize (exp3_renorm_every) — see apply_exp3_deltas
            deltas = exp3_edge_deltas(
                graph, sampler_cfg, blocks, aux["embed_norms"], aux["a_ijs"]
            )
            deltas = storage.sync_deltas(deltas, dp_axis)
            exp3, _ = storage.apply_deltas(state.exp3_weights, deltas, False)
        else:
            exp3 = state.exp3_weights
        f1 = f1_update(F1State.zero(), logits, labels, dst_mask, multilabel)
        metrics = {
            "train_loss": loss,
            "f1": f1,
            **_block_count_metrics(blocks),
        }
        if dp_axis is not None:
            for k in list(metrics):
                if k != "train_loss":
                    metrics[k] = jax.tree.map(
                        lambda v: jax.lax.psum(v, dp_axis), metrics[k]
                    )
        new_state = TrainState(
            params=params, opt_state=opt_state, exp3_weights=exp3,
            key=key, step=state.step + 1,
        )
        return new_state, metrics

    def eval_fn(state: TrainState, blocks, x, graph):
        labels = storage.node_rows(graph, "labels", blocks[-1].dst_gids)
        dst_mask = blocks[-1].dst_mask
        logits, _ = model.apply(state.params, blocks, x, deterministic=True)
        loss = cross_entropy_loss(logits, labels, dst_mask, multilabel)
        f1 = f1_update(F1State.zero(), logits, labels, dst_mask, multilabel)
        n = jnp.sum(dst_mask)
        out = (f1, loss * n, n)
        if dp_axis is not None:
            out = jax.tree.map(lambda v: jax.lax.psum(v, dp_axis), out)
        return out

    if mesh is None:
        return (
            jax.jit(sample_fn),
            jax.jit(train_fn, donate_argnums=(0,)),
            jax.jit(eval_fn),
        )

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if type(storage) is StepStorage:  # replicated DeviceGraph under DP
        graph_spec = P()
        state_spec = P()

        def view(g):
            return g
    else:  # graph sharding x UVA (parallel/shardedstep.py ShardedStorage)
        from bliss_gnn_tpu.parallel.shardedstep import (
            _LocalView,
            _state_spec,
        )

        graph_spec = "sharded"  # resolved per sgraph arg below
        state_spec = _state_spec(axis, sampler_cfg.is_bandit)

        def view(sg):
            return _LocalView(sg, axis)

    def wrap(fn, in_specs, out_specs, donate=False):
        def body(*args):
            *rest, g = args
            return fn(*rest, view(g))

        def dispatch(*args):
            gs = (args[-1].specs(axis) if graph_spec == "sharded"
                  else graph_spec)
            m = shard_map(
                body, mesh=mesh, in_specs=(*in_specs, gs),
                out_specs=out_specs, check_vma=False,
            )
            return m(*args)

        return jax.jit(dispatch, donate_argnums=(0,) if donate else ())

    blocks_spec = P(axis)  # every Block leaf gains a leading shard dim
    s_fn = wrap(sample_fn, (state_spec, P(axis), P(axis)),
                (blocks_spec, P(), P(), P()))
    t_fn = wrap(train_fn,
                (state_spec, blocks_spec, P(axis), P(), P()),
                (state_spec, P()), donate=True)
    e_fn = wrap(eval_fn, (state_spec, blocks_spec, P(axis)),
                (P(), P(), P()))
    return s_fn, t_fn, e_fn


def make_optimizer(
    lr: float, steps_per_epoch: int, gamma: float = 0.01, step_size: int = 5
) -> optax.GradientTransformation:
    """Adam + StepLR(gamma=0.01, step_size=5 epochs)
    (train_lightning.py:205-216), as a staircase exponential decay."""
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=max(1, step_size * steps_per_epoch),
        decay_rate=gamma,
        staircase=True,
    )
    return optax.adam(schedule)
