"""Edge-partitioned SAMPLED training: graph, features, and EXP3 state
sharded over the mesh — graphs beyond one HBM.

The north-star design of SURVEY.md §5.8 (no reference counterpart — the
reference replicates the DGL graph and is single-device,
train_lightning.py:648-650; its EXP3 semantics anchor is the single global
weight row per layer, bandit_sampler.py:248-249):

- device s owns node range [s*npr, (s+1)*npr) and — because canonical edge
  ids are CSC (dst-grouped) order — the contiguous edge range
  [s*epr, (s+1)*epr): its ``csc_src`` slice, its normalized-weight slice,
  and its EXP3 arm-weight rows.  Features/labels shard by the node range.
  Per-device memory: O(E/S + N/S).  Only ``csc_indptr`` ([N+1] int32) stays
  replicated.
- the seed batch shards over the same axis (seed-batch data parallelism),
  and every read of remote graph data happens through the distributed
  row gather of parallel/shards.py: all_gather the int32 row requests,
  serve locally-owned rows, one reduce-scatter returns exactly the
  requested rows.  The boundary-feature exchange is therefore on-demand
  and sized to the sampled working set, not the partition boundary.
- EXP3 updates stay sparse: each shard's (eid, exponent) lists are
  all-gathered (a few KB/step) and every device applies exactly the
  updates whose edges it owns — disjoint support across shards, so there
  is no state all-gather and no averaging.

Numerical contract: with the same PRNG and seed shards, this step is
equivalent to parallel.dp.make_dp_train_step with replicated storage (the
distributed row gather returns identical values; reductions are exact
because exactly one shard serves each row) — proven on the CPU mesh in
tests/test_shardedstep.py.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from bliss_gnn_tpu.graph.structure import Graph
from bliss_gnn_tpu.parallel.shards import (
    EShard,
    ShardedExp3,
    apply_exp3_deltas_sharded,
    edges_per_shard,
    normalize_exp3_sharded,
    round_up,
    sharded_node_rows,
)
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import SamplerConfig
from bliss_gnn_tpu.train.steps import (
    StepStorage,
    TrainState,
    _make_eval_fn,
    _make_step_fn,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedDeviceGraph:
    """Mesh-stacked graph storage (leading dim = shard; shard over P(axis)).

    The sharded analog of graph.structure.DeviceGraph for the sampled
    training path.  ``csc_indptr`` is replicated; everything edge- or
    node-indexed is a [S, ...] stack of contiguous-range shards.
    """

    csc_indptr: jax.Array  # [N+1] replicated, or [S, npr] when shard_indptr
    csc_src_sh: jax.Array  # [S, epr] int32, zero-padded
    w_sh: jax.Array  # [S, epr] normalized edge weight, zero-padded
    features_sh: jax.Array  # [S, npr, F]
    labels_sh: jax.Array  # [S, npr] or [S, npr, C]
    n_nodes: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_edges: int = dataclasses.field(metadata=dict(static=True), default=0)
    epr: int = dataclasses.field(metadata=dict(static=True), default=0)
    npr: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_shards: int = dataclasses.field(metadata=dict(static=True), default=0)
    # shard the [N+1] indptr by the same contiguous node ranges (served
    # through the NShard distributed gather).  ~1 MB replicated at Reddit
    # scale (leave off); ~450 MB/device at papers100M (turn on).
    shard_indptr: bool = dataclasses.field(metadata=dict(static=True),
                                           default=False)

    @staticmethod
    def build(
        g: Graph, n_shards: int, feature_dtype=jnp.bfloat16,
        shard_indptr: bool = False, include_features: bool = True,
    ) -> "ShardedDeviceGraph":
        """Host-side partitioner.  Edge ranges are equal-size slices of the
        canonical (CSC) edge order — contiguous dst ranges fall out of the
        same cut, so no permutation or bucketing is needed."""
        S = n_shards
        epr = edges_per_shard(g.n_edges, S)
        # +1 so the indptr's final [N] entry fits inside the node shards
        npr = round_up(g.n_nodes + 1, S * 8) // S

        def shard_e(a: np.ndarray, dtype) -> np.ndarray:
            out = np.zeros((S * epr,) + a.shape[1:], dtype)
            out[: a.shape[0]] = a
            return out.reshape((S, epr) + a.shape[1:])

        def shard_n(a: np.ndarray, dtype) -> np.ndarray:
            out = np.zeros((S * npr,) + a.shape[1:], dtype)
            out[: a.shape[0]] = a
            return out.reshape((S, npr) + a.shape[1:])

        indptr = np.asarray(g.csc_indptr, np.int32)
        labels = np.asarray(g.ndata["labels"])
        if include_features:
            feats = np.asarray(g.ndata["features"])
            features_sh = jnp.asarray(
                shard_n(feats, feats.dtype), feature_dtype
            )
        else:
            # graph sharding x UVA: features stay host-resident (served by
            # graph/featurecache.py through the split UVA steps); the
            # device shards carry a [S, 1, 1] placeholder
            features_sh = jnp.zeros((S, 1, 1), feature_dtype)
        return ShardedDeviceGraph(
            csc_indptr=jnp.asarray(
                shard_n(indptr, np.int32) if shard_indptr else indptr
            ),
            csc_src_sh=jnp.asarray(shard_e(g.csc_src, np.int32)),
            w_sh=jnp.asarray(shard_e(
                np.asarray(g.edata["w"], np.float32), np.float32
            )),
            features_sh=features_sh,
            labels_sh=jnp.asarray(shard_n(labels, labels.dtype)),
            n_nodes=g.n_nodes, n_edges=g.n_edges,
            epr=epr, npr=npr, n_shards=S, shard_indptr=shard_indptr,
        )

    def specs(self, axis: str) -> "ShardedDeviceGraph":
        """The shard_map in/out spec pytree for this graph."""
        return dataclasses.replace(
            self,
            csc_indptr=P(axis) if self.shard_indptr else P(),
            csc_src_sh=P(axis), w_sh=P(axis),
            features_sh=P(axis), labels_sh=P(axis),
        )


class _LocalView:
    """Per-device DeviceGraph facade built inside the shard_map body: the
    sampler sees the usual attribute surface (csc_indptr/csc_src/edata/
    n_nodes), with edge-indexed arrays wrapped as EShard handles so
    frontier_gather transparently serves them over the mesh."""

    def __init__(self, sg: ShardedDeviceGraph, axis: str):
        if sg.shard_indptr:
            from bliss_gnn_tpu.parallel.shards import NShard

            self.csc_indptr = NShard(sg.csc_indptr[0], axis=axis, npr=sg.npr)
        else:
            self.csc_indptr = sg.csc_indptr
        self.csc_src = EShard(sg.csc_src_sh[0], axis=axis, epr=sg.epr)
        self.edata = {"w": EShard(sg.w_sh[0], axis=axis, epr=sg.epr)}
        self.features_local = sg.features_sh[0]
        self.labels_local = sg.labels_sh[0]
        self.n_nodes = sg.n_nodes
        self.n_edges = sg.n_edges


class ShardedStorage(StepStorage):
    """StepStorage over edge/node-range sharded state (parallel/shards.py)."""

    def __init__(self, axis: str, epr: int, npr: int, n_layers: int):
        self.axis, self.epr, self.npr, self.n_layers = axis, epr, npr, n_layers

    def node_rows(self, graph: _LocalView, name: str, gids):
        local = (
            graph.features_local if name == "features"
            else graph.labels_local
        )
        return sharded_node_rows(local, gids, self.axis, self.npr)

    def exp3_view(self, exp3):
        if exp3 is None:
            return None
        return ShardedExp3(
            exp3.reshape(-1), axis=self.axis, epr=self.epr,
            n_layers=self.n_layers,
        )

    def apply_deltas(self, exp3, deltas, normalize: bool):
        me = jax.lax.axis_index(self.axis)
        out = apply_exp3_deltas_sharded(
            exp3.reshape(-1), deltas, me, self.epr, self.n_layers
        )
        if normalize:
            out = normalize_exp3_sharded(
                out, self.n_layers, self.epr, self.axis
            )
        return (out.reshape(exp3.shape),
                jnp.zeros((), jnp.int32))  # sharded path applies exactly


def _state_spec(axis: str, bandit: bool) -> TrainState:
    return TrainState(
        params=P(), opt_state=P(),
        exp3_weights=P(axis) if bandit else P(),
        key=P(), step=P(),
    )


def make_sharded_train_step(
    mesh: Mesh,
    sgraph: ShardedDeviceGraph,
    model,
    tx,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    axis: str = "dp",
    exp3_normalize: bool = False,
) -> Callable:
    """The fused sampled train step over sharded storage.

    Signature matches parallel.dp.make_dp_train_step: (state, global seeds
    [S * local_batch], mask, sharded_graph) -> (state', metrics), with
    ``state.exp3_weights`` in the stacked [S, L*epr+1] layout
    (:func:`shard_exp3`).  Grads psum, metrics psum/pmax — identical
    reductions to the replicated DP step."""
    storage = ShardedStorage(axis, sgraph.epr, sgraph.npr, sampler_cfg.n_layers)
    local_step = _make_step_fn(
        None, model, tx, sampler_cfg, plan, multilabel,
        dp_axis=axis, exp3_normalize=exp3_normalize, storage=storage,
    )

    def body(state, seeds, seeds_mask, sg):
        return local_step(state, seeds, seeds_mask, _LocalView(sg, axis))

    from jax import shard_map

    spec = _state_spec(axis, sampler_cfg.is_bandit)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, P(axis), P(axis), sgraph.specs(axis)),
        out_specs=(spec, P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def make_sharded_multi_train_step(
    mesh: Mesh,
    sgraph: ShardedDeviceGraph,
    model,
    tx,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    n_steps: int,
    axis: str = "dp",
    exp3_normalize: bool = False,
) -> Callable:
    """n_steps sharded steps chained in one lax.scan dispatch (seeds/masks
    [n_steps, S * local_batch]; metrics stacked [n_steps, ...])."""
    storage = ShardedStorage(axis, sgraph.epr, sgraph.npr, sampler_cfg.n_layers)
    single = _make_step_fn(
        None, model, tx, sampler_cfg, plan, multilabel,
        dp_axis=axis, exp3_normalize=exp3_normalize, storage=storage,
    )

    def body(state, seeds, seeds_mask, sg):
        view = _LocalView(sg, axis)

        def one(st, xs):
            s, m = xs
            return single(st, s, m, view)

        return jax.lax.scan(one, state, (seeds, seeds_mask))

    from jax import shard_map

    spec = _state_spec(axis, sampler_cfg.is_bandit)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, P(None, axis), P(None, axis), sgraph.specs(axis)),
        out_specs=(spec, P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def make_sharded_eval_step(
    mesh: Mesh,
    sgraph: ShardedDeviceGraph,
    model,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    axis: str = "dp",
) -> Callable:
    """Sharded sampled-validation step — same contract as
    parallel.dp.make_dp_eval_step (psum-reduced (f1, loss*n, n))."""
    storage = ShardedStorage(axis, sgraph.epr, sgraph.npr, sampler_cfg.n_layers)
    local_eval = _make_eval_fn(
        model, sampler_cfg, plan, multilabel, dp_axis=axis, storage=storage,
    )

    def body(state, key, seeds, seeds_mask, sg):
        return local_eval(state, key, seeds, seeds_mask, _LocalView(sg, axis))

    from jax import shard_map

    spec = _state_spec(axis, sampler_cfg.is_bandit)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, P(), P(axis), P(axis), sgraph.specs(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_multi_eval_step(
    mesh: Mesh,
    sgraph: ShardedDeviceGraph,
    model,
    sampler_cfg: SamplerConfig,
    plan: CapacityPlan,
    multilabel: bool,
    axis: str = "dp",
) -> Callable:
    """Scan-chained sharded validation (seeds/masks [K, S * local_batch]) —
    the graph-sharded sibling of parallel.dp.make_dp_multi_eval_step."""
    from bliss_gnn_tpu.train.steps import _make_multi_eval_fn

    storage = ShardedStorage(axis, sgraph.epr, sgraph.npr, sampler_cfg.n_layers)
    local = _make_multi_eval_fn(
        model, sampler_cfg, plan, multilabel, dp_axis=axis, storage=storage,
    )

    def body(state, key, seeds, seeds_mask, sg):
        return local(state, key, seeds, seeds_mask, _LocalView(sg, axis))

    from jax import shard_map

    spec = _state_spec(axis, sampler_cfg.is_bandit)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, P(), P(None, axis), P(None, axis),
                  sgraph.specs(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_renorm(
    mesh: Mesh, n_layers: int, epr: int, axis: str = "dp"
) -> Callable:
    """Jitted periodic L1 renorm over the stacked sharded EXP3 state
    (the Trainer's exp3_renorm_every hook under graph sharding)."""
    from jax import shard_map

    def body(ex):  # [1, L*epr+1] local
        return normalize_exp3_sharded(
            ex.reshape(-1), n_layers, epr, axis
        ).reshape(ex.shape)

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# EXP3 state layout conversions (canonical flat <-> mesh-stacked shards)
# ---------------------------------------------------------------------------


def shard_exp3(
    flat: jax.Array, n_layers: int, n_edges: int, n_shards: int
) -> jax.Array:
    """Canonical state (init_exp3_weights: [L, R, 128] grid — legacy flat
    layer-major rows also accepted) -> mesh-stacked [S, L*epr + 1]
    (per-shard flat rows + dump slot)."""
    S, L = n_shards, n_layers
    epr = edges_per_shard(n_edges, S)
    rows = np.asarray(flat).reshape(L, -1)
    row_len = rows.shape[1]
    padded = np.zeros((L, S * epr), rows.dtype)
    k = min(row_len, S * epr)
    padded[:, :k] = rows[:, :k]
    out = np.zeros((S, L * epr + 1), rows.dtype)
    for s in range(S):
        out[s, : L * epr] = padded[:, s * epr:(s + 1) * epr].reshape(-1)
    return jnp.asarray(out)


def unshard_exp3(
    stacked: jax.Array, n_layers: int, n_edges: int
) -> jax.Array:
    """Mesh-stacked [S, L*epr + 1] -> canonical [L, R, 128] grid (the
    init_exp3_weights layout) — for checkpointing/inspection in the same
    format as the replicated state."""
    from bliss_gnn_tpu.ops.exp3_pallas import TILE_ROWS
    from bliss_gnn_tpu.sampling.frontier import EDGE_PAD

    arr = np.asarray(stacked)
    S = arr.shape[0]
    L = n_layers
    epr = (arr.shape[1] - 1) // L
    per_shard = arr[:, : L * epr].reshape(S, L, epr)
    rows_full = np.concatenate(
        [per_shard[s] for s in range(S)], axis=1
    )  # [L, S*epr]
    raw_rows = -(-(n_edges + EDGE_PAD) // 128)
    r = -(-raw_rows // TILE_ROWS) * TILE_ROWS
    rows = np.zeros((L, r * 128), arr.dtype)
    k = min(n_edges, S * epr)  # beyond n_edges the canonical state is 0
    rows[:, :k] = rows_full[:, :k]
    return jnp.asarray(rows.reshape(L, r, 128))
