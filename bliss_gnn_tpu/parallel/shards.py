"""Sharded-storage primitives for edge-partitioned sampled training.

The memory design for graphs beyond one HBM (SURVEY.md §5.8; no reference
counterpart — the reference replicates the DGL graph per process and is
single-device anyway, train_lightning.py:648-650):

- nodes are partitioned into contiguous ranges of ``npr`` per device;
- because canonical edge ids are CSC order (grouped by dst,
  graph/structure.py:29-37), contiguous dst ranges induce contiguous
  CANONICAL EDGE ranges — so every edge-indexed array (``csc_src``, the
  normalized weights, the EXP3 arm-weight rows) shards into contiguous
  ``epr``-sized slices with no permutation;
- per-device memory is O(E/S + N/S); only the [N+1] ``csc_indptr`` stays
  replicated (int32 — 4 bytes/node, ~1 MB at Reddit scale, ~450 MB at
  papers100M where it can be further sharded by the same scheme).

The access pattern is an on-demand distributed row gather
(:meth:`EShard.frontier_rows`, :func:`sharded_node_rows`): every device
all-gathers the (tiny, int32) row-index requests of the whole mesh, serves
the rows it owns from its local shard (zeros elsewhere), and one
``psum_scatter`` (reduce-scatter) hands each device exactly its answers.
Exactly one shard contributes a non-zero value per row, so the reduction is
EXACT in every dtype — sharded sampling is numerically identical to the
replicated path (tested against parallel.dp in tests/test_shardedstep.py).
Per device the reduce-scatter receives rows_requested * row_bytes — the
same bytes a replicated HBM gather would touch, now riding ICI.  This
replaces a bulk boundary exchange: the sampled frontier IS the working set,
so we ship only it.

Alignment contract: ``epr`` is a multiple of 128 and ``S * epr >= E + 128``,
so every ``frontier_gather`` chunk (ck in {8..128}, a power of two —
sampling/frontier.py:129-134) lies entirely inside one shard and the padded
grid row after the last edge exists on the last shard (the EDGE_PAD
analog).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def edges_per_shard(n_edges: int, n_shards: int) -> int:
    """Smallest 128-multiple with S * epr >= E + 128 (coverage contract)."""
    return round_up(round_up(n_edges + 128, n_shards * 128) // n_shards, 128)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EShard:
    """One device's contiguous slice of a canonical edge-indexed array.

    ``data[i]`` is the global array's entry ``me * epr + i``.  Constructed
    inside shard_map bodies; ``frontier_rows`` makes it a drop-in for
    :func:`sampling.frontier.frontier_gather` (which dispatches on it).
    """

    data: jax.Array  # [epr]
    axis: str = dataclasses.field(metadata=dict(static=True), default="dp")
    epr: int = dataclasses.field(metadata=dict(static=True), default=0)

    def frontier_rows(self, frontier) -> jax.Array:
        """Distributed equivalent of ``data_global[frontier chunk grid]``:
        all_gather the mesh's chunk-row requests, serve locally owned rows,
        reduce-scatter the answers back.  Exact (one non-zero contributor
        per row)."""
        ck = frontier.ck
        assert self.epr % ck == 0, (
            f"chunk size {ck} must divide edges-per-shard {self.epr} "
            f"(CapacityPlan guarantees 128-aligned capacities)"
        )
        rows_per = self.epr // ck
        reqs = jax.lax.all_gather(frontier.chunk_gidx, self.axis)  # [S, C]
        me = jax.lax.axis_index(self.axis)
        local_row = reqs - me * rows_per
        mine = (local_row >= 0) & (local_row < rows_per)
        grid = self.data.reshape(rows_per, ck)
        rows = jnp.take(grid, jnp.clip(local_row, 0, rows_per - 1), axis=0)
        served = jnp.where(mine[..., None], rows, 0)  # [S, C, ck]
        out = jax.lax.psum_scatter(
            served, self.axis, scatter_dimension=0, tiled=False
        )
        return out.reshape(-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NShard:
    """One device's contiguous slice of a node-indexed 1-D array — the
    node-granular sibling of :class:`EShard`, used to shard the [N+1]
    ``csc_indptr`` at papers100M scale (~450 MB/device replicated;
    O(N/S) sharded).  ``take1d`` makes it a drop-in for ``jnp.take`` via
    the dispatch in sampling/frontier.py:ptr_take."""

    data: jax.Array  # [npr]
    axis: str = dataclasses.field(metadata=dict(static=True), default="dp")
    npr: int = dataclasses.field(metadata=dict(static=True), default=0)

    def take1d(self, idx: jax.Array) -> jax.Array:
        return sharded_node_rows(self.data, idx, self.axis, self.npr)


def sharded_node_rows(
    local: jax.Array, gids: jax.Array, axis: str, npr: int
) -> jax.Array:
    """rows_global[gids] with the global array sharded into contiguous
    ``npr``-row ranges (device s owns rows [s*npr, (s+1)*npr)).

    The node-granular sibling of :meth:`EShard.frontier_rows` — used for the
    feature gather of the input block's src table and the label gather of
    the seed batch.  Per device the reduce-scatter moves exactly
    ``len(gids) * row_bytes`` — the boundary-feature exchange of the sharded
    step, fused into one collective that XLA overlaps with the surrounding
    compute."""
    reqs = jax.lax.all_gather(gids, axis)  # [S, B]
    me = jax.lax.axis_index(axis)
    loc = reqs - me * npr
    mine = (loc >= 0) & (loc < npr)
    rows = jnp.take(local, jnp.clip(loc, 0, npr - 1), axis=0)  # [S, B, ...]
    mshape = mine.shape + (1,) * (rows.ndim - mine.ndim)
    served = jnp.where(mine.reshape(mshape), rows, 0)
    return jax.lax.psum_scatter(
        served, axis, scatter_dimension=0, tiled=False
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedExp3:
    """One device's EXP3 arm-weight shard: layer-major [L * epr + 1] flat
    (layer rows of this device's edge range, + one trailing dump slot for
    scatter targets this device does not own).

    ``layer_row`` makes it a drop-in for :func:`samplers.exp3_row` (which
    dispatches on it), so the sampler's probability math reads arm weights
    through the same distributed row gather as every other edge array.
    """

    local: jax.Array  # [L * epr + 1]
    axis: str = dataclasses.field(metadata=dict(static=True), default="dp")
    epr: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_layers: int = dataclasses.field(metadata=dict(static=True), default=0)

    def layer_row(self, layer: int) -> EShard:
        row = jax.lax.slice(
            self.local, (layer * self.epr,), ((layer + 1) * self.epr,)
        )
        return EShard(row, axis=self.axis, epr=self.epr)


def apply_exp3_deltas_sharded(
    local: jax.Array,
    deltas,
    me: jax.Array,
    epr: int,
    n_layers: int,
) -> jax.Array:
    """Ownership-filtered multiplicative update on one device's EXP3 shard.

    ``deltas`` are the all-gathered sparse (eid, exponent) lists of every
    mesh shard (a few KB/step).  Each device applies exactly the updates
    whose edge it owns — updates are disjoint-support across shards by
    construction, so no state all-gather or averaging is needed (the
    sharded generalization of bandit_sampler.py:248: the global weight row
    is the concatenation of the shards).  Non-owned / padding entries
    scatter into the dump slot, which is reset to 0 (its value is never
    read: ``layer_row`` slices stop before it)."""
    dump = n_layers * epr
    idxs, mults = [], []
    for layer, (eid, dr) in enumerate(deltas):
        eid = eid.reshape(-1).astype(jnp.int32)
        dr = dr.reshape(-1)
        loc = eid - me * epr
        owned = (loc >= 0) & (loc < epr) & (dr != 0)
        idxs.append(jnp.where(owned, layer * epr + loc, dump))
        mults.append(jnp.exp(dr).astype(local.dtype))
    out = local.at[jnp.concatenate(idxs)].multiply(jnp.concatenate(mults))
    return out.at[dump].set(0)


def normalize_exp3_sharded(
    local: jax.Array, n_layers: int, epr: int, axis: str
) -> jax.Array:
    """L1 row normalization over the sharded state: per-layer partial sums
    are psum'd over the mesh (bandit_sampler.py:249 semantics; the deferred
    half of apply_exp3_deltas(normalize=False))."""
    w2 = local[: n_layers * epr].reshape(n_layers, epr)
    norm = jax.lax.psum(jnp.sum(w2, axis=-1, dtype=jnp.float32), axis)
    inv = (1.0 / jnp.maximum(norm, 1e-12)).astype(local.dtype)
    out = (w2 * inv[:, None]).reshape(-1)
    return jnp.concatenate([out, local[n_layers * epr:]])
