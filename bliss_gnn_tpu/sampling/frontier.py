"""On-device subgraph algebra: static-shape in_subgraph + compact_graphs.

Replaces the DGL C++ structure ops the reference calls per sampling step
(dgl.in_subgraph bandit_sampler.py:123, dgl.compact_graphs :125,
dgl.subgraph/edge_subgraph :289-298, dgl.to_block :322) with fused
gather/sort/relabel jnp programs of static shape:

- ``gather_in_edges``: flatten the ragged CSC rows of the seed set into a
  capacity-padded edge list via an exclusive-cumsum + searchsorted ownership
  map (no host round-trips, no dynamic shapes).
- ``compact_candidates``: sorted-unique relabeling of the frontier endpoint
  set (dgl.compact_graphs) using jnp.unique with a static size and an
  INT32_MAX sentinel.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

SENTINEL = jnp.iinfo(jnp.int32).max


class Frontier(NamedTuple):
    """Padded in-subgraph of a seed set (all in-edges of valid seeds)."""

    eid: jax.Array  # [e_cap] canonical global edge ids
    src_gid: jax.Array  # [e_cap] global src node id per edge
    dst_spos: jax.Array  # [e_cap] dst's position in the seeds array
    e_mask: jax.Array  # [e_cap]
    total_edges: jax.Array  # scalar — true (pre-truncation) edge count


def gather_in_edges(
    csc_indptr: jax.Array,
    csc_src: jax.Array,
    seeds: jax.Array,
    seeds_mask: jax.Array,
    e_cap: int,
) -> Frontier:
    """dgl.in_subgraph as a static-shape flatten of CSC rows.

    For each output slot e in [0, e_cap), ownership is found by binary search
    over the exclusive cumsum of seed in-degrees; slots beyond the true edge
    count (or seeds beyond capacity) are masked.  Truncation (total > e_cap)
    drops trailing seeds' edges and is reported via ``total_edges``.
    """
    n_seeds = seeds.shape[0]
    safe_seeds = jnp.where(seeds_mask, seeds, 0)
    deg = jnp.where(
        seeds_mask,
        jnp.take(csc_indptr, safe_seeds + 1) - jnp.take(csc_indptr, safe_seeds),
        0,
    ).astype(jnp.int32)
    off = jnp.cumsum(deg) - deg  # exclusive cumsum [n_seeds]
    total = jnp.sum(deg)
    pos = jnp.arange(e_cap, dtype=jnp.int32)
    owner = (
        jnp.searchsorted(off, pos, side="right").astype(jnp.int32) - 1
    )
    owner = jnp.clip(owner, 0, n_seeds - 1)
    e_mask = pos < jnp.minimum(total, e_cap)
    within = pos - jnp.take(off, owner)
    eid = (
        jnp.take(csc_indptr, jnp.take(safe_seeds, owner)) + within
    ).astype(jnp.int32)
    eid = jnp.where(e_mask, eid, 0)
    src = jnp.where(e_mask, jnp.take(csc_src, eid).astype(jnp.int32), 0)
    return Frontier(
        eid=eid,
        src_gid=src,
        dst_spos=jnp.where(e_mask, owner, 0),
        e_mask=e_mask,
        total_edges=total,
    )


class Candidates(NamedTuple):
    """Compacted (sorted-unique) node set of a frontier: seeds ∪ srcs."""

    gids: jax.Array  # [c_cap] sorted ascending, SENTINEL-padded
    mask: jax.Array  # [c_cap]
    n: jax.Array  # scalar — number of valid candidates
    src_cpos: jax.Array  # [e_cap] candidate position of each edge's src
    seed_cpos: jax.Array  # [n_seeds] candidate position of each seed
    is_seed: jax.Array  # [c_cap] candidate-is-a-seed mask


def compact_candidates(
    seeds: jax.Array,
    seeds_mask: jax.Array,
    frontier: Frontier,
    c_cap: int,
    n_nodes: int,
) -> Candidates:
    """dgl.compact_graphs(insg, always_preserve=seeds): the unique node set
    of seeds ∪ frontier srcs, relabeled densely in ascending-gid order.

    Mark-and-compact instead of sort-based unique: scatter membership bits
    into an [N] table, prefix-sum-compact it, and relabel through an [N]
    position LUT.  A multi-million-element frontier then costs one scatter
    + one O(N) cumsum instead of an O(E log^2 E) TPU bitonic sort (the
    dominant compile-time AND runtime cost of the previous formulation).
    Ordering is identical to sorted-unique (ascending gid).
    """
    mark = jnp.zeros(n_nodes, bool)
    mark = mark.at[jnp.where(seeds_mask, seeds, n_nodes)].set(
        True, mode="drop"
    )
    mark = mark.at[
        jnp.where(frontier.e_mask, frontier.src_gid, n_nodes)
    ].set(True, mode="drop")
    idx, out_mask, n = compact_by_mask(mark, c_cap)
    gids = jnp.where(out_mask, idx, SENTINEL)
    # gid -> candidate position LUT (n_nodes entries; 0 for non-members,
    # masked out by the callers' edge/seed masks)
    pos_of_gid = jnp.zeros(n_nodes, jnp.int32).at[
        jnp.where(out_mask, idx, n_nodes)
    ].set(jnp.arange(c_cap, dtype=jnp.int32), mode="drop")
    src_cpos = jnp.where(
        frontier.e_mask, jnp.take(pos_of_gid, frontier.src_gid), 0
    )
    seed_cpos = jnp.where(
        seeds_mask, jnp.take(pos_of_gid, jnp.where(seeds_mask, seeds, 0)), 0
    )
    is_seed = (
        jnp.zeros(c_cap, dtype=bool).at[seed_cpos].max(seeds_mask, mode="drop")
        & out_mask
    )
    return Candidates(
        gids=gids, mask=out_mask, n=n, src_cpos=src_cpos,
        seed_cpos=seed_cpos, is_seed=is_seed,
    )


def compact_by_mask(mask: jax.Array, out_cap: int):
    """Stable compaction: indices of True entries packed into ``out_cap``
    slots (boolean indexing with a static output size).

    cumsum + scatter, NOT argsort: sort lowerings dominate both compile
    time (~15-20 s each on TPU through remote compilation) and runtime for
    multi-million-element frontiers; the prefix-sum ranking is
    order-preserving and linear.

    Returns (idx [out_cap], out_mask [out_cap], n) — idx of padded slots is
    0.  Overflow (n > out_cap) truncates to the first out_cap True entries.
    """
    n_in = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1  # rank of each True entry
    n = jnp.sum(mask.astype(jnp.int32))
    slot = jnp.where(mask & (pos < out_cap), pos, out_cap)
    idx = (
        jnp.zeros(out_cap, jnp.int32)
        .at[slot]
        .set(jnp.arange(n_in, dtype=jnp.int32), mode="drop")
    )
    out_mask = jnp.arange(out_cap, dtype=jnp.int32) < n
    return idx, out_mask, n
