"""Block (message-flow graph) pytree and static capacity planning.

The reference's samplers return lists of DGL MFG blocks with dynamic shapes
(dgl.to_block at bandit_sampler.py:322 / ladies_sampler.py:99).  XLA wants
static shapes, so a Block here is a *capacity-padded* bipartite graph:

- a src-node table of static size ``n_src_cap`` whose first ``n_dst_cap``
  slots are the dst (seed) nodes — mirroring dgl.to_block's convention that
  dst nodes occupy the first src slots, which models rely on for
  ``h_dst = h_src[:num_dst]``;
- a padded edge list of static size ``e_cap`` with masks.

Blocks carry the side-channel data the bandit needs (SURVEY.md §2a row 5):
``e_weight`` (the debiased W-tilde, dgl edata['edge_weights']), ``e_q``
(edata['q_ij']), ``src_node_prob`` (srcdata['node_prob']), and global ``eid``
(edata[dgl.EID]) for the EXP3 scatter update.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Block:
    """A capacity-padded bipartite message-flow graph."""

    # node table; slots [0, n_dst_cap) are the dst/seed slots
    src_gids: jax.Array  # [n_src_cap] int32 — global node ids
    src_mask: jax.Array  # [n_src_cap] bool
    # padded edge list; positions reference the src table / dst slots
    e_src: jax.Array  # [e_cap] int32 — position into src table
    e_dst: jax.Array  # [e_cap] int32 — position in [0, n_dst_cap)
    e_mask: jax.Array  # [e_cap] bool
    eid: jax.Array  # [e_cap] int32 — canonical global edge ids
    e_weight: jax.Array  # [e_cap] f32 — debiased aggregation weight W-tilde
    e_q: jax.Array  # [e_cap] f32 — edge sampling prob q_ij (bandit)
    src_node_prob: jax.Array  # [n_src_cap] f32 — node prob P (bandit)
    # static normalized graph weight w_e per kept edge (DGL carries edata
    # through every subgraph op; the EXP3 alpha for sage/gcn reads it,
    # bandit_sampler.py:144-147).  Gathered at frontier level — a chunked
    # row take — instead of a per-edge scalar gather from the [E] global
    # array (measured 11.6 ms/step at Reddit scale).
    e_alpha: jax.Array = None
    n_dst_cap: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def n_src_cap(self) -> int:
        return self.src_gids.shape[0]

    @property
    def e_cap(self) -> int:
        return self.e_src.shape[0]

    @property
    def dst_gids(self) -> jax.Array:
        return self.src_gids[: self.n_dst_cap]

    @property
    def dst_mask(self) -> jax.Array:
        return self.src_mask[: self.n_dst_cap]

    def num_src(self) -> jax.Array:
        return jnp.sum(self.src_mask.astype(jnp.int32))

    def n_valid_edges(self) -> jax.Array:
        """Dynamic scalar: (last set e_mask position) + 1 — the contiguous
        prefix bound for the Pallas kernels' dynamic tail skip.  For
        LADIES-family blocks the mask IS a prefix (compact_by_mask), so
        this equals the kept count; for neighbor/full blocks (scattered
        masks) it degrades gracefully to the last-edge bound."""
        e_cap = self.e_mask.shape[0]
        iota = jnp.arange(1, e_cap + 1, dtype=jnp.int32)
        return jnp.max(jnp.where(self.e_mask, iota, 0))

    def num_dst(self) -> jax.Array:
        return jnp.sum(self.dst_mask.astype(jnp.int32))

    def num_edges(self) -> jax.Array:
        return jnp.sum(self.e_mask.astype(jnp.int32))

    def in_degrees(self, dtype=jnp.int32) -> jax.Array:
        """Kept-edge in-degree per dst slot (mfg.in_degrees()[:n_dst]).
        Routed through segment_count so block-scale counts ride the
        banked Pallas scatter on TPU (the raw int segment_sum was an
        0.87 ms XLA scatter at the l0 refit cap, trace fusion.122);
        float consumers pass dtype=jnp.float32 to skip conversions."""
        from bliss_gnn_tpu.ops.segment import segment_count

        return segment_count(self.e_dst, self.n_dst_cap, self.e_mask,
                             dtype=dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class CapacityPlan:
    """Static per-layer capacities for one sampling configuration.

    Layers are indexed like the reference's ``nodes_per_layer`` (fanouts):
    index 0 is the input-most layer; sampling processes them in reversed
    order (bandit_sampler.py:350).  For block l:

    - ``dst_caps[l]``      — seed-table capacity feeding block l
    - ``frontier_caps[l]`` — padded in-subgraph edge capacity (pre-sampling)
    - ``cand_caps[l]``     — candidate (compacted node) capacity
    - ``block_e_caps[l]``  — kept-edge capacity after sampling

    Overflow beyond a capacity truncates (tracked in sampler stats); the
    defaults are sized from graph degree statistics with slack.
    """

    batch_size: int
    fanouts: Tuple[int, ...]
    dst_caps: Tuple[int, ...]
    extra_caps: Tuple[int, ...]  # capacity for non-seed sampled src nodes
    frontier_caps: Tuple[int, ...]
    cand_caps: Tuple[int, ...]
    block_e_caps: Tuple[int, ...]
    # per-layer: skip compact_graphs and use global node ids as candidate
    # positions (sampling/frontier.py:dense_candidates) — set when the
    # candidate capacity is clamped to n_nodes anyway
    dense_cands: Tuple[bool, ...] = ()

    @staticmethod
    def build(
        batch_size: int,
        fanouts: Sequence[int],
        n_nodes: int,
        n_edges: int,
        kind: str = "ladies",
        avg_degree: float | None = None,
        frontier_slack: float = 8.0,
        block_edge_slack: float = 4.0,
        max_frontier_edges: int | None = None,
        align: int = 128,
        deg_std: float | None = None,
        max_degree: int | None = None,
        dense_candidates: bool | None = None,
    ) -> "CapacityPlan":
        """Size the per-layer capacities for a sampler family.

        ``kind``: 'ladies'/'poisson-ladies'/'bandit'/'poisson-bandit' treat
        fanouts as a *total* per-layer node budget (nodes_per_layer,
        ladies_sampler.py:27); 'neighbor' treats them as per-seed fan-outs
        (dgl NeighborSampler); 'full' keeps every in-edge.

        Frontier capacity: a seed batch of size c drawn from the node set
        has frontier-size mean c*avg_degree and std ~= sqrt(c)*deg_std, so
        with degree stats the cap is the concentration bound

            c*avg_degree + frontier_slack*sqrt(c)*deg_std + max_degree

        (the max_degree term absorbs one worst-case hub).  Every per-slot
        op in the sampler — including the per-edge LUT gathers that
        dominate the step — scales with this cap, and the blanket
        ``c*avg_degree*frontier_slack`` fallback (used when stats are
        absent) is measured 5-8x larger at Reddit scale.  Overflow still
        truncates and is counted in the sampler stats either way.
        """
        fanouts = tuple(int(f) for f in fanouts)
        L = len(fanouts)
        if avg_degree is None:
            avg_degree = max(1.0, n_edges / max(1, n_nodes))

        layerwise = kind not in ("neighbor", "full")
        dst_caps = [0] * L
        extra_caps = [0] * L
        frontier_caps = [0] * L
        cand_caps = [0] * L
        block_e_caps = [0] * L
        dense_cands = [False] * L

        cap = batch_size
        for l in reversed(range(L)):
            dst_caps[l] = cap
            if deg_std is not None and max_degree is not None:
                # 1.5x mean bias: importance-sampled seed sets skew toward
                # well-connected nodes, so deeper frontiers run above the
                # population mean; overflow counters monitor the residual
                fcap = int(
                    1.5 * cap * avg_degree
                    + frontier_slack * (cap ** 0.5) * max(deg_std, 1.0)
                    + max_degree
                )
            else:
                fcap = int(cap * avg_degree * frontier_slack)
            # when clamped near the full edge count, leave headroom for the
            # chunked layout's per-seed padding (<= ck-1 <= 127 slots/seed,
            # bounded by 8*cap under the auto ck rule)
            fcap = min(fcap, n_edges + 8 * cap)
            if max_frontier_edges is not None:
                fcap = min(fcap, max_frontier_edges)
            # at least 8 slots per seed: one >=8-wide chunk per seed
            fcap = max(fcap, cap * 8)
            fcap = _round_up(fcap, align)
            frontier_caps[l] = fcap

            if layerwise:
                # Poisson selection count is a sum of independent Bernoullis
                # with mean <= fanout: give it +4*sqrt(fanout) fluctuation
                # slack (the reference never truncates; top-k kinds select
                # exactly fanout, no slack needed)
                extra = fanouts[l]
                if "poisson" in kind:
                    extra += _round_up(int(4 * fanouts[l] ** 0.5), align)
                becap = int(min(fcap, max(
                    (cap + extra) * block_edge_slack * max(1.0, avg_degree) ** 0.5,
                    4 * (cap + extra),
                )))
            elif kind == "neighbor":
                extra = min(cap * fanouts[l], n_nodes)
                becap = cap * fanouts[l]
            else:  # full
                extra = min(fcap, n_nodes)
                becap = fcap
            extra_caps[l] = extra
            block_e_caps[l] = min(_round_up(max(becap, cap), align), fcap)
            # +1 slot: the sentinel consumes one unique() slot under padding
            cand_caps[l] = _round_up(min(n_nodes + 1, cap + fcap + 1), align)
            # candidate space clamped to the node count -> compaction is
            # (nearly) the identity; go dense unless overridden
            dense = layerwise and (n_nodes + 1 <= cap + fcap + 1)
            if dense_candidates is not None:
                dense = layerwise and dense_candidates
                if dense:
                    cand_caps[l] = _round_up(n_nodes + 1, align)
            dense_cands[l] = dense
            cap = cap + extra  # next layer's seed table = this src table

        return CapacityPlan(
            batch_size=batch_size,
            fanouts=fanouts,
            dst_caps=tuple(dst_caps),
            extra_caps=tuple(extra_caps),
            frontier_caps=tuple(frontier_caps),
            cand_caps=tuple(cand_caps),
            block_e_caps=tuple(block_e_caps),
            dense_cands=tuple(dense_cands),
        )

    def src_cap(self, l: int) -> int:
        return self.dst_caps[l] + self.extra_caps[l]

    def refit(
        self,
        frontier_edges: Sequence[int],
        block_edges: Sequence[int],
        block_edge_slack: float = 1.6,
        frontier_slack: float = 1.25,
        max_degree: int = 0,
        align: int = 128,
    ) -> "CapacityPlan":
        """Tighten capacities from MEASURED per-layer maxima (pilot steps).

        The a-priori formulas in ``build`` must cover the worst case before
        any step has run; measured, the Reddit config's kept-edge caps are
        ~12x the true counts — and every sampler gather/scatter AND the
        model's per-edge segment ops scale with the cap.  Refit keeps the
        plan sound (never grows a cap, preserves dst/extra/cand shapes so
        the seed tables and model params are unaffected) and relies on the
        existing overflow counters + the Trainer's widen-on-overflow
        escalation for the residual tail.

        ``frontier_edges``/``block_edges``: per-layer maxima of the
        ``frontier_edges`` / ``n_block_edges_true`` sampler stats.

        Slack defaults: the frontier count is a sum over thousands of
        sampled src degrees (relative std ~5% at the Reddit config), so
        1.25x the pilot max + max_degree covers many standard deviations;
        block edges are fanout-capped selections with even less spread
        (1.6x).  The old 1.5x/2.0x defaults cost ~20% of the whole
        sampling pass — every frontier-sized scatter/gather scales with
        the cap (samplers.py speed-of-light budget) — for tail coverage
        the widen-on-overflow escalation already provides.
        """
        L = len(self.fanouts)
        fr = list(self.frontier_caps)
        be = list(self.block_e_caps)
        for l in range(L):
            src_cap = self.dst_caps[l] + self.extra_caps[l]
            fcap = int(frontier_edges[l] * frontier_slack) + max_degree
            fcap = max(fcap, 8 * self.dst_caps[l])
            fr[l] = min(fr[l], _round_up(fcap, align))
            bcap = int(block_edges[l] * block_edge_slack)
            bcap = max(bcap, 2 * src_cap)
            be[l] = min(be[l], _round_up(bcap, align), fr[l])
        return dataclasses.replace(
            self, frontier_caps=tuple(fr), block_e_caps=tuple(be)
        )

    def widen(
        self,
        factor: float = 1.5,
        align: int = 128,
        frontier: bool = False,
    ) -> "CapacityPlan":
        """Escalate after post-refit overflow: grow the block-edge caps (and
        optionally the frontier caps) by ``factor``."""
        fr = (
            tuple(_round_up(int(c * factor), align) for c in self.frontier_caps)
            if frontier
            else self.frontier_caps
        )
        be = tuple(
            min(_round_up(int(c * factor), align), f)
            for c, f in zip(self.block_e_caps, fr)
        )
        return dataclasses.replace(self, frontier_caps=fr, block_e_caps=be)
