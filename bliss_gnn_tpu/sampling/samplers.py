"""Layer-wise importance samplers as pure, jittable device functions.

TPU-native re-design of the reference's sampler stack (SURVEY.md §2a rows
3-6):

- LADIES                      (ladies_sampler.py:24-123)
- Poisson-LADIES              (ladies_sampler.py:125-183)
- Bandit-LADIES (EXP3)        (bandit_sampler.py:29-367)
- Poisson-Bandit (headline)   (bandit_sampler.py:369-425)
- uniform neighbor / full-neighbor baselines (train_lightning.py:349-357)

Design departures from the reference (deliberate, TPU-first):
- everything is static-shape: frontiers/candidates/blocks are capacity-padded
  (see CapacityPlan); overflow truncates and is counted in stats;
- ``torch.multinomial(replacement=False)`` becomes Gumbel top-k (exact
  equivalence for sampling-without-replacement);
- the Poisson fixed-point scaling loop — 50 host round-trips per layer in the
  reference (bandit_sampler.py:396-401, ``.item()`` syncs) — runs on device
  inside ``lax.while_loop``;
- the whole multi-layer sampling pass is one traced function fused into the
  training step: no host work per step.

EXP3 semantics preserved exactly (probabilities bandit_sampler.py:101-138,
node probs :47-82, debiased block weights :269-339, rewards :140-193, weight
update :195-249) — see the per-function docstrings.

--- Speed-of-light accounting of the sampling pass (VERDICT r3 ask #1) ----

Reference hot loop: bandit_sampler.py:341-367.  Device-trace budget of the
fused 3-layer poisson-bandit pass at the Reddit refit config (bs=256,
fanouts 4096/2048/1024; jax.profiler device durations, v5e, 2026-08-21,
scripts/profile_step.py BLISS_PROF_TRACE_REFIT=1 + trace_report.py —
truthful where tunnel wall timing is not).  Four r5 changes cut the r4
budget's 35.2 ms device to 26.4 (wall sample 30 -> 21-22 ms, step 40 ->
32):

  (a) DYNAMIC TAIL SKIP: every Pallas kernel on the frontier/block
      streams (banked scatter, LUT gather, one-hot segsum) takes an
      n_valid contiguous-prefix bound and skips whole tiles past it —
      the refit caps carry 1.25x slack that was pure per-slot waste
      (frontier.n_valid_slots / Block.n_valid_edges / compact counts);
  (b) MXU-SELECT keep gathers: boolean LUTs route through a kernel
      taking idx's natural [M/128, 128] bitcast view (NO [M,1] relayout
      operand — its copies were 2.5 ms of "data formatting") with lane
      extraction per 128-row sub-block as one bf16 MXU contraction +
      diagonal reduce, exact for 0/1 (probed 1.31x,
      scripts/probe_lut_mxusel.py; the r4-rejected roll variant tried
      to remove the same operand on the VPU and lost);
  (c) block-build ops bound by the kept count (l0: 56k true vs 100k
      cap — the gathers/debias sums skip ~44% of their tiles);
  (d) small-gather rerouting: the LUT kernel's routing threshold
      dropped 2^16 -> 2^14 (probed 3.7x at the l1 block-build shape)
      and two remaining XLA scalar gathers — compact_by_mask's
      bases[r_j] take and frontier_seed_broadcast's per-chunk owner
      takes — now ride it (~1.4 ms device combined).

Post-change budget (26.4 ms device after (d); itemization below traced
at 27.8 before it — the deltas land in the compact/fusion lines):

  12.9 ms  importance-prob segment sums (r_ij^2 by src, the q_j math):
           banked Pallas scatter-add, 8.72/3.53/0.66 ms over
           2.03M/0.88M/0.15M valid-chunk slots = 4.1-4.3 ns/slot
           (probed isolated floor 3.9 — insensitive to banks/keys/tile,
           scripts/probe_scatter_tune.py).
   6.2 ms  keep-mask gathers (sel[src] per slot) on the MXU-select
           kernel: 4.20/1.68/0.30 ms = 1.9-2.1 ns/slot (probed isolated
           1.54), no operand copies left (data formatting 2.92 -> 0.37
           ms total).
   5.4 ms  custom fusions: compact_by_mask (keep + extra; fusion.16
           0.66), pad/clamp glue, block-build 5-field LUT gathers.
   ~3.3 ms prob chain + assembly: chunked frontier sums/broadcasts
           (reshape-reduce, ~free), EXP3 grid row takes, Poisson
           lax.while (0.02 ms — the reference's 50 host syncs/layer,
           bandit_sampler.py:396-401, cost ~0 here), Gumbel/Bernoulli,
           masks/pads/stats.

  Floor model: every VALID-CHUNK slot (3.06M — chunk-boundary padding
  inside valid chunks is not skippable at tile granularity) pays one
  banked scatter (3.9 ns) + one mxusel gather (1.5 ns) = ~16.5 ms, plus
  block build + compaction ~4 ms and ~2 ms glue => ~23 ms; the pass
  runs at ~0.83 of that floor.  The remaining structural exits, in
  order of leverage: (1) the scatter's 3.9 ns/slot is the dominant term
  and its probe says tile tuning is exhausted — only an algorithmically
  different per-src aggregation would beat it; (2) chunk width ck=128
  wastes ~(ck-1)/2 slots per seed of boundary padding (~15-20% of the
  valid-chunk stream); ck=64 was analyzed and is BLOCKED by the
  physical lane tiling, not by code: TPU arrays tile T(8,128), so a
  64-wide grid family ([L, R', 64] EXP3 grid, 64-wide edata grids)
  would physically pad its lanes to 128 — DOUBLING the EXP3 state's
  HBM (690 MB -> 1.38 GB) and halving the effective bandwidth of every
  grid row take — while viewing the existing 128-wide grids as
  [2R, 64] is a relayout of the whole array (the measured 1.4 ms/call
  class), not a bitcast.  The boundary-padding slots stay; (3) a single
  fused scatter->select->gather kernel would save only the ~2-3 ms of
  XLA glue between phases — the two per-slot walks are data-dependent
  (sel needs the scatter's q) and their per-slot floors remain, so it
  was not built this round.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.graph.structure import DeviceGraph
from bliss_gnn_tpu.ops.segment import (
    masked_segment_sum,
    segment_count,
)
from bliss_gnn_tpu.sampling.block import Block, CapacityPlan
from bliss_gnn_tpu.sampling.frontier import (
    Candidates,
    Frontier,
    compact_by_mask,
    compact_candidates,
    dense_candidates,
    frontier_gather,
    frontier_seed_broadcast,
    frontier_segment_sum,
    gather_in_edges,
    ptr_take,
)

LADIES_FAMILY = ("ladies", "poisson-ladies", "bandit", "poisson-bandit")
ALL_KINDS = LADIES_FAMILY + ("neighbor", "full")


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler configuration (mirrors the samplers' __init__ knobs)."""

    kind: str = "poisson-bandit"
    fanouts: Tuple[int, ...] = (512, 256, 128)
    importance_sampling: bool = True
    eta: float = 0.1  # CLI default (train_lightning.py:517)
    replace: bool = False
    poisson_eps: float = 0.9999  # bandit_sampler.py:379
    poisson_iters: int = 50  # bandit_sampler.py:396
    exp3_delta: float = 0.01  # bandit_sampler.py:233 (constant; paper formula
    # is commented out in the reference)
    # the paper's per-dst learning rate, commented out in the reference
    # (bandit_sampler.py:226-229):
    #   delta_i = sqrt((1-eta) * eta^4 * k_i^5 * ln(n_i/k_i) / (T * n_i^4))
    # with k_i the kept-edge in-degree, n_i the full-graph in-degree, and T
    # the sampler's planned step count (num_steps, bandit_sampler.py:42).
    # Off by default (= reference behavior: constant delta).
    exp3_delta_formula: bool = False
    exp3_T: int = 5000  # T in the delta formula (sampler num_steps default)
    model: str = "sage"  # 'gat' switches the alpha computation
    # ABLATION knob: sample with the bandit machinery but never apply the
    # arm-weight update (a "broken bandit") — bench.py's policy-effect
    # metric trains once with and once without to show the update matters
    exp3_freeze: bool = False

    def __post_init__(self):
        if self.kind not in ALL_KINDS:
            raise ValueError(f"unknown sampler kind {self.kind!r}")
        if self.replace:
            raise NotImplementedError(
                "replacement sampling is unused by the reference CLI and not "
                "implemented"
            )

    @property
    def is_bandit(self) -> bool:
        return "bandit" in self.kind

    @property
    def is_poisson(self) -> bool:
        return "poisson" in self.kind

    @property
    def n_layers(self) -> int:
        return len(self.fanouts)


def init_exp3_weights(
    n_layers: int, n_edges: int, dtype=jnp.bfloat16
) -> jax.Array:
    """Lazily-allocated ones in the reference (bandit_sampler.py:342-343).

    The state is the 3-D GRID ``[L, R, 128]`` (R row-padded to a multiple
    of the streaming-apply tile) — exactly the shape the sampler's chunked
    row gathers consume, so ``exp3_row`` is a free slice instead of the
    whole-state relayout the old flat layout paid every call (2.1 ms at
    Reddit scale, frontier.py:frontier_gather).  The per-step sparse
    update streams the grid through a Pallas scatter-multiply kernel
    (ops/exp3_pallas.py) — the XLA scatter this replaces needed the flat
    1-D shape to go in place and still cost 15.1 ms/step inside the fused
    program.  Slots beyond ``n_edges`` in each layer plane are ZEROS
    (never sampled, never updated, invisible to the L1 normalization);
    they cover the sampler's chunk-granular overreads (EDGE_PAD)."""
    from bliss_gnn_tpu.ops.exp3_pallas import TILE_ROWS
    from bliss_gnn_tpu.sampling.frontier import EDGE_PAD

    raw_rows = -(-(n_edges + EDGE_PAD) // 128)
    r = -(-raw_rows // TILE_ROWS) * TILE_ROWS
    row = jnp.zeros((r * 128,), dtype=dtype).at[:n_edges].set(1.0)
    return jnp.tile(row.reshape(1, r, 128), (n_layers, 1, 1))


def exp3_row(exp3_weights: jax.Array, layer: int, n_layers: int) -> jax.Array:
    """One layer's arm-weight plane ([R, 128] grid — a free slice of the
    3-D state; frontier_gather consumes it directly).

    Also accepts a sharded-state handle (parallel/shards.py ShardedExp3);
    the returned row is then an EShard serving the same values through the
    distributed row gather.  Legacy flat [L*row_len] states still slice."""
    if hasattr(exp3_weights, "layer_row"):  # edge-sharded storage
        return exp3_weights.layer_row(layer)
    if exp3_weights.ndim == 3:
        # a lazy (state, layer) view: XLA materializes a full-plane COPY
        # for an eager state[layer] slice (2.09 ms/call at Reddit scale,
        # trace op slice_bitcast_fusion); the consumer gathers from the
        # merged [L*R, 128] grid with layer-offset row indices instead
        return _Plane(exp3_weights, layer)
    row_len = exp3_weights.shape[0] // n_layers
    return jax.lax.slice(
        exp3_weights, (layer * row_len,), ((layer + 1) * row_len,)
    )


class _Plane(NamedTuple):
    """Lazy layer-plane view of the [L, R, 128] EXP3 grid state (see
    exp3_row) — gathered slice-free via layer-offset rows of the merged
    2-D grid."""

    state: jax.Array  # [L, R, 128]
    layer: int


def _edata_grid(graph, name: str):
    """Pre-shaped [R, 128] upload-time copy of an edge-indexed array
    ('__grid__*' keys, Graph.to_device) — lets frontier_gather skip the
    per-call whole-array relayout (frontier.py:frontier_gather).  Absent
    under sharded/UVA storage (EShard handles its own layout)."""
    ed = getattr(graph, "edata", None)
    if isinstance(ed, dict):
        return ed.get(f"__grid__{name}")
    return None


# ---------------------------------------------------------------------------
# per-layer probability computations
# ---------------------------------------------------------------------------


def _exp3_edge_prob(
    graph: DeviceGraph,
    exp3_row: jax.Array,
    eta: float,
    frontier: Frontier,
    seeds: jax.Array,
    n_seed_cap: int,
) -> jax.Array:
    """q_ij = (1-eta) * w_ij / sum_j w_ij + eta / n_i over the frontier.

    Parity: bandit_sampler.py:101-138 (exp3_probabilities).  n_i is the
    *full-graph* in-degree of the edge's dst (g.in_degrees at :133).
    Computed in f32 (the reference runs bf16; f32 is free on the VPU and
    strictly more accurate).
    """
    if isinstance(exp3_row, _Plane):
        st = exp3_row.state
        L_, R_ = st.shape[0], st.shape[1]
        if frontier.ck == 128:
            grid2 = st.reshape(L_ * R_, 128)  # leading-dim merge: a bitcast
            raw = jnp.take(
                grid2, frontier.chunk_gidx + exp3_row.layer * R_, axis=0
            ).reshape(-1)
        else:  # small-config fallback: eager plane + on-the-fly reshape
            raw = frontier_gather(frontier, st[exp3_row.layer].reshape(-1))
    else:
        raw = frontier_gather(frontier, exp3_row)
    ew = jnp.where(frontier.e_mask, raw, 0).astype(jnp.float32)
    sum_dst = frontier_segment_sum(frontier, ew, n_seed_cap)
    denom = frontier_seed_broadcast(frontier, sum_dst)
    w_hat = jnp.where(denom > 0, ew / jnp.where(denom > 0, denom, 1.0), 0.0)
    safe_seeds = jnp.where(seeds >= 0, seeds, 0)
    n = safe_seeds.shape[0]
    bounds = ptr_take(
        graph.csc_indptr, jnp.concatenate([safe_seeds + 1, safe_seeds])
    )
    n_i_seed = (bounds[:n] - bounds[n:]).astype(jnp.float32)
    n_i = frontier_seed_broadcast(frontier, n_i_seed)
    q = (1.0 - eta) * w_hat + eta / jnp.maximum(n_i, 1.0)
    return jnp.where(frontier.e_mask, q, 0.0)


def _importance_node_prob(
    edge_prob: jax.Array,
    frontier: Frontier,
    cand: Candidates,
    n_seed_cap: int,
    normalize_per_dst: bool,
) -> jax.Array:
    """q_j = sqrt( sum_i (q_ij / sum_k q_ik)^2 ) over candidate nodes j.

    Parity: bandit_sampler.py:47-82 (normalize_per_dst=True) and
    ladies_sampler.py:44-48 (normalize_per_dst=False: LADIES uses the raw
    normalized graph weights, already per-dst-normalized upstream).
    """
    c_cap = cand.gids.shape[0]
    if normalize_per_dst:
        s_i = frontier_segment_sum(
            frontier, jnp.where(frontier.e_mask, edge_prob, 0.0), n_seed_cap
        )
        denom = frontier_seed_broadcast(frontier, s_i)
        r = jnp.where(denom > 0, edge_prob / jnp.where(denom > 0, denom, 1.0), 0.0)
    else:
        r = edge_prob
    prob = jnp.sqrt(
        masked_segment_sum(r * r, cand.src_cpos, c_cap, frontier.e_mask,
                           n_valid=frontier.n_valid_slots())
    )
    if cand.mask is None:  # dense mode: support of the scatter IS the mask
        return prob
    return jnp.where(cand.mask, prob, 0.0)


def _uniform_node_prob(frontier: Frontier, cand: Candidates) -> jax.Array:
    """importance_sampling=0 branch: prob 1 for frontier sources, 0 otherwise
    (bandit_sampler.py:77-81, ladies_sampler.py:49-51)."""
    c_cap = cand.gids.shape[0]
    out_deg = segment_count(cand.src_cpos, c_cap, frontier.e_mask,
                            n_valid=frontier.n_valid_slots())
    member = out_deg > 0
    if cand.mask is not None:
        member &= cand.mask
    return jnp.where(member, 1.0, 0.0)


def _poisson_scale(
    prob: jax.Array,
    cand: Candidates,
    num: int,
    eps: float,
    iters: int,
) -> jax.Array:
    """Fixed-point cap/scale: find c with sum(min(c*q, 1)) ~= num, then
    p = min(c*q, 1) with seeds forced to 1.

    Parity: bandit_sampler.py:381-406 / ladies_sampler.py:140-164, but the
    loop runs on device (lax.while_loop, f32) instead of 50 host .item()
    syncs per layer.  When n_candidates <= num, p = 1 for all candidates.
    """
    probf = prob.astype(jnp.float32)

    def cond(state):
        i, c, done = state
        return (i < iters) & jnp.logical_not(done)

    def body(state):
        i, c, _ = state
        s = jnp.sum(jnp.where(cand.mask, jnp.minimum(probf * c, 1.0), 0.0))
        ratio = jnp.minimum(s, num) / jnp.maximum(jnp.maximum(s, num), 1e-30)
        done = ratio >= eps
        c_new = jnp.where(done | (s <= 0), c, c * num / jnp.maximum(s, 1e-30))
        return i + 1, c_new, done

    _, c, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.float32(1.0), jnp.bool_(False))
    )
    p = jnp.minimum(probf * c, 1.0)
    p = jnp.where(cand.is_seed, 1.0, p)  # prob[seeds] = inf -> min(...,1) = 1
    p = jnp.where(cand.n <= num, 1.0, p)
    return jnp.where(cand.mask, p, 0.0)


# ---------------------------------------------------------------------------
# selection
# ---------------------------------------------------------------------------


def _gumbel_topk_select(
    key: jax.Array, prob: jax.Array, cand_mask: jax.Array, k: int
) -> jax.Array:
    """Weighted sampling of k candidates without replacement via Gumbel
    top-k — the exact equivalent of torch.multinomial(prob, k,
    replacement=False) (ladies_sampler.py:68, bandit_sampler.py:98).

    Returns a selection mask over candidates.  Zero-probability or padded
    candidates carry -inf keys and are selected only never; if fewer than k
    candidates have positive probability, all of them are selected.
    """
    c_cap = prob.shape[0]
    g = jax.random.gumbel(key, (c_cap,), dtype=jnp.float32)
    logp = jnp.where(
        cand_mask & (prob > 0), jnp.log(prob.astype(jnp.float32)), -jnp.inf
    )
    keys = jnp.where(jnp.isfinite(logp), logp + g, -jnp.inf)
    k_eff = min(k, c_cap)
    vals, idx = jax.lax.top_k(keys, k_eff)
    sel = jnp.zeros(c_cap, dtype=bool).at[idx].max(jnp.isfinite(vals))
    return sel


def _bernoulli_select(
    key: jax.Array, p: jax.Array, cand_mask: jax.Array
) -> jax.Array:
    """Independent per-candidate coin flips (Poisson sampling,
    bandit_sampler.py:422-424)."""
    u = jax.random.uniform(key, p.shape, dtype=jnp.float32)
    return cand_mask & (u < p)


# ---------------------------------------------------------------------------
# block construction
# ---------------------------------------------------------------------------


def _build_block(
    frontier: Frontier,
    cand: Candidates,
    sel: jax.Array,
    node_prob: jax.Array,
    edge_w: jax.Array,
    seeds: jax.Array,
    seeds_mask: jax.Array,
    extra_cap: int,
    e_blk_cap: int,
    debias: str,  # 'ladies' | 'bandit' | 'none'
    alpha_w: Optional[jax.Array] = None,  # [e_cap] static graph weight w_e
) -> Tuple[Block, Dict[str, jax.Array]]:
    """Assemble the padded MFG: src table (seeds first), kept edges, debiased
    weights.

    Parity: generate_block (bandit_sampler.py:269-339 / ladies_sampler.py:71-
    107).  Kept edges are those whose src is a *selected* candidate (the
    edge_subgraph mask at bandit_sampler.py:298); dst nodes are always the
    seeds.  W-tilde = W / P[src], then scaled per dst by d (ladies,
    ladies_sampler.py:97) or d / sum(W-tilde) (bandit, bandit_sampler.py:320),
    with d the kept-edge in-degree.

    All per-kept-edge takes of frontier-indexed arrays route through the
    Pallas LUT gather (2.3 ns/elem vs 6-29 ns for XLA scalar gathers — the
    previously dominant sampling cost at Reddit-scale frontiers).
    """
    n_seed_cap = seeds.shape[0]
    c_cap = cand.gids.shape[0]

    extra_mask = sel & jnp.logical_not(cand.is_seed) & cand.mask
    extra_idx, extra_slot_mask, n_extra = compact_by_mask(extra_mask, extra_cap)

    src_gids = jnp.concatenate(
        [
            jnp.where(seeds_mask, seeds, 0),
            jnp.where(extra_slot_mask, jnp.take(cand.gids, extra_idx), 0),
        ]
    )
    src_mask = jnp.concatenate([seeds_mask, extra_slot_mask])

    # candidate position -> block src slot
    pos_c = jnp.full(c_cap, -1, dtype=jnp.int32)
    pos_c = pos_c.at[
        jnp.where(seeds_mask, cand.seed_cpos, c_cap)
    ].set(jnp.arange(n_seed_cap, dtype=jnp.int32), mode="drop")
    pos_c = pos_c.at[
        jnp.where(extra_slot_mask, extra_idx, c_cap)
    ].set(
        n_seed_cap + jnp.arange(extra_cap, dtype=jnp.int32), mode="drop"
    )

    from bliss_gnn_tpu.ops.gather_pallas import (
        maybe_lut_gather,
        maybe_lut_gather_multi,
    )

    keep = frontier.e_mask & maybe_lut_gather(
        sel, cand.src_cpos, n_valid=frontier.n_valid_slots()
    )
    eidx, e_mask_b, n_kept = compact_by_mask(keep, e_blk_cap)
    nk = jnp.minimum(n_kept, e_blk_cap)

    if alpha_w is None:
        alpha_w = edge_w
    # all five frontier-indexed fields of a kept edge in ONE kernel pass
    # (interleaved-LUT gather — the row copy is the cost, not the select)
    e_src_cpos, e_dst_r, eid_r, w_r, alpha_r = maybe_lut_gather_multi(
        [cand.src_cpos, frontier.dst_spos, frontier.eid,
         edge_w, alpha_w], eidx, n_valid=nk,
    )
    e_dst = jnp.where(e_mask_b, e_dst_r, 0)
    eid = jnp.where(e_mask_b, eid_r, 0)
    w = jnp.where(e_mask_b, w_r.astype(jnp.float32), 0.0)
    e_alpha = jnp.where(e_mask_b, alpha_r.astype(jnp.float32), 0.0)

    # both candidate-indexed fields in one pass
    e_src_r, p_src_r = maybe_lut_gather_multi(
        [pos_c, node_prob], e_src_cpos, n_valid=nk,
    )
    e_src = jnp.where(e_mask_b, e_src_r, 0)
    p_src_edge = p_src_r.astype(jnp.float32)
    wt = jnp.where(p_src_edge > 0, w / jnp.where(p_src_edge > 0, p_src_edge, 1.0), 0.0)
    d = segment_count(e_dst, n_seed_cap, e_mask_b, dtype=jnp.float32,
                      n_valid=nk)
    if debias == "ladies":
        wt = wt * maybe_lut_gather(d, e_dst, n_valid=nk)
    elif debias == "bandit":
        wt_sum = masked_segment_sum(wt, e_dst, n_seed_cap, e_mask_b,
                                    n_valid=nk)
        scale = jnp.where(wt_sum > 0, d / jnp.where(wt_sum > 0, wt_sum, 1.0), 0.0)
        wt = wt * maybe_lut_gather(scale, e_dst, n_valid=nk)
    wt = jnp.where(e_mask_b, wt, 0.0)

    # per-src-slot node prob (block.srcdata['node_prob'], bandit_sampler.py:328)
    p_seed = jnp.take(node_prob, cand.seed_cpos).astype(jnp.float32)
    p_extra = jnp.take(node_prob, extra_idx).astype(jnp.float32)
    src_node_prob = jnp.concatenate(
        [
            jnp.where(seeds_mask, p_seed, 0.0),
            jnp.where(extra_slot_mask, p_extra, 0.0),
        ]
    )

    block = Block(
        src_gids=src_gids.astype(jnp.int32),
        src_mask=src_mask,
        e_src=e_src.astype(jnp.int32),
        e_dst=e_dst.astype(jnp.int32),
        e_mask=e_mask_b,
        eid=eid.astype(jnp.int32),
        e_weight=wt,
        e_q=jnp.where(e_mask_b, w, 0.0),
        src_node_prob=src_node_prob,
        e_alpha=e_alpha,
        n_dst_cap=n_seed_cap,
    )
    stats = {
        "n_extra": n_extra,
        "n_block_edges_true": jnp.sum(keep.astype(jnp.int32)),
        "n_block_edges": n_kept,
        # truncation beyond the static caps (0 in a healthy plan; the
        # Trainer widens the plan when these fire post-refit)
        "block_edge_overflow": jnp.maximum(n_kept - e_blk_cap, 0),
        "extra_overflow": jnp.maximum(n_extra - extra_cap, 0),
    }
    return block, stats


# ---------------------------------------------------------------------------
# per-layer sampling
# ---------------------------------------------------------------------------


def _sample_layer_ladies(
    graph: DeviceGraph,
    cfg: SamplerConfig,
    plan: CapacityPlan,
    layer: int,
    exp3_weights: Optional[jax.Array],
    key: jax.Array,
    seeds: jax.Array,
    seeds_mask: jax.Array,
) -> Tuple[Block, Dict[str, jax.Array]]:
    num = cfg.fanouts[layer]
    n_seed_cap = plan.dst_caps[layer]
    frontier = gather_in_edges(
        graph.csc_indptr, graph.csc_src, seeds, seeds_mask,
        plan.frontier_caps[layer],
        csc_src_grid=_edata_grid(graph, "csc_src"),
    )
    dense = (
        bool(plan.dense_cands[layer])
        if plan.dense_cands
        else False
    ) and plan.cand_caps[layer] > graph.n_nodes  # dense needs a dump slot
    if dense:
        cand = dense_candidates(
            seeds, seeds_mask, frontier, plan.cand_caps[layer], graph.n_nodes
        )
    else:
        cand = compact_candidates(
            seeds, seeds_mask, frontier, plan.cand_caps[layer], graph.n_nodes
        )

    # static normalized graph weight per frontier slot — a chunked row take.
    # Non-bandit samplers sample BY it; the bandit needs it only as the EXP3
    # alpha (bandit_sampler.py:144-147), carried into the block as e_alpha.
    w_static = jnp.where(
        frontier.e_mask,
        frontier_gather(frontier, graph.edata["w"],
                        grid=_edata_grid(graph, "w")).astype(jnp.float32),
        0.0,
    )
    if cfg.is_bandit:
        edge_w = _exp3_edge_prob(
            graph, exp3_row(exp3_weights, layer, cfg.n_layers), cfg.eta,
            frontier, seeds, n_seed_cap,
        )
        normalize_per_dst = True
    else:
        edge_w = w_static
        normalize_per_dst = False

    if cfg.importance_sampling:
        prob = _importance_node_prob(
            edge_w, frontier, cand, n_seed_cap, normalize_per_dst
        )
    else:
        prob = _uniform_node_prob(frontier, cand)

    if cand.mask is None:  # dense mode: membership == positive probability
        mask = (prob > 0) | cand.is_seed
        cand = cand._replace(
            mask=mask, n=jnp.sum(mask.astype(jnp.int32))
        )
        prob = jnp.where(mask, prob, 0.0)

    if cfg.is_poisson:
        p = _poisson_scale(prob, cand, num, cfg.poisson_eps, cfg.poisson_iters)
        sel = _bernoulli_select(key, p, cand.mask)
        node_prob = p
    else:
        sel = _gumbel_topk_select(key, prob, cand.mask, num)
        node_prob = prob

    block, bstats = _build_block(
        frontier, cand, sel, node_prob, edge_w, seeds, seeds_mask,
        extra_cap=plan.extra_caps[layer],
        e_blk_cap=plan.block_e_caps[layer],
        debias="bandit" if cfg.is_bandit else "ladies",
        alpha_w=w_static,
    )
    stats = {
        "frontier_edges": frontier.total_edges,
        "frontier_overflow": frontier.total_edges
        - jnp.sum(frontier.e_mask.astype(jnp.int32)),
        "n_candidates": cand.n,
        "n_selected": jnp.sum(sel.astype(jnp.int32)),
        **bstats,
    }
    return block, stats


def _segment_rank(dst_spos: jax.Array, key: jax.Array, e_mask: jax.Array):
    """Random rank of each edge within its dst segment (for uniform k-subset
    per dst).  Implemented as a two-pass stable sort (lexsort by (dst, u))."""
    e_cap = dst_spos.shape[0]
    u = jax.random.uniform(key, (e_cap,))
    order1 = jnp.argsort(jnp.where(e_mask, u, 2.0), stable=True)
    d1 = jnp.take(dst_spos, order1)
    m1 = jnp.take(e_mask, order1)
    order2 = jnp.argsort(jnp.where(m1, d1, jnp.iinfo(jnp.int32).max), stable=True)
    order = jnp.take(order1, order2)  # sorted by (dst, random), masked last
    sorted_dst = jnp.take(dst_spos, order)
    sorted_mask = jnp.take(e_mask, order)
    arange = jnp.arange(e_cap, dtype=jnp.int32)
    # first position of each dst value in the sorted list
    is_first = jnp.concatenate(
        [jnp.ones(1, bool), sorted_dst[1:] != sorted_dst[:-1]]
    ) & sorted_mask
    # rank within segment = position - (cummax of segment-start positions)
    start_cummax = jax.lax.cummax(jnp.where(is_first, arange, -1), axis=0)
    rank_sorted = arange - jnp.maximum(start_cummax, 0)
    rank = jnp.zeros(e_cap, dtype=jnp.int32).at[order].set(rank_sorted)
    return jnp.where(e_mask, rank, jnp.iinfo(jnp.int32).max)


def _sample_layer_neighbor(
    graph: DeviceGraph,
    cfg: SamplerConfig,
    plan: CapacityPlan,
    layer: int,
    key: jax.Array,
    seeds: jax.Array,
    seeds_mask: jax.Array,
    full: bool,
) -> Tuple[Block, Dict[str, jax.Array]]:
    """Uniform per-seed k-neighbor sampling (dgl.dataloading.NeighborSampler)
    and the full-neighbor baseline (MultiLayerFullNeighborSampler)."""
    n_seed_cap = plan.dst_caps[layer]
    frontier = gather_in_edges(
        graph.csc_indptr, graph.csc_src, seeds, seeds_mask,
        plan.frontier_caps[layer],
        csc_src_grid=_edata_grid(graph, "csc_src"),
    )
    if full:
        keep = frontier.e_mask
    else:
        rank = _segment_rank(frontier.dst_spos, key, frontier.e_mask)
        keep = frontier.e_mask & (rank < cfg.fanouts[layer])
    kept_frontier = frontier._replace(
        src_gid=jnp.where(keep, frontier.src_gid, 0),
        e_mask=keep,
    )
    cand = compact_candidates(
        seeds, seeds_mask, kept_frontier, plan.cand_caps[layer], graph.n_nodes
    )
    sel = cand.mask  # every candidate is kept
    ones = jnp.where(cand.mask, 1.0, 0.0)
    edge_w = jnp.where(keep, 1.0, 0.0)
    block, bstats = _build_block(
        kept_frontier, cand, sel, ones, edge_w, seeds, seeds_mask,
        extra_cap=plan.extra_caps[layer],
        e_blk_cap=plan.block_e_caps[layer],
        debias="none",
    )
    stats = {
        "frontier_edges": frontier.total_edges,
        "frontier_overflow": frontier.total_edges
        - jnp.sum(frontier.e_mask.astype(jnp.int32)),
        "n_candidates": cand.n,
        "n_selected": cand.n,
        **bstats,
    }
    return block, stats


# ---------------------------------------------------------------------------
# multi-layer driver
# ---------------------------------------------------------------------------


def sample_blocks(
    graph: DeviceGraph,
    cfg: SamplerConfig,
    plan: CapacityPlan,
    key: jax.Array,
    seeds: jax.Array,
    seeds_mask: jax.Array,
    exp3_weights: Optional[jax.Array] = None,
) -> Tuple[List[Block], Dict[str, jax.Array]]:
    """sample_blocks(g, seed_nodes) -> blocks, walking layers output-to-input
    and growing the seed set with each block's src table
    (bandit_sampler.py:341-367).

    ``blocks[0]`` is the input-most layer (the reference's blocks.insert(0, ·)
    ordering).  Pure function of (graph, exp3 state, PRNG key, seeds) — safe
    to jit / fuse into the train step.
    """
    L = cfg.n_layers
    assert seeds.shape[0] == plan.dst_caps[L - 1], (
        f"seed capacity {seeds.shape[0]} != plan {plan.dst_caps[L - 1]}"
    )
    blocks: List[Optional[Block]] = [None] * L
    stats: Dict[str, jax.Array] = {}
    for block_id in reversed(range(L)):
        key, sub = jax.random.split(key)
        if cfg.kind in LADIES_FAMILY:
            block, lstats = _sample_layer_ladies(
                graph, cfg, plan, block_id, exp3_weights, sub, seeds, seeds_mask
            )
        else:
            block, lstats = _sample_layer_neighbor(
                graph, cfg, plan, block_id, sub, seeds, seeds_mask,
                full=(cfg.kind == "full"),
            )
        seeds, seeds_mask = block.src_gids, block.src_mask
        blocks[block_id] = block
        for k, v in lstats.items():
            stats[f"layer{block_id}/{k}"] = v
    return blocks, stats


# ---------------------------------------------------------------------------
# EXP3 reward + arm-weight update
# ---------------------------------------------------------------------------


def _calculate_alpha(
    graph: DeviceGraph, cfg: SamplerConfig, block: Block,
    a_ij: Optional[jax.Array],
) -> jax.Array:
    """STEP_05 (bandit_sampler.py:140-158).

    sage/gcn: alpha = the static normalized graph weight w_e (the block's
    edata['w'], which DGL carries through every subgraph op — here the
    block's ``e_alpha``, gathered at frontier level instead of a per-edge
    scalar gather from the [E] global array).
    gat: alpha = (a_ij / sum_dst a_ij) * sum_dst q_ij with nan_to_num on the
    attention ratio (reference divides by the *dst* sum, :152 — the '[!] _u?'
    comment notwithstanding).
    """
    from bliss_gnn_tpu.ops.gather_pallas import maybe_lut_gather

    if cfg.model == "gat":
        assert a_ij is not None, "GAT reward needs per-edge attention a_ij"
        q = block.e_q
        n = block.n_dst_cap
        q_sum = masked_segment_sum(q, block.e_dst, n, block.e_mask)
        a = a_ij.astype(jnp.float32)
        a_sum = masked_segment_sum(a, block.e_dst, n, block.e_mask)
        ratio = a / maybe_lut_gather(a_sum, block.e_dst)
        ratio = jnp.nan_to_num(ratio)  # torch.nan_to_num defaults
        alpha = ratio * maybe_lut_gather(q_sum, block.e_dst)
    elif block.e_alpha is not None:
        alpha = block.e_alpha
    else:
        alpha = jnp.take(graph.edata["w"], block.eid).astype(jnp.float32)
    return jnp.where(block.e_mask, alpha, 0.0)


def _rewards_and_delta(
    graph: DeviceGraph, cfg: SamplerConfig, block: Block, alpha: jax.Array,
    embed_norm: jax.Array,
) -> jax.Array:
    """STEP_06 reward + clipped exponent, with the per-edge gathers FUSED.

    r_ij = alpha^2 / k_i * ||h_j||^2 / q_ij^2   (bandit_sampler.py:160-193)
    dr_e = min(delta * (r_e / P_src) / n_i, 1)  (bandit_sampler.py:236-246)

    All per-dst quantities (k_i = kept in-degree, n_i = full-graph
    in-degree, the optional paper delta) fold into ONE per-dst factor
    vector gathered by ``e_dst`` in one pass; the two per-src quantities
    (||h_src||, P_src) ride one interleaved-LUT pass by ``e_src`` — two
    gather passes total where the unfused chain paid four.  Masked edges
    carry 0 (multiplier 1)."""
    from bliss_gnn_tpu.ops.gather_pallas import maybe_lut_gather_multi

    k_i = block.in_degrees(dtype=jnp.float32)  # [n_dst_cap], kept degree
    safe_dst = jnp.where(block.dst_mask, block.dst_gids, 0)
    nd = safe_dst.shape[0]
    bounds = ptr_take(
        graph.csc_indptr, jnp.concatenate([safe_dst + 1, safe_dst])
    )
    n_i_seed = (bounds[:nd] - bounds[nd:]).astype(jnp.float32)
    if cfg.exp3_delta_formula:
        # paper delta (bandit_sampler.py:226-229, commented out upstream)
        k_seed = jnp.maximum(k_i, 1.0)
        n_seed = jnp.maximum(n_i_seed, 1.0)
        nom = (
            (1.0 - cfg.eta) * cfg.eta ** 4 * k_seed ** 5
            * jnp.log(jnp.maximum(n_seed / k_seed, 1.0))
        )
        delta_seed = jnp.sqrt(nom / (cfg.exp3_T * n_seed ** 4))
    else:
        delta_seed = jnp.full_like(n_i_seed, cfg.exp3_delta)  # constant
    # dr = (alpha^2 * inv_k) * (h^2 / q^2 / p_src) * (delta / n_i):
    # combine the per-dst pieces into dst_fac = inv_k * delta / max(n_i, 1)
    inv_k = jnp.where(k_i > 0, 1.0 / jnp.where(k_i > 0, k_i, 1.0), 0.0)
    dst_fac_seed = inv_k * delta_seed / jnp.maximum(n_i_seed, 1.0)
    e_dst_c = jnp.clip(block.e_dst, 0, block.n_dst_cap - 1)
    (dst_fac,) = maybe_lut_gather_multi([dst_fac_seed], e_dst_c)
    h, p_src = maybe_lut_gather_multi(
        [embed_norm.astype(jnp.float32), block.src_node_prob], block.e_src,
    )
    q = block.e_q
    h_div_q = (h * h) / jnp.where(q > 0, q * q, 1.0)
    r_over_p = (
        jnp.nan_to_num(alpha * alpha, posinf=0.0) * h_div_q
        / jnp.where(p_src > 0, p_src, 1.0)
    )
    dr = jnp.minimum(r_over_p * dst_fac, 1.0)  # delta_reward[>1] = 1
    return jnp.where(block.e_mask, dr, 0.0)


def exp3_edge_deltas(
    graph: DeviceGraph,
    cfg: SamplerConfig,
    blocks: Sequence[Block],
    embed_norms: Sequence[jax.Array],
    a_ijs: Optional[Sequence[Optional[jax.Array]]] = None,
) -> List[Tuple[jax.Array, jax.Array]]:
    """Per layer: (global eids [e_cap], exponents dr [e_cap]) — the sparse
    representation of the multiplicative update.  Under data parallelism
    these small lists are what gets all-gathered (instead of a dense [L, E]
    delta), so the arm weights stay globally consistent at negligible
    communication cost."""
    out = []
    for idx, block in enumerate(blocks):
        a_ij = None if a_ijs is None else a_ijs[idx]
        alpha = _calculate_alpha(graph, cfg, block, a_ij)
        dr = _rewards_and_delta(graph, cfg, block, alpha, embed_norms[idx])
        out.append((block.eid, dr))
    return out


def apply_exp3_deltas(
    exp3_weights: jax.Array,
    deltas: Sequence[Tuple[jax.Array, jax.Array]],
    normalize: bool = True,
    return_overflow: bool = False,
) -> jax.Array:
    """w[eid] *= exp(dr), then L1-normalize each row
    (bandit_sampler.py:248-249).  Scatter-multiply runs in the state dtype
    (no full-row f32 materialization — only the touched gather, one
    f32-accumulated row sum, and one scaled write); duplicate eids (e.g.
    the same edge updated by several data-parallel shards) compose
    multiplicatively, as scatter-mul applies every update.

    ``normalize=False`` defers the L1 normalization: every consumer of the
    arm weights renormalizes per dst (exp3_probabilities divides by the
    per-dst sum, bandit_sampler.py:129-131), so the row normalization is
    numeric hygiene only.  The fused train step skips it (its full-row
    sums + rescale were measured ~20 ms/step at Reddit's 115M edges) and
    the Trainer renormalizes every ``exp3_renorm_every`` steps (default
    64) — each touched weight grows by at most exp(1) per step (the update
    exponent is clipped at 1), so bf16 overflow (3.4e38 ~= e^88.7) needs
    ~89 consecutive unnormalized steps from a weight already at 1.

    All layers update through ONE 1-D scatter-multiply into the FLAT
    (donated) state buffer — the only formulation XLA executes in place at
    the fast scatter rate (measured 1.3 ms; per-row slice + jnp.stack
    ~27 ms, reshape-to-flat or 2-D indices 60-96 ms, all at Reddit's
    [3 x 115M] scale)."""
    L = len(deltas)
    if exp3_weights.ndim == 3:
        import jax as _jax

        from bliss_gnn_tpu.ops import exp3_pallas

        R = exp3_weights.shape[1]
        span = R * 128
        limit = L * span
        # no-op slots (padding / zero reward) carry idx = limit: they sort
        # to the tail of the streaming kernel's update list and are never
        # applied.  unique_indices is NOT claimed: duplicate eids (the same
        # edge updated by several data-parallel shards, or a repeated seed)
        # compose multiplicatively — sequential in-tile application.
        flat_idx = jnp.concatenate([
            jnp.where(
                dr.reshape(-1) != 0,
                eid.reshape(-1).astype(jnp.int32) + jnp.int32(l * span),
                jnp.int32(limit),
            )
            for l, (eid, dr) in enumerate(deltas)
        ])
        mult = jnp.concatenate([
            jnp.exp(dr).reshape(-1).astype(jnp.float32) for _, dr in deltas
        ])
        n_over = jnp.zeros((), jnp.int32)
        if _jax.default_backend() == "tpu" or exp3_pallas.INTERPRET:
            out, n_over = exp3_pallas.exp3_apply_streaming(
                exp3_weights, flat_idx, mult,
                interpret=exp3_pallas.INTERPRET,
            )
        else:  # CPU/tests: the flat scatter (reshape is free off-TPU)
            idx = jnp.minimum(flat_idx, limit - 1)  # limit-1 is padding
            m = jnp.where(flat_idx == limit, 1.0, mult).astype(
                exp3_weights.dtype)
            out = exp3_weights.reshape(-1).at[idx].multiply(m).reshape(
                exp3_weights.shape)
        if normalize:
            out = normalize_exp3_weights(out, L)
        return (out, n_over) if return_overflow else out
    # legacy flat state
    row_len = exp3_weights.shape[0] // L
    flat_idx = jnp.concatenate([
        jnp.where(
            dr.reshape(-1) != 0,
            eid.reshape(-1).astype(jnp.int32),
            jnp.int32(row_len - 1),
        ) + jnp.int32(idx * row_len)
        for idx, (eid, dr) in enumerate(deltas)
    ])
    mult = jnp.concatenate([
        jnp.exp(dr).astype(exp3_weights.dtype).reshape(-1)
        for _, dr in deltas
    ])
    out = exp3_weights.at[flat_idx].multiply(mult)
    if normalize:
        out = normalize_exp3_weights(out, L)
    return (out, jnp.zeros((), jnp.int32)) if return_overflow else out


def normalize_exp3_weights(
    exp3_weights: jax.Array, n_layers: int
) -> jax.Array:
    """L1-normalize every layer row (bandit_sampler.py:249) — the deferred
    half of apply_exp3_deltas(normalize=False).  Operates on the flat state
    (row sums via a 2-D view; fine here — this runs every
    ``exp3_renorm_every`` steps, not per step)."""
    if exp3_weights.ndim == 3:
        norm = jnp.sum(exp3_weights, axis=(1, 2), keepdims=True,
                       dtype=jnp.float32)
        inv = (1.0 / jnp.maximum(norm, 1e-12)).astype(exp3_weights.dtype)
        return exp3_weights * inv
    row_len = exp3_weights.shape[0] // n_layers
    w2 = exp3_weights.reshape(n_layers, row_len)
    norm = jnp.sum(w2, axis=-1, keepdims=True, dtype=jnp.float32)
    inv = (1.0 / jnp.maximum(norm, 1e-12)).astype(exp3_weights.dtype)
    return (w2 * inv).reshape(-1)


def exp3_update(
    graph: DeviceGraph,
    cfg: SamplerConfig,
    exp3_weights: jax.Array,
    blocks: Sequence[Block],
    embed_norms: Sequence[jax.Array],
    a_ijs: Optional[Sequence[Optional[jax.Array]]] = None,
    normalize: bool = True,
) -> jax.Array:
    """The post-backward bandit loop (bandit_sampler.py:251-267, driven from
    BatchSizeCallback.on_train_batch_end, train_lightning.py:463-471):
    per block — alpha, rewards, arm-weight update.  Pure function of the
    state; fuse into the train step.  See apply_exp3_deltas for the
    deferred-normalization contract."""
    deltas = exp3_edge_deltas(graph, cfg, blocks, embed_norms, a_ijs)
    return apply_exp3_deltas(exp3_weights, deltas, normalize=normalize)
