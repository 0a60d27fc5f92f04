"""Edge-partitioned full-graph aggregation across a device mesh.

The TPU analog of scaling the reference's full-graph inference
(model.py:335-383) and large-fanout aggregation beyond one chip
(SURVEY.md §5.7-5.8): partition the EDGES by contiguous dst ranges — each
device owns the CSC shard of its dst range — and run the aggregation as

    local segment-sum over the shard's edges (features replicated)
    -> output naturally sharded by dst
    -> all_gather over the mesh to re-replicate activations for the next
       layer (rides ICI)

With features replicated, no boundary exchange is needed; the all_gather
of [N/n_shards, F] per layer is the only collective.  (A feature-sharded
variant with boundary all-to-all is the round-2 extension for graphs whose
features exceed one HBM.)

The host-side partitioner pads every shard to the max shard size so the
stacked arrays shard cleanly over the mesh axis.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from bliss_gnn_tpu.graph.structure import Graph


def balanced_node_ranges(
    csc_indptr: np.ndarray, n_shards: int, balance: str = "mixed"
) -> Tuple[int, ...]:
    """Contiguous node range boundaries [S+1] over the dst axis.

    On power-law graphs the former equal-NODE cut ('nodes') skews
    per-shard edge counts (= ring-step compute) by the hub concentration;
    a pure equal-EDGE cut ('edges') fixes that but can blow up the NODE
    padding (node_per_shard = max range) when ids are degree-correlated —
    the tail shard then holds most of the nodes and every feature shard /
    segment-sum pays for it.  The default 'mixed' cut splits the combined
    weight w_i = deg_i + E/N at equal quantiles, bounding BOTH per-shard
    edges and nodes within ~2x of their balanced shares (measured: edge
    skew 1.0x-1.3x with node ranges within 2x of N/S even on
    degree-sorted ids — scripts/bench_scaling.py shard_balance_report)."""
    n = len(csc_indptr) - 1
    if balance == "nodes":
        per = -(-n // n_shards)
        return tuple(min(n, s * per) for s in range(n_shards + 1))
    ip = np.asarray(csc_indptr, np.int64)
    E = int(ip[-1])
    if balance == "edges":
        cum = ip
    else:  # mixed
        per_node = max(1, E // max(1, n))
        cum = ip + per_node * np.arange(n + 1, dtype=np.int64)
    total = int(cum[-1])
    targets = [(s * total) // n_shards for s in range(n_shards + 1)]
    lo = np.searchsorted(cum, targets, side="left")
    lo = np.maximum.accumulate(lo)
    lo[0], lo[-1] = 0, n
    return tuple(int(x) for x in lo)


def _range_row_maps(lo: Tuple[int, ...], node_per: int):
    """(scatter index [S*node_per] into global rows with -1 padding,
    gather index [n_nodes] from shard-layout rows) for variable
    contiguous node ranges padded to ``node_per`` rows per shard."""
    S = len(lo) - 1
    n = lo[-1]
    idx = np.full(S * node_per, -1, np.int64)
    inv = np.zeros(n, np.int64)
    for s in range(S):
        k = lo[s + 1] - lo[s]
        idx[s * node_per : s * node_per + k] = np.arange(lo[s], lo[s + 1])
        inv[lo[s] : lo[s + 1]] = s * node_per + np.arange(k)
    return idx, inv


@dataclasses.dataclass(frozen=True)
class EdgeShards:
    """Stacked per-device CSC shards (a pytree; leading dim = shard)."""

    dst_lo: jax.Array  # [S] first dst node of each shard
    n_dst: jax.Array  # [S] dst nodes owned by each shard
    e_src: jax.Array  # [S, Emax] global src ids (0-padded)
    e_dst_rel: jax.Array  # [S, Emax] dst - dst_lo
    e_w: jax.Array  # [S, Emax] f32 weights (0 on padding)
    e_mask: jax.Array  # [S, Emax]
    dst_per_shard: int = dataclasses.field(metadata=dict(static=True),
                                           default=0)
    lo: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True),
                                            default=())

    @staticmethod
    def build(g: Graph, n_shards: int, edge_vals: np.ndarray | None = None,
              balance: str = "mixed"):
        """Contiguous dst-range partition; ``balance`` picks the cut
        objective (see balanced_node_ranges — default 'mixed' bounds both
        per-shard edges and nodes, so Emax padding tracks ~E/S instead of
        the worst hub range)."""
        bounds = balanced_node_ranges(g.csc_indptr, n_shards, balance)
        dst_per = max(
            max(bounds[s + 1] - bounds[s] for s in range(n_shards)), 1
        )
        src, dst = g.edges()
        w = (np.ones(g.n_edges, np.float32) if edge_vals is None
             else np.asarray(edge_vals, np.float32))
        shards = []
        for s in range(n_shards):
            lo = bounds[s]
            hi = bounds[s + 1]
            e0, e1 = g.csc_indptr[lo], g.csc_indptr[hi]
            shards.append((lo, hi - lo, src[e0:e1], dst[e0:e1] - lo, w[e0:e1]))
        emax = max(max(len(x[2]) for x in shards), 1)
        S = n_shards
        e_src = np.zeros((S, emax), np.int32)
        e_dst_rel = np.zeros((S, emax), np.int32)
        e_w = np.zeros((S, emax), np.float32)
        e_mask = np.zeros((S, emax), bool)
        dst_lo = np.zeros(S, np.int32)
        n_dst = np.zeros(S, np.int32)
        for s, (lo, nd, ss, dd, ww) in enumerate(shards):
            k = len(ss)
            dst_lo[s], n_dst[s] = lo, nd
            e_src[s, :k] = ss
            e_dst_rel[s, :k] = dd
            e_w[s, :k] = ww
            e_mask[s, :k] = True
        return EdgeShards(
            dst_lo=jnp.asarray(dst_lo), n_dst=jnp.asarray(n_dst),
            e_src=jnp.asarray(e_src), e_dst_rel=jnp.asarray(e_dst_rel),
            e_w=jnp.asarray(e_w), e_mask=jnp.asarray(e_mask),
            dst_per_shard=dst_per, lo=bounds,
        )


jax.tree_util.register_dataclass(
    EdgeShards,
    data_fields=["dst_lo", "n_dst", "e_src", "e_dst_rel", "e_w", "e_mask"],
    meta_fields=["dst_per_shard", "lo"],
)


def make_sharded_spmm(mesh: Mesh, dst_per_shard: int, axis: str = "dp"):
    """Build a jitted sharded SpMM:
    (e_src, e_dst_rel, e_w, e_mask [S, Emax]; x [N, F] replicated) ->
    [S*dst_per_shard, F] f32 sharded by dst range.

    Inside shard_map each device computes its local masked segment-sum; the
    out_spec P(axis) makes the result dst-sharded (XLA inserts an
    all_gather only where a consumer needs replication)."""
    from jax import shard_map

    ckey = ("sharded", mesh, dst_per_shard, axis)
    cached = _RING_CACHE.get(ckey)
    if cached is not None:
        return cached

    def local(e_src, e_dst_rel, e_w, e_mask, x):
        # each device sees its leading-dim-1 shard slice
        src, dst_rel = e_src[0], e_dst_rel[0]
        w, mask = e_w[0], e_mask[0]
        msg = jnp.take(x, src, axis=0).astype(jnp.float32)
        msg = msg * jnp.where(mask, w, 0.0)[:, None]
        # NOT indices_are_sorted: masked tail slots carry dst_rel=0 after
        # larger indices (they add 0, but the promise would be a lie)
        return jax.ops.segment_sum(
            msg, jnp.where(mask, dst_rel, 0),
            num_segments=dst_per_shard,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    jitted = jax.jit(fn)
    _RING_CACHE[ckey] = jitted
    return jitted


def sharded_mean_aggregate(
    mesh: Mesh, shards: EdgeShards, x: jax.Array, in_degrees: jax.Array,
    n_nodes: int, axis: str = "dp",
) -> jax.Array:
    """Full-graph mean aggregation, edge-sharded: returns [N, F] f32.
    The building block for multi-chip layerwise inference."""
    spmm = make_sharded_spmm(mesh, shards.dst_per_shard, axis)
    out = spmm(shards.e_src, shards.e_dst_rel, shards.e_w, shards.e_mask, x)
    # shard-layout rows -> global node order (variable balanced ranges)
    _, inv = _range_row_maps(shards.lo, shards.dst_per_shard)
    out = jnp.take(out, jnp.asarray(inv), axis=0)
    deg = jnp.maximum(in_degrees.astype(jnp.float32), 1.0)
    return out / deg[:, None]


# ---------------------------------------------------------------------------
# Ring SpMM: features sharded too (graphs whose activations exceed one HBM)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RingEdgeShards:
    """Doubly-partitioned CSC: shard s owns dst range s, with its edges
    bucketed by the SRC's owner shard — bucket b is processed at the ring
    step when block b's features are resident.

    Unlike :class:`EdgeShards` (features replicated, one all_gather), both
    the feature matrix and the activations stay sharded [N/S, F]: per-device
    memory is O(N/S + E/S), the collective is S-1 ``ppermute`` rotations of
    one feature shard (bandwidth-optimal, same total bytes as the
    all_gather but never materializing [N, F] anywhere), and each rotation
    overlaps with the local bucket's segment-sum.
    """

    e_src_rel: jax.Array  # [S, S, Eb] src - lo[owner] (0-padded)
    e_dst_rel: jax.Array  # [S, S, Eb] dst - lo[s]
    e_w: jax.Array  # [S, S, Eb] f32 (0 on padding)
    node_per_shard: int = dataclasses.field(metadata=dict(static=True),
                                            default=0)
    n_shards: int = dataclasses.field(metadata=dict(static=True), default=0)
    lo: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True),
                                            default=())

    @staticmethod
    def build(g: Graph, n_shards: int, edge_vals: np.ndarray | None = None,
              balance: str = "mixed"):
        bounds = balanced_node_ranges(g.csc_indptr, n_shards, balance)
        node_per = max(
            max(bounds[s + 1] - bounds[s] for s in range(n_shards)), 1
        )
        src, dst = g.edges()
        w = (np.ones(g.n_edges, np.float32) if edge_vals is None
             else np.asarray(edge_vals, np.float32))
        lo_arr = np.asarray(bounds[:-1])
        buckets = {}
        for s in range(n_shards):
            lo = bounds[s]
            hi = bounds[s + 1]
            e0, e1 = int(g.csc_indptr[lo]), int(g.csc_indptr[hi])
            b_of_e = np.searchsorted(
                np.asarray(bounds), src[e0:e1], side="right"
            ) - 1
            for b in range(n_shards):
                m = b_of_e == b
                buckets[(s, b)] = (
                    src[e0:e1][m] - lo_arr[b],
                    dst[e0:e1][m] - lo,
                    w[e0:e1][m],
                )
        emax = max(max((len(v[0]) for v in buckets.values()), default=0), 1)
        S = n_shards
        e_src_rel = np.zeros((S, S, emax), np.int32)
        e_dst_rel = np.zeros((S, S, emax), np.int32)
        e_w = np.zeros((S, S, emax), np.float32)
        for (s, b), (ss, dd, ww) in buckets.items():
            k = len(ss)
            e_src_rel[s, b, :k] = ss
            e_dst_rel[s, b, :k] = dd
            e_w[s, b, :k] = ww
        return RingEdgeShards(
            e_src_rel=jnp.asarray(e_src_rel),
            e_dst_rel=jnp.asarray(e_dst_rel),
            e_w=jnp.asarray(e_w),
            node_per_shard=node_per, n_shards=S, lo=bounds,
        )

    def shard_rows(self, x: np.ndarray) -> np.ndarray:
        """Global [N, ...] host rows -> padded shard layout
        [S * node_per_shard, ...] (row s*np+i = node lo[s]+i)."""
        out = np.zeros((self.n_shards * self.node_per_shard,) + x.shape[1:],
                       x.dtype)
        for s in range(self.n_shards):
            k = self.lo[s + 1] - self.lo[s]
            out[s * self.node_per_shard : s * self.node_per_shard + k] = (
                x[self.lo[s] : self.lo[s + 1]]
            )
        return out

    def unshard_rows(self, y: jax.Array) -> jax.Array:
        """Padded shard layout -> global node order [N, ...]."""
        _, inv = _range_row_maps(self.lo, self.node_per_shard)
        return jnp.take(y, jnp.asarray(inv), axis=0)


jax.tree_util.register_dataclass(
    RingEdgeShards,
    data_fields=["e_src_rel", "e_dst_rel", "e_w"],
    meta_fields=["node_per_shard", "n_shards", "lo"],
)


_RING_CACHE: dict = {}


def make_ring_spmm(mesh: Mesh, shards_meta: Tuple[int, int],
                   axis: str = "dp"):
    """Build the ring-rotated, fully-sharded SpMM.

    (e_src_rel, e_dst_rel, e_w [S, S, Eb]; x [S*node_per, F] node-sharded)
    -> [S*node_per, F] f32, node-sharded.  At ring step k device ``me``
    holds feature block ``(me - k) mod S`` (after k ``ppermute`` rotations
    towards the next device) and folds in its bucket for that block; the
    rotation and the bucket's gather+segment-sum are independent per step,
    so XLA overlaps the ICI transfer with compute."""
    from jax import shard_map

    node_per, S = shards_meta
    # memoize the shard_map+jit closure: rebuilding it per call recompiles
    # the ring kernel (~15-20 s sort-lowering compiles through the remote-
    # compile tunnel) — advisor finding
    ckey = (mesh, node_per, S, axis)
    cached = _RING_CACHE.get(ckey)
    if cached is not None:
        return cached
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local(e_src_rel, e_dst_rel, e_w, x_shard):
        me = jax.lax.axis_index(axis)
        x0 = x_shard.astype(jnp.float32)
        acc0 = jnp.zeros((node_per, x_shard.shape[-1]), jnp.float32)

        def fold(k, x_cur, acc):
            b = jax.lax.rem(me - k + S, S)  # block resident at step k
            src = jax.lax.dynamic_index_in_dim(e_src_rel[0], b, 0, False)
            dstr = jax.lax.dynamic_index_in_dim(e_dst_rel[0], b, 0, False)
            w = jax.lax.dynamic_index_in_dim(e_w[0], b, 0, False)
            msg = jnp.take(x_cur, src, axis=0) * w[:, None]
            # NOT indices_are_sorted: zero-padded bucket tails carry
            # dst_rel=0 after larger indices (the padding adds exactly 0,
            # but the sortedness promise would be a lie)
            return acc + jax.ops.segment_sum(
                msg, dstr, num_segments=node_per,
            )

        def body(k, carry):
            x_cur, acc = carry
            acc = fold(k, x_cur, acc)
            x_nxt = jax.lax.ppermute(x_cur, axis, perm)
            return (x_nxt, acc)

        # S-1 rotations: the last resident block is folded outside the loop
        # so no final (discarded) ppermute is paid
        x_last, acc = jax.lax.fori_loop(0, S - 1, body, (x0, acc0))
        return fold(S - 1, x_last, acc)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    jitted = jax.jit(fn)
    _RING_CACHE[ckey] = jitted
    return jitted


def make_ring_gat(mesh: Mesh, shards_meta: Tuple[int, int],
                  heads: int, odim: int, negative_slope: float,
                  axis: str = "dp"):
    """Ring-rotated, fully-sharded GATv2 attention aggregation.

    The edge softmax is PER DST (dglnn.functional.edge_softmax,
    reference model.py:89), and RingEdgeShards partitions edges by
    contiguous dst ranges — so the softmax is shard-local and only the
    SRC features ride the ring.  Per ring step the shard folds in its
    bucket of edges whose src block is resident, maintaining a
    flash-attention-style online softmax per (dst, head): running max m,
    denominator d, and weighted feature sums in the running-max frame
    (same recurrence as ops/gat_pallas.py, here in XLA inside shard_map).

    (e_src_rel, e_dst_rel, e_w [S, S, Eb]; feat [S*node_per, H, O]
    node-sharded f32) -> [S*node_per, H, O] f32 node-sharded.  ``e_w`` only
    marks valid slots (build the shards with unit edge_vals).
    GATv2 logit semantics mirror models/layers.py:
    e = sum_O(leakyrelu(feat_src + feat_dst) * attn) per head.
    """
    from jax import shard_map

    node_per, S = shards_meta
    ckey = ("gat", mesh, node_per, S, heads, odim, negative_slope, axis)
    cached = _RING_CACHE.get(ckey)
    if cached is not None:
        return cached
    perm = [(i, (i + 1) % S) for i in range(S)]
    NEG = -1e30

    def local(e_src_rel, e_dst_rel, e_w, feat_shard, attn):
        me = jax.lax.axis_index(axis)
        x0 = feat_shard.astype(jnp.float32)  # [node_per, H, O]
        f_dst = x0  # dst features are the shard's own block (dst-local)
        a = attn.reshape(heads, odim).astype(jnp.float32)
        m0 = jnp.full((node_per, heads), NEG, jnp.float32)
        d0 = jnp.zeros((node_per, heads), jnp.float32)
        acc0 = jnp.zeros((node_per, heads, odim), jnp.float32)

        def fold(k, x_cur, carry):
            m, d, acc = carry
            b = jax.lax.rem(me - k + S, S)
            src = jax.lax.dynamic_index_in_dim(e_src_rel[0], b, 0, False)
            dstr = jax.lax.dynamic_index_in_dim(e_dst_rel[0], b, 0, False)
            w = jax.lax.dynamic_index_in_dim(e_w[0], b, 0, False)
            valid = w > 0
            fs = jnp.take(x_cur, src, axis=0)  # [Eb, H, O]
            fd = jnp.take(f_dst, dstr, axis=0)
            z = fs + fd
            z = jnp.where(z >= 0, z, negative_slope * z)
            e = jnp.einsum("ehc,hc->eh", z, a)
            e = jnp.where(valid[:, None], e, NEG)
            m_b = jax.ops.segment_max(e, dstr, num_segments=node_per)
            m_new = jnp.maximum(m, m_b)
            # w_e and the rescale must share one max frame (gat_pallas.py)
            w_e = jnp.where(
                valid[:, None],
                jnp.exp(e - jnp.take(m_new, dstr, axis=0)), 0.0,
            )
            scale = jnp.exp(m - m_new)
            acc = acc * scale[:, :, None] + jax.ops.segment_sum(
                fs * w_e[:, :, None], dstr, num_segments=node_per,
            )
            d = d * scale + jax.ops.segment_sum(
                w_e, dstr, num_segments=node_per,
            )
            return m_new, d, acc

        def body(k, state):
            x_cur, carry = state
            carry = fold(k, x_cur, carry)
            x_nxt = jax.lax.ppermute(x_cur, axis, perm)
            return (x_nxt, carry)

        x_last, carry = jax.lax.fori_loop(0, S - 1, body, (x0, (m0, d0, acc0)))
        _, d, acc = fold(S - 1, x_last, carry)
        d = jnp.maximum(d, jnp.finfo(jnp.float32).tiny)
        return acc / d[:, :, None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    jitted = jax.jit(fn)
    _RING_CACHE[ckey] = jitted
    return jitted


def ring_mean_aggregate(
    mesh: Mesh, shards: RingEdgeShards, x: jax.Array, in_degrees: jax.Array,
    n_nodes: int, axis: str = "dp",
) -> jax.Array:
    """Fully-sharded full-graph mean aggregation: features AND output stay
    node-sharded over the mesh; returns [N, F] f32.  ``x`` is global
    [N, F] rows (relayouted into the balanced shard ranges internally)."""
    idx, _ = _range_row_maps(shards.lo, shards.node_per_shard)
    idx_j = jnp.asarray(idx)
    xs = jnp.where(
        (idx_j >= 0)[:, None],
        jnp.take(x, jnp.clip(idx_j, 0, x.shape[0] - 1), axis=0), 0,
    )
    spmm = make_ring_spmm(mesh, (shards.node_per_shard, shards.n_shards), axis)
    out = spmm(shards.e_src_rel, shards.e_dst_rel, shards.e_w, xs)
    out = shards.unshard_rows(out)[:n_nodes]
    deg = jnp.maximum(in_degrees.astype(jnp.float32), 1.0)
    return out / deg[:, None]
