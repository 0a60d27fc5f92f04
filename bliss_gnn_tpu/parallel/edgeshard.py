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

    @staticmethod
    def build(g: Graph, n_shards: int, edge_vals: np.ndarray | None = None):
        """Contiguous dst-range partition with equal node counts (edge-count
        balancing via degree-aware splits is a straightforward refinement)."""
        dst_per = -(-g.n_nodes // n_shards)
        src, dst = g.edges()
        w = (np.ones(g.n_edges, np.float32) if edge_vals is None
             else np.asarray(edge_vals, np.float32))
        shards = []
        for s in range(n_shards):
            lo = s * dst_per
            hi = min(g.n_nodes, lo + dst_per)
            e0, e1 = g.csc_indptr[lo], g.csc_indptr[min(hi, g.n_nodes)]
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
            dst_per_shard=dst_per,
        )


jax.tree_util.register_dataclass(
    EdgeShards,
    data_fields=["dst_lo", "n_dst", "e_src", "e_dst_rel", "e_w", "e_mask"],
    meta_fields=["dst_per_shard"],
)


def make_sharded_spmm(mesh: Mesh, dst_per_shard: int, axis: str = "dp"):
    """Build a jitted sharded SpMM:
    (e_src, e_dst_rel, e_w, e_mask [S, Emax]; x [N, F] replicated) ->
    [S*dst_per_shard, F] f32 sharded by dst range.

    Inside shard_map each device computes its local masked segment-sum; the
    out_spec P(axis) makes the result dst-sharded (XLA inserts an
    all_gather only where a consumer needs replication)."""
    from jax import shard_map

    def local(e_src, e_dst_rel, e_w, e_mask, x):
        # each device sees its leading-dim-1 shard slice
        src, dst_rel = e_src[0], e_dst_rel[0]
        w, mask = e_w[0], e_mask[0]
        msg = jnp.take(x, src, axis=0).astype(jnp.float32)
        msg = msg * jnp.where(mask, w, 0.0)[:, None]
        return jax.ops.segment_sum(
            msg, jnp.where(mask, dst_rel, 0),
            num_segments=dst_per_shard,
            indices_are_sorted=True,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_mean_aggregate(
    mesh: Mesh, shards: EdgeShards, x: jax.Array, in_degrees: jax.Array,
    n_nodes: int, axis: str = "dp",
) -> jax.Array:
    """Full-graph mean aggregation, edge-sharded: returns [N, F] f32.
    The building block for multi-chip layerwise inference."""
    spmm = make_sharded_spmm(mesh, shards.dst_per_shard, axis)
    out = spmm(shards.e_src, shards.e_dst_rel, shards.e_w, shards.e_mask, x)
    out = out[:n_nodes]
    deg = jnp.maximum(in_degrees.astype(jnp.float32), 1.0)
    return out / deg[:, None]
