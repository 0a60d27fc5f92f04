"""Graph containers: host-side (numpy) construction, device-side (jnp) residency.

The reference delegates graph storage to DGL's C++ core (CSC formats pinned at
train_lightning.py:373, int32 cast at :340-342, self-loop canonicalization at
:334-335).  Here the canonical storage is a pair of int32 index arrays:

- CSC (in-edges):  ``csc_indptr[N+1]``, ``csc_src[E]`` — edges grouped by dst.
  The *canonical edge id* of an edge is its position in CSC order.  All edge
  data (normalized weights, EXP3 arm weights) is indexed by canonical eids.
- CSR (out-edges): ``csr_indptr[N+1]``, ``csr_dst[E]``, ``csr_eid[E]`` — the
  same edges grouped by src, with ``csr_eid`` mapping back to canonical ids.

Host-side construction is numpy (one-time preprocessing, mirroring the
reference's host-side graph prep); a native C++ builder in ``native/`` is used
when available for large graphs.  The :class:`DeviceGraph` is a pytree of
jnp arrays resident in HBM.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _build_csc(src: np.ndarray, dst: np.ndarray, n_nodes: int):
    """Group edges by dst.  Returns (indptr, src_sorted, perm) where perm maps
    CSC position -> original input edge position (stable within a dst)."""
    order = np.argsort(dst, kind="stable")
    dst_sorted = dst[order]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(indptr, dst_sorted + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, src[order], order


def _build_csr_from_csc(csc_indptr, csc_src, n_nodes: int):
    """Build CSR (grouped by src) with eid mapping to canonical (CSC) ids."""
    n_edges = csc_src.shape[0]
    dst_of_eid = np.repeat(
        np.arange(n_nodes, dtype=np.int64), np.diff(csc_indptr)
    )
    order = np.argsort(csc_src, kind="stable")
    csr_dst = dst_of_eid[order]
    csr_eid = order
    src_sorted = csc_src[order]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(indptr, src_sorted + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, csr_dst, csr_eid


class Graph:
    """Host-side graph in canonical CSC/CSR form with node/edge data dicts.

    Mirrors the reference's graph surface (dgl.DGLGraph as used by
    bandit_sampler.py / model.py): ``ndata`` holds 'features', 'labels',
    'train_mask'/'val_mask'/'test_mask'; ``edata`` holds the normalized
    weight 'w'.
    """

    def __init__(
        self,
        src: np.ndarray,
        dst: np.ndarray,
        n_nodes: int,
        ndata: Optional[Dict[str, np.ndarray]] = None,
        edata: Optional[Dict[str, np.ndarray]] = None,
    ):
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        assert src.shape == dst.shape
        self.n_nodes = int(n_nodes)
        self.n_edges = int(src.shape[0])
        # native C++ builders when available (native/graphcore.cpp); the
        # numpy fallbacks produce bit-identical arrays (tested)
        from bliss_gnn_tpu.graph import native as _native

        if _native.available():
            csc_indptr, csc_src, perm = _native.build_csc(
                src, dst, self.n_nodes
            )
            csr_indptr, csr_dst, csr_eid = _native.build_csr_from_csc(
                csc_indptr, csc_src, self.n_nodes
            )
        else:
            csc_indptr, csc_src, perm = _build_csc(src, dst, self.n_nodes)
            csr_indptr, csr_dst, csr_eid = _build_csr_from_csc(
                csc_indptr, csc_src, self.n_nodes
            )
        self.csc_indptr = csc_indptr
        self.csc_src = csc_src
        self.csr_indptr = csr_indptr
        self.csr_dst = csr_dst
        self.csr_eid = csr_eid
        self.ndata: Dict[str, np.ndarray] = dict(ndata or {})
        # Edge data arrives in input edge order; re-index to canonical order.
        self.edata: Dict[str, np.ndarray] = {
            k: np.asarray(v)[perm] for k, v in (edata or {}).items()
        }
        # For callers who need to map input edge order -> canonical eids.
        self.input_to_canonical_eid = np.argsort(perm, kind="stable")

    # -- degrees ---------------------------------------------------------
    def in_degrees(self) -> np.ndarray:
        return np.diff(self.csc_indptr)

    def out_degrees(self) -> np.ndarray:
        return np.diff(self.csr_indptr)

    # -- edge views ------------------------------------------------------
    def edges(self):
        """(src, dst) in canonical eid order."""
        dst = np.repeat(
            np.arange(self.n_nodes, dtype=np.int64), np.diff(self.csc_indptr)
        )
        return self.csc_src.copy(), dst

    # -- canonicalization (parity: train_lightning.py:334-342) ----------
    def remove_self_loops(self) -> "Graph":
        src, dst = self.edges()
        keep = src != dst
        return self._rebuild(src[keep], dst[keep], self._edata_rows(keep))

    def add_self_loops(self) -> "Graph":
        src, dst = self.edges()
        loop = np.arange(self.n_nodes, dtype=np.int64)
        new_src = np.concatenate([src, loop])
        new_dst = np.concatenate([dst, loop])
        edata = {
            k: np.concatenate(
                [v, np.zeros((self.n_nodes,) + v.shape[1:], dtype=v.dtype)]
            )
            for k, v in self.edata.items()
        }
        return self._rebuild(new_src, new_dst, edata)

    def to_undirected(self) -> "Graph":
        """Double every edge with its reverse (parity: train_lightning.py:337-339,
        which calls g.add_edges(dst, src) — duplicates allowed)."""
        src, dst = self.edges()
        new_src = np.concatenate([src, dst])
        new_dst = np.concatenate([dst, src])
        edata = {k: np.concatenate([v, v]) for k, v in self.edata.items()}
        return self._rebuild(new_src, new_dst, edata)

    def _edata_rows(self, mask):
        return {k: v[mask] for k, v in self.edata.items()}

    def _rebuild(self, src, dst, edata):
        g = Graph(src, dst, self.n_nodes, ndata=self.ndata, edata=edata)
        return g

    @staticmethod
    def canonicalize(g: "Graph", undirected: bool = False) -> "Graph":
        """remove_self_loop + add_self_loop (+ optional undirected doubling),
        matching the reference's preprocessing order
        (train_lightning.py:334-339)."""
        g = g.remove_self_loops().add_self_loops()
        if undirected:
            g = g.to_undirected()
        return g

    # -- device upload ---------------------------------------------------
    def to_device(self, feature_dtype=jnp.bfloat16) -> "DeviceGraph":
        idx_dtype = (
            jnp.int32
            if max(self.n_nodes, self.n_edges) <= 2e9
            else jnp.int64
        )
        nd = {}
        for k, v in self.ndata.items():
            if k == "features":
                nd[k] = jnp.asarray(v, dtype=feature_dtype)
            else:
                nd[k] = jnp.asarray(v)
        # edge-indexed arrays carry EDGE_PAD trailing zeros so the sampler's
        # chunk-granular slice gathers never clamp (sampling/frontier.py)
        from bliss_gnn_tpu.sampling.frontier import EDGE_PAD

        def _pad_e(a):
            pad_shape = (EDGE_PAD,) + a.shape[1:]
            return np.concatenate([a, np.zeros(pad_shape, a.dtype)])

        ed = {k: jnp.asarray(_pad_e(np.asarray(v)))
              for k, v in self.edata.items()}
        # pre-shaped [R, 128] copies of the sampler-gathered edge arrays:
        # the flat->2-D view costs a whole-array relayout per sample call
        # otherwise (frontier.py:frontier_gather).  Skipped at beyond-HBM
        # scale (the sharded/UVA storages manage their own layouts).
        if idx_dtype == jnp.int32 and self.n_edges < 500_000_000:
            from bliss_gnn_tpu.sampling.frontier import edge_grid

            ed["__grid__csc_src"] = jnp.asarray(
                edge_grid(np.asarray(self.csc_src, np.int32)))
            for k in list(self.edata):
                v = np.asarray(self.edata[k])
                if v.ndim == 1:
                    ed[f"__grid__{k}"] = jnp.asarray(edge_grid(v))
        return DeviceGraph(
            n_nodes=self.n_nodes,
            n_edges=self.n_edges,
            csc_indptr=jnp.asarray(self.csc_indptr, dtype=idx_dtype),
            csc_src=jnp.asarray(_pad_e(self.csc_src), dtype=idx_dtype),
            csr_indptr=jnp.asarray(self.csr_indptr, dtype=idx_dtype),
            csr_dst=jnp.asarray(self.csr_dst, dtype=idx_dtype),
            csr_eid=jnp.asarray(self.csr_eid, dtype=idx_dtype),
            ndata=nd,
            edata=ed,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceGraph:
    """HBM-resident graph: int32 CSC/CSR index arrays + node/edge data.

    A pytree — passes through jit/shard_map directly.  ``n_nodes``/``n_edges``
    are static (Python ints) so capacity planning stays compile-time.
    """

    csc_indptr: jax.Array
    csc_src: jax.Array
    csr_indptr: jax.Array
    csr_dst: jax.Array
    csr_eid: jax.Array
    ndata: Dict[str, jax.Array]
    edata: Dict[str, jax.Array]
    n_nodes: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_edges: int = dataclasses.field(metadata=dict(static=True), default=0)

    def in_degrees(self) -> jax.Array:
        return self.csc_indptr[1:] - self.csc_indptr[:-1]

    def out_degrees(self) -> jax.Array:
        return self.csr_indptr[1:] - self.csr_indptr[:-1]

    @property
    def edge_dst(self) -> jax.Array:
        """dst node of every edge, canonical order (derived, O(E))."""
        return jnp.searchsorted(
            self.csc_indptr,
            jnp.arange(self.n_edges, dtype=self.csc_indptr.dtype),
            side="right",
        ).astype(self.csc_src.dtype) - 1


def normalized_edata(
    g: Graph, weight: Optional[str] = None, multiply_weight: bool = True
) -> np.ndarray:
    """Per-dst-normalized edge weights.

    Reference has two divergent versions; the bandit one wins in the harness
    (train_lightning.py:36,359,362 imports from bandit_sampler):
      - bandit_sampler.py:20-27:  w_e = W_e / sum_{e' into dst(e)} W_e'   (multiply_weight=True)
      - ladies_sampler.py:15-22:  w_e = 1 / sum_{e' into dst(e)} W_e'     (multiply_weight=False)
    With W=1 (the only harness usage) both reduce to 1/in_deg(dst).
    Returned in canonical eid order, float32 (cast to bf16 at upload).
    """
    if weight is None:
        W = np.ones(g.n_edges, dtype=np.float32)
    else:
        W = np.asarray(g.edata[weight], dtype=np.float32)
    if multiply_weight:
        # native single-pass over the CSC ranges (graphcore.cpp
        # normalized_edata_c) — np.add.at is ~20x slower at Reddit scale
        from bliss_gnn_tpu.graph.native import normalized_edata_native

        out = normalized_edata_native(
            np.asarray(g.csc_indptr), None if weight is None else W,
            g.n_edges,
        )
        if out is not None:
            return out
    dst = np.repeat(np.arange(g.n_nodes), np.diff(g.csc_indptr))
    sums = np.zeros(g.n_nodes, dtype=np.float32)
    np.add.at(sums, dst, W)
    denom = sums[dst]
    out = np.where(denom > 0, (W if multiply_weight else 1.0) / np.where(denom > 0, denom, 1.0), 0.0)
    return out.astype(np.float32)
