"""Host-side node reorderings for the hybrid SpMM layout.

The hybrid SpMM (ops/spmm_pallas.py) splits the edge set into dense
(wr x sub) = (256 x 256) blocks (>= dense_t edges ride two one-hot MXU
contractions at ~2.35 cy/edge) and a gather remainder (~6.9 cy/edge).
Coverage — the fraction of edges in dense blocks — is therefore the
single knob on the kernel's blended rate, and it is purely a property of
the NODE ORDER: the degree sort concentrates hub rows/columns into the
top-left corner; a *community* order additionally concentrates
intra-community edges into diagonal super-blocks.

This module provides:
- ``propagate_labels``: plain label propagation (undirected votes,
  mode-of-neighbors update) — O(E log E) per iteration, host numpy.
- ``locality_perm``: permutations ``perm[new_id] = old_id`` under three
  policies: ``degree`` (the layout's historical default),
  ``cluster`` (community-major, communities by edge mass, nodes within a
  community by descending degree), ``hub-cluster`` (global top-degree
  hub block first, then cluster-major for the rest).
- ``dense_coverage``: the coverage statistic for a given perm — the
  host-side figure of merit that predicts kernel throughput via the
  cycle budget (spmm_pallas.py:585-636) without touching the TPU.

Measured verdict (scripts/probe_reorder.py, committed numbers in the
module docstring of that script): on the degree-matched Reddit synth
(uniform src endpoints — no community structure to find) every policy is
coverage-equivalent to the degree sort, as the permutation-invariance of
uniform src marginals predicts; on the SBM family (planted communities,
latent ids) the cluster orders lift coverage far above the degree sort.
``auto`` picks by measured coverage.

Reference: the workload is model.py:98 (SpMM over the full graph); the
reference has no analogous layout machinery (DGL stores the graph as
given).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _degrees(indptr: np.ndarray) -> np.ndarray:
    return np.diff(indptr)


def propagate_labels(
    indptr: np.ndarray,
    csc_src: np.ndarray,
    n_iters: int = 4,
    seed: int = 0,
) -> np.ndarray:
    """Label propagation on the undirected view: each node adopts the
    most common label among its neighbors (ties -> smallest label).
    Labels start as node ids; returns [N] int64 community labels
    (arbitrary ids, NOT compacted)."""
    n = len(indptr) - 1
    deg = _degrees(indptr)
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.asarray(csc_src, np.int64)
    # undirected votes: src -> dst and dst -> src
    voter = np.concatenate([src, dst])
    votee = np.concatenate([dst, src])
    lab = np.arange(n, dtype=np.int64)
    for _ in range(n_iters):
        key = votee * n + lab[voter]
        key.sort()
        votee_s = key // n
        lab_s = key % n
        # run-length encode (votee, label) pairs
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_votee = votee_s[starts]
        run_lab = lab_s[starts]
        run_cnt = np.diff(np.r_[starts, len(key)])
        # per votee, the run with max count; ties -> smallest label
        # (runs within a votee are label-ascending after the sort, and
        # np.maximum.reduceat keeps the FIRST max under stable order via
        # lexsort on (votee, -count, label))
        o = np.lexsort((run_lab, -run_cnt, run_votee))
        run_votee, run_lab = run_votee[o], run_lab[o]
        first = np.r_[True, run_votee[1:] != run_votee[:-1]]
        upd_nodes = run_votee[first]
        upd_labels = run_lab[first]
        new_lab = lab.copy()
        new_lab[upd_nodes] = upd_labels
        if np.array_equal(new_lab, lab):
            break
        lab = new_lab
    return lab


def locality_perm(
    indptr: np.ndarray,
    csc_src: np.ndarray,
    order: str = "cluster",
    labels: Optional[np.ndarray] = None,
    hub_count: int = 8192,
    lpa_iters: int = 4,
) -> np.ndarray:
    """Return ``perm[new_id] = old_id`` under the named policy."""
    n = len(indptr) - 1
    deg = _degrees(indptr)
    if order == "degree":
        return np.argsort(-deg, kind="stable").astype(np.int64)
    if labels is None:
        labels = propagate_labels(indptr, csc_src, n_iters=lpa_iters)
    # community edge mass = sum of member degrees (in-degree proxy)
    uniq, compact = np.unique(labels, return_inverse=True)
    mass = np.bincount(compact, weights=deg.astype(np.float64))
    comm_rank = np.argsort(np.argsort(-mass, kind="stable"), kind="stable")
    rank_of_node = comm_rank[compact]
    if order == "cluster":
        # community-major (massive first), degree-major within
        return np.lexsort((-deg, rank_of_node)).astype(np.int64)
    if order == "hub-cluster":
        # global hubs first (their rows/cols are dense against everyone),
        # then cluster-major for the remainder
        is_hub = np.zeros(n, bool)
        if hub_count > 0:
            is_hub[np.argsort(-deg, kind="stable")[:hub_count]] = True
        return np.lexsort((-deg, rank_of_node, ~is_hub * 1)).astype(np.int64)
    raise ValueError(f"unknown order '{order}'")


def dense_coverage(
    indptr: np.ndarray,
    csc_src: np.ndarray,
    perm: np.ndarray,
    dense_t: int = 300,
    band: int = 16384,
    wr: int = 256,
    sub: int = 256,
) -> Tuple[float, dict]:
    """Fraction of edges landing in (wr x sub) blocks with >= dense_t
    edges under ``perm`` — the host-side predictor of hybrid throughput.
    Returns (coverage, stats)."""
    n = len(indptr) - 1
    deg = _degrees(indptr)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    src = inv[np.asarray(csc_src, np.int64)]
    dst = inv[np.repeat(np.arange(n, dtype=np.int64), deg)]
    n_wins = -(-n // wr)
    subs_per_band = band // sub
    block_key = ((src // band) * subs_per_band + (src % band) // sub
                 ) * n_wins + dst // wr
    counts = np.bincount(block_key)
    dense = counts[block_key] >= dense_t
    cov = float(dense.mean()) if len(dense) else 0.0
    n_dense_blocks = int((counts >= dense_t).sum())
    stats = {
        "coverage": cov,
        "n_dense_blocks": n_dense_blocks,
        "dense_edges": int(dense.sum()),
        "n_edges": int(len(src)),
        # blended-rate prediction from the committed cycle budget
        # (spmm_pallas.py: dense tier ~2.35 cy/edge, gather ~6.9)
        "pred_cy_per_edge": 2.35 * cov + 6.9 * (1.0 - cov),
    }
    return cov, stats


def best_perm(
    indptr: np.ndarray,
    csc_src: np.ndarray,
    dense_t: int = 300,
    candidates: Tuple[str, ...] = ("degree", "cluster", "hub-cluster"),
    lpa_iters: int = 4,
) -> Tuple[np.ndarray, str, dict]:
    """auto policy: evaluate coverage under each candidate order and
    return (perm, winning_order, per-order coverage dict).  The LPA run
    is shared across cluster candidates."""
    labels = None
    if any(c != "degree" for c in candidates):
        labels = propagate_labels(indptr, csc_src, n_iters=lpa_iters)
    best = None
    covs = {}
    for c in candidates:
        p = locality_perm(indptr, csc_src, order=c, labels=labels)
        cov, _ = dense_coverage(indptr, csc_src, p, dense_t=dense_t)
        covs[c] = cov
        if best is None or cov > best[2]:
            best = (p, c, cov)
    return best[0], best[1], covs
