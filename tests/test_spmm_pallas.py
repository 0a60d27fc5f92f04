"""Banded SpMM kernel: layout construction + interpret-mode correctness.

The kernel itself runs on TPU (see bench.py); here the host layout builder
is checked exactly and the kernel logic runs under the Pallas interpreter
on CPU against a dense reference.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bliss_gnn_tpu.graph.structure import Graph
from bliss_gnn_tpu.ops.spmm_pallas import (
    BandedLayout,
    DeviceBandedLayout,
    build_banded_layout,
    spmm_via_pallas,
)


def _rand_graph(rng, n=700, e=6000):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    return Graph(src, dst, n)


def test_layout_covers_every_edge_once(rng):
    g = _rand_graph(rng)
    w = rng.random(g.n_edges).astype(np.float32)
    layout = build_banded_layout(g.csc_indptr, g.csc_src, w,
                                 band=256, wr=64, et=128)
    m = layout.meta
    perm = layout.edge_perm.reshape(-1)
    valid = perm[perm >= 0]
    assert sorted(valid.tolist()) == list(range(g.n_edges))
    dstv = np.repeat(np.arange(g.n_nodes), np.diff(g.csc_indptr))
    nt = m.nt_per_band
    sr = layout.src_rel.reshape(m.n_bands, nt, m.et)
    tw = layout.tile_win.reshape(-1)
    for t in range(m.n_tiles):
        b = t // nt
        for s in range(m.et):
            eid = layout.edge_perm[t, s]  # canonical eid (or -1 padding)
            if eid < 0:
                assert layout.edge_w[t, 0, s] == 0
                continue
            assert g.csc_src[eid] // m.band == b
            assert dstv[eid] // m.wr == tw[t]
            assert sr[b, t % nt, s] == g.csc_src[eid] - b * m.band
            assert layout.dst_rel[t, 0, s] == dstv[eid] - tw[t] * m.wr
            assert layout.edge_w[t, 0, s] == w[eid]
    # window runs: a first-flag starts each run, runs unique per band
    for b in range(m.n_bands):
        wins = layout.tile_win[b]
        firsts = layout.tile_first[b]
        seen = set()
        run_w = None
        for i in range(nt):
            if firsts[i]:
                assert (wins[i], ) not in seen or layout.edge_w[b*nt+i].sum() == 0
                seen.add((wins[i],))
                run_w = wins[i]
            else:
                assert wins[i] == run_w


def test_packed_kernel_matches_f32_kernel(rng):
    """bf16 pair-packed gather variant: identical results to the f32
    kernel (both feed the MXU in bf16), via bitcast unpack + the
    [evens|odds] feature permutation."""
    g = _rand_graph(rng, n=500, e=4000)
    w = rng.random(g.n_edges).astype(np.float32)
    layout = build_banded_layout(g.csc_indptr, g.csc_src, w,
                                 band=256, wr=64, et=256)
    dl = DeviceBandedLayout.from_host(layout)
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 130)).astype(np.float32))
    out_f32 = spmm_via_pallas(x, dl, g.n_nodes, interpret=True, packed=False)
    out_pk = spmm_via_pallas(x, dl, g.n_nodes, interpret=True, packed=True)
    np.testing.assert_allclose(
        np.asarray(out_pk), np.asarray(out_f32), rtol=1e-5, atol=1e-5
    )


def test_permute_weight_rows_consumes_packed_output(rng):
    """permuted_acc @ permute_weight_rows(W) == acc @ W (padded cols carry
    zeros so the padded rows of W never contribute)."""
    from bliss_gnn_tpu.ops.spmm_pallas import (
        permute_weight_rows,
        unpermute_features,
    )

    f, k = 130, 16
    fp = 256  # padded width the packed kernel produces
    y_perm = rng.normal(size=(8, fp)).astype(np.float32)
    # zero the padding slots ([evens|odds] of features >= f)
    col_feat = np.concatenate([np.arange(0, fp, 2), np.arange(1, fp, 2)])
    y_perm[:, col_feat >= f] = 0.0
    acc = np.asarray(unpermute_features(jnp.asarray(y_perm), f))
    w_full = rng.normal(size=(fp, k)).astype(np.float32)
    w_perm = np.asarray(permute_weight_rows(jnp.asarray(w_full)))
    np.testing.assert_allclose(
        y_perm @ w_perm, acc @ w_full[:f], rtol=1e-4, atol=1e-4
    )


def test_banded_spmm_interpret_matches_dense(rng):
    g = _rand_graph(rng, n=500, e=4000)
    w = rng.random(g.n_edges).astype(np.float32)
    layout = build_banded_layout(g.csc_indptr, g.csc_src, w,
                                 band=256, wr=64, et=256)
    dl = DeviceBandedLayout.from_host(layout)
    x = rng.normal(size=(g.n_nodes, 130)).astype(np.float32)
    out = spmm_via_pallas(jnp.asarray(x), dl, g.n_nodes, interpret=True)
    src, dst = g.edges()
    ref = np.zeros((g.n_nodes, 130), np.float32)
    for e in range(g.n_edges):
        ref[dst[e]] += w[e] * x[src[e]]
    # the one-hot contraction runs in bf16 -> compare in aggregate
    err = np.linalg.norm(np.asarray(out) - ref) / (np.linalg.norm(ref) + 1e-9)
    assert err < 1e-2, f"relative frobenius error {err}"
    np.testing.assert_allclose(np.asarray(out), ref, rtol=6e-2, atol=6e-2)
