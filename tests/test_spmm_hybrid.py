"""Hybrid (dense-block + gather) SpMM correctness in interpret mode.

Two test modes:
- exact: integer features and unit weights are exactly representable in
  bf16 and their per-window sums fit f32 — any indexing/permutation bug
  shows as a hard mismatch;
- random: f32 features/weights with bf16 one-hot contraction tolerance
  (same class as the base banded kernel on high-degree rows).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from bliss_gnn_tpu.graph.structure import _build_csc
from bliss_gnn_tpu.ops.spmm_pallas import (
    DeviceHybridLayout,
    build_hybrid_layout,
    spmm_via_pallas_hybrid,
)


def _ref(csc_indptr, csc_src, w, x, n):
    out = np.zeros((n, x.shape[1]), np.float32)
    dst = np.repeat(np.arange(n), np.diff(csc_indptr))
    np.add.at(out, dst, x[csc_src].astype(np.float32) * w[:, None])
    return out


def _mk_graph(n, e, hub_frac=0.7, seed=0, unit_w=False):
    rng = np.random.default_rng(seed)
    n_hub = max(2, n // 50)
    hubs = rng.choice(n, n_hub, replace=False)
    e_hub = int(e * hub_frac)
    dst = np.concatenate([
        rng.choice(hubs, e_hub),
        rng.integers(0, n, e - e_hub),
    ])
    src = rng.integers(0, n, e)
    w = (np.ones(e) if unit_w else rng.random(e)).astype(np.float32)
    indptr, csc_src, perm = _build_csc(src, dst, n)
    return indptr, csc_src, w[perm]


@pytest.mark.parametrize("dense_t", [4, 10**9])
@pytest.mark.parametrize("packed", [False, True])
def test_hybrid_exact_integer(dense_t, packed):
    """Integer features + unit weights: exact through bf16 — verifies the
    permutation, block split, tiling, W accumulation, and fold logic."""
    n, e = 700, 6000
    indptr, csc_src, w = _mk_graph(n, e, unit_w=True)
    layout = build_hybrid_layout(
        indptr, csc_src, w, band=256, wr=64, sub=64, et_d=128, et=256,
        dense_t=dense_t,
    )
    if dense_t == 4:
        assert layout.meta.dense_edges > e // 3
    else:
        assert layout.meta.dense_edges == 0
    dl = DeviceHybridLayout.from_host(layout)
    rng = np.random.default_rng(1)
    x = rng.integers(-4, 5, size=(n, 128)).astype(np.float32)
    out = spmm_via_pallas_hybrid(jnp.asarray(x), dl, n, interpret=True,
                                 packed=packed)
    ref = _ref(indptr, csc_src, w, x, n)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_hybrid_random_tolerance():
    n, e = 700, 6000
    indptr, csc_src, w = _mk_graph(n, e, seed=2)
    layout = build_hybrid_layout(
        indptr, csc_src, w, band=256, wr=64, sub=64, et_d=128, et=256,
        dense_t=4,
    )
    dl = DeviceHybridLayout.from_host(layout)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, 128)).astype(np.float32)
    out = np.asarray(spmm_via_pallas_hybrid(jnp.asarray(x), dl, n,
                                            interpret=True))
    ref = _ref(indptr, csc_src, w, x, n)
    # bf16 contraction on ~300-edge hub rows: |err| grows with degree
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.3)


@pytest.mark.parametrize("packed", [False, True])
def test_hybrid_multitile_blocks_exact(packed):
    """Blocks wider than one dense tile (W accumulated across tiles)."""
    n, e = 300, 9000
    rng = np.random.default_rng(3)
    dst = np.concatenate([np.zeros(e // 3, np.int64),
                          rng.integers(0, n, e - e // 3)])
    src = rng.integers(0, n, e)
    w = np.ones(e, np.float32)
    indptr, csc_src, perm = _build_csc(src, dst, n)
    layout = build_hybrid_layout(
        indptr, csc_src, w[perm], band=128, wr=32, sub=32, et_d=64, et=128,
        dense_t=40,
    )
    assert layout.meta.dense_edges > 0
    # only count REAL tiles: group padding carries first_blk=1 by
    # convention (resets a scratch nobody applies)
    real = layout.d_w.any(axis=(1, 2))
    assert int(layout.d_first_blk.reshape(-1)[real].sum()) < int(
        real.sum()
    ), "expected at least one multi-tile block"
    dl = DeviceHybridLayout.from_host(layout)
    x = rng.integers(-3, 4, size=(n, 128)).astype(np.float32)
    out = spmm_via_pallas_hybrid(jnp.asarray(x), dl, n, interpret=True,
                                 packed=packed)
    ref = _ref(indptr, csc_src, w[perm], x, n)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_hybrid_with_cluster_node_perm_exact():
    """build_hybrid_layout(node_perm=...) — a community order from
    graph/reorder.py — must be output-identical to the degree-sorted
    layout (the perm only redistributes edges between the dense and
    gather tiers; the unpermute restores canonical order)."""
    import jax.numpy as jnp

    from bliss_gnn_tpu.graph.reorder import locality_perm, propagate_labels

    n, e = 700, 6000
    indptr, csc_src, w = _mk_graph(n, e, unit_w=True)
    labels = propagate_labels(indptr, csc_src, n_iters=3)
    perm = locality_perm(indptr, csc_src, order="hub-cluster",
                         labels=labels, hub_count=32)
    layout = build_hybrid_layout(
        indptr, csc_src, w, band=256, wr=64, sub=64, et_d=128, et=256,
        dense_t=4, node_perm=perm,
    )
    np.testing.assert_array_equal(np.sort(np.asarray(layout.perm)),
                                  np.arange(n))
    dl = DeviceHybridLayout.from_host(layout)
    rng = np.random.default_rng(1)
    x = rng.integers(-3, 4, (n, 128)).astype(np.float32)
    out = spmm_via_pallas_hybrid(jnp.asarray(x), dl, n, interpret=True)
    ref = _ref(indptr, csc_src, w, x, n)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_hybrid_node_perm_auto_smoke():
    """node_perm='auto' coverage-selects an order host-side and still
    produces the exact aggregation."""
    import jax.numpy as jnp

    n, e = 700, 6000
    indptr, csc_src, w = _mk_graph(n, e, unit_w=True)
    layout = build_hybrid_layout(
        indptr, csc_src, w, band=256, wr=64, sub=64, et_d=128, et=256,
        dense_t=4, node_perm="auto",
    )
    dl = DeviceHybridLayout.from_host(layout)
    rng = np.random.default_rng(1)
    x = rng.integers(-3, 4, (n, 128)).astype(np.float32)
    out = spmm_via_pallas_hybrid(jnp.asarray(x), dl, n, interpret=True)
    ref = _ref(indptr, csc_src, w, x, n)
    np.testing.assert_array_equal(np.asarray(out), ref)
