"""Banked Pallas scatter-add: correctness vs numpy (interpret mode on CPU)
and the custom-VJP math."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bliss_gnn_tpu.ops.scatter_pallas import (
    _scatter_add_bwd,
    banked_scatter_add,
    maybe_banked_scatter_add,
)


@pytest.mark.parametrize("n_out", [100, 233_088])
@pytest.mark.parametrize("banks", [1, 8, 16])
def test_banked_scatter_add_matches_numpy(n_out, banks):
    rng = np.random.default_rng(0)
    e = 20_000
    keys = rng.integers(0, n_out, size=e).astype(np.int32)
    vals = rng.normal(size=e).astype(np.float32)
    expect = np.zeros(n_out, np.float32)
    np.add.at(expect, keys, vals)
    got = np.asarray(banked_scatter_add(
        jnp.asarray(keys), jnp.asarray(vals), n_out, banks=banks,
        tile=4096, interpret=True,
    ))
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=1e-5)


def test_banked_scatter_add_masked_convention(toy):
    """Masked slots carry (key 0, val 0) — they must contribute nothing."""
    keys = jnp.asarray([0, 0, 0, 5, 5], jnp.int32)
    vals = jnp.asarray([0.0, 0.0, 0.0, 2.0, 3.0], jnp.float32)
    got = np.asarray(banked_scatter_add(keys, vals, 8, banks=2, tile=1024,
                                        interpret=True))
    expect = np.zeros(8, np.float32)
    expect[5] = 5.0
    np.testing.assert_allclose(got, expect)


def test_scatter_add_vjp_is_gather():
    keys = jnp.asarray(np.random.default_rng(1).integers(0, 50, 1000),
                       jnp.int32)
    g = jnp.asarray(np.random.default_rng(2).normal(size=50), jnp.float32)
    key_ct, val_ct, nv_ct = _scatter_add_bwd(50, 8, keys, g)
    np.testing.assert_allclose(np.asarray(val_ct), np.asarray(g)[keys])
    assert key_ct.dtype == jax.dtypes.float0
    assert nv_ct.dtype == jax.dtypes.float0


def test_maybe_routing_falls_back_on_cpu():
    keys = jnp.zeros(1 << 20, jnp.int32)
    vals = jnp.zeros(1 << 20, jnp.float32)
    assert maybe_banked_scatter_add(keys, vals, 1000) is None  # cpu backend


def test_banked_path_inside_sampler_matches_xla(small_synth, monkeypatch):
    """Force the banked kernel (interpret mode) through the REAL call sites
    — masked_segment_sum and compact_by_mask — and compare whole sampled
    blocks against the XLA scatter path."""
    from bliss_gnn_tpu.ops import scatter_pallas as sp
    from bliss_gnn_tpu.sampling.block import CapacityPlan
    from bliss_gnn_tpu.sampling.samplers import (
        SamplerConfig,
        init_exp3_weights,
        sample_blocks,
    )

    g, _, _ = small_synth
    dg = g.to_device()
    cfg = SamplerConfig(kind="poisson-bandit", fanouts=(16, 8))
    plan = CapacityPlan.build(4, (16, 8), g.n_nodes, g.n_edges,
                              kind=cfg.kind, frontier_slack=16.0)
    exp3 = init_exp3_weights(2, g.n_edges)
    seeds = jnp.arange(4, dtype=jnp.int32)
    smask = jnp.ones(4, bool)
    ref_blocks, ref_stats = sample_blocks(
        dg, cfg, plan, jax.random.PRNGKey(3), seeds, smask, exp3)

    monkeypatch.setattr(sp, "INTERPRET", True)
    monkeypatch.setattr(sp, "MIN_ELEMS", 1)
    got_blocks, got_stats = sample_blocks(
        dg, cfg, plan, jax.random.PRNGKey(3), seeds, smask, exp3)
    for rb, gb in zip(ref_blocks, got_blocks):
        np.testing.assert_array_equal(np.asarray(rb.e_src),
                                      np.asarray(gb.e_src))
        np.testing.assert_array_equal(np.asarray(rb.e_dst),
                                      np.asarray(gb.e_dst))
        np.testing.assert_array_equal(np.asarray(rb.eid), np.asarray(gb.eid))
        np.testing.assert_allclose(np.asarray(rb.e_weight),
                                   np.asarray(gb.e_weight), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rb.src_node_prob),
                                   np.asarray(gb.src_node_prob), rtol=1e-4)


def test_banked_scatter_tail_skip_exact():
    """n_valid tiles-skip: values past the contiguous valid prefix are
    zero by the masking convention, so skipping their RMW chain must be
    exact — including when n_valid is mid-tile (partial tiles still
    run whole)."""
    rng = np.random.default_rng(7)
    e = 4096
    keys = jnp.asarray(rng.integers(0, 200, e), jnp.int32)
    vals_np = rng.normal(size=e).astype(np.float32)
    for nv in (0, 1, 1000, 1024, 1025, 2048, 4096):
        vals = vals_np.copy()
        vals[nv:] = 0.0  # the caller's masking convention
        full = np.zeros(200, np.float32)
        np.add.at(full, np.asarray(keys), vals)
        got = banked_scatter_add(
            jnp.asarray(keys), jnp.asarray(vals), 200, banks=4, tile=1024,
            interpret=True, n_valid=jnp.int32(nv),
        )
        np.testing.assert_allclose(np.asarray(got), full, rtol=1e-5,
                                   atol=1e-5, err_msg=f"nv={nv}")


def test_lut_gather_tail_skip_zero_fills():
    """Tiles wholly past n_valid zero-fill; the valid prefix is exact."""
    from bliss_gnn_tpu.ops.gather_pallas import lut_gather

    rng = np.random.default_rng(8)
    lut = jnp.asarray(rng.normal(size=500).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 500, 6144), jnp.int32)
    for nv in (0, 100, 2048, 2049, 4096, 6144):
        got = np.asarray(
            lut_gather(lut, idx, interpret=True, n_valid=jnp.int32(nv),
                       flat2d=True)
        )
        expect = np.asarray(lut)[np.asarray(idx)]
        # exact within the valid prefix
        np.testing.assert_allclose(got[:nv], expect[:nv], err_msg=f"nv={nv}")
        # fully-skipped tiles (et=2048) are zero
        first_skipped_tile = -(-max(nv, 1) // 2048) * 2048 if nv > 0 else 0
        np.testing.assert_array_equal(got[first_skipped_tile:], 0.0)


def test_banked_row_scatter_add_exact():
    """2-D banked row scatter (ops/rowscatter_pallas.py): exact segment
    sums of feature rows with banking, tail skip, and dst-sorted keys
    (the GAT aggregation profile, interpret mode)."""
    from bliss_gnn_tpu.ops.rowscatter_pallas import banked_row_scatter_add

    rng = np.random.default_rng(9)
    e, f, s = 2048, 256, 24
    ids = np.sort(rng.integers(0, s, e)).astype(np.int32)
    data = rng.normal(size=(e, f)).astype(np.float32)
    for nv in (0, 1200, 2048):
        d = data.copy()
        d[nv:] = 0.0
        i = ids.copy()
        i[nv:] = 0
        ref = np.zeros((s, f), np.float32)
        np.add.at(ref, i, d)
        got = np.asarray(banked_row_scatter_add(
            jnp.asarray(i), jnp.asarray(d), s, banks=2, et=1024,
            n_valid=jnp.int32(nv), interpret=True,
        ))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4,
                                   err_msg=f"nv={nv}")


def test_row_scatter_vjp_is_row_gather():
    from bliss_gnn_tpu.ops import rowscatter_pallas as RS

    rng = np.random.default_rng(10)
    e, f, s = 2048, 256, 24
    ids = jnp.asarray(rng.integers(0, s, e), jnp.int32)
    data = jnp.asarray(rng.normal(size=(e, f)).astype(np.float32))
    old = RS.INTERPRET
    RS.INTERPRET = True
    try:
        g = jax.grad(lambda d: RS._row_scatter_diff(
            ids, d, jnp.full((1,), e, jnp.int32), s).sum())(data)
    finally:
        RS.INTERPRET = old
    np.testing.assert_allclose(np.asarray(g), 1.0)
