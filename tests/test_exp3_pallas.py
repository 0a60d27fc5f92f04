"""Streaming EXP3 scatter-multiply kernel (ops/exp3_pallas.py) under the
Pallas interpreter, against a plain flat scatter reference — including
duplicate-index composition and the overflow fallback (a tile run longer
than the 2-block SMEM window)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.ops.exp3_pallas import TILE_ROWS, exp3_apply_streaming


def _ref_apply(state, idx, mult, limit):
    flat = np.asarray(state, np.float64).reshape(-1)
    for i, m in zip(np.asarray(idx), np.asarray(mult)):
        if i < limit:
            flat[i] *= m
    return flat.reshape(state.shape)


@pytest.mark.parametrize("dup", [False, True])
def test_streaming_apply_matches_flat_scatter(rng, dup):
    L, R = 2, TILE_ROWS  # 2 tiles
    limit = L * R * 128
    state = jnp.asarray(
        rng.random((L, R, 128)).astype(np.float32) + 0.5)
    U = 300
    idx = rng.integers(0, limit, U).astype(np.int32)
    if dup:
        idx[: U // 2] = idx[U // 2 : U // 2 * 2]  # duplicates compose
    idx[-40:] = limit  # no-op tail slots
    mult = (rng.random(U).astype(np.float32) * 0.5 + 0.75)
    out, n_over = exp3_apply_streaming(
        state, jnp.asarray(idx), jnp.asarray(mult), interpret=True)
    assert int(n_over) == 0
    ref = _ref_apply(state, idx, mult, limit)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, rtol=2e-6)


def test_streaming_apply_overflow_skips_and_counts(rng):
    """A run longer than the N_UBLKS-block window: the visible prefix is
    applied exactly, the tail is skipped and counted in n_overflow."""
    from bliss_gnn_tpu.ops.exp3_pallas import N_UBLKS

    L, R = 1, TILE_ROWS
    limit = L * R * 128
    C = 128
    state = jnp.asarray(rng.random((L, R, 128)).astype(np.float32) + 0.5)
    U = 600
    idx = rng.integers(0, 2000, U).astype(np.int32)  # all in tile 0
    mult = (rng.random(U).astype(np.float32) * 0.5 + 0.75)
    out, n_over = exp3_apply_streaming(
        state, jnp.asarray(idx), jnp.asarray(mult), interpret=True,
        ublk=C)  # tiny blocks force the overflow
    order = np.argsort(idx, kind="stable")
    s_idx, s_mult = idx[order], mult[order]
    visible = N_UBLKS * C  # run starts at position 0 -> aligned window
    assert int(n_over) == U - visible > 0
    ref = _ref_apply(state, s_idx[:visible], s_mult[:visible], limit)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, rtol=2e-5)
