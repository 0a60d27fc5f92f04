"""LUT-gather kernel unit tests (interpret mode on CPU).

The TPU-path numbers live in scripts/probe_gather.py; here we verify the
kernel math — including int32 exactness above 2^24, which the previous
f32-only kernel could not represent (global edge ids at Reddit scale are
~1.15e8 > 2^24).
"""
import numpy as np
import jax
import jax.numpy as jnp

from bliss_gnn_tpu.ops.gather_pallas import lut_gather


def test_lut_gather_f32_interpret():
    rng = np.random.default_rng(0)
    lut = rng.normal(size=5000).astype(np.float32)
    idx = rng.integers(0, 5000, size=3000).astype(np.int32)
    out = lut_gather(jnp.asarray(lut), jnp.asarray(idx), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), lut[idx])


def test_lut_gather_i32_exact_above_2_24():
    rng = np.random.default_rng(1)
    # values far above the f32 integer-exact range
    lut = rng.integers(0, 2**31 - 1, size=4000).astype(np.int32)
    idx = rng.integers(0, 4000, size=2500).astype(np.int32)
    out = lut_gather(
        jnp.asarray(lut), jnp.asarray(idx), interpret=True,
        elem_dtype=jnp.int32,
    )
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), lut[idx])


def test_lut_gather_nonmultiple_tile_sizes():
    rng = np.random.default_rng(2)
    lut = rng.integers(-100, 100, size=130).astype(np.int32)  # 2 rows + tail
    idx = rng.integers(0, 130, size=2049).astype(np.int32)  # 1 tile + 1
    out = lut_gather(
        jnp.asarray(lut), jnp.asarray(idx), interpret=True,
        elem_dtype=jnp.int32,
    )
    np.testing.assert_array_equal(np.asarray(out), lut[idx])


def test_lut_gather_flat2d_matches_column():
    """flat2d tile output (the layout consumers read without an XLA
    relayout) is elementwise identical to the [M,1] column path."""
    rng = np.random.default_rng(3)
    lut = rng.normal(size=3000).astype(np.float32)
    idx = rng.integers(0, 3000, size=4096 + 300).astype(np.int32)
    a = lut_gather(jnp.asarray(lut), jnp.asarray(idx), interpret=True)
    b = lut_gather(jnp.asarray(lut), jnp.asarray(idx), interpret=True,
                   flat2d=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(b), lut[idx])


def test_lut_gather_roll_variant(rng):
    """Roll-based kernel (per-slot lane rotation + diagonal extract) equals
    the one-hot kernel and jnp.take — f32 and exact int32."""
    from bliss_gnn_tpu.ops.gather_pallas import lut_gather

    n, m = 5000, 4096 + 77
    lut_f = rng.normal(size=n).astype(np.float32)
    lut_i = rng.integers(-(2**30), 2**30, n).astype(np.int32)
    idx = rng.integers(0, n, m).astype(np.int32)
    for lut, dt in ((lut_f, jnp.float32), (lut_i, jnp.int32)):
        want = np.asarray(lut)[idx]
        got = np.asarray(lut_gather(
            jnp.asarray(lut), jnp.asarray(idx), interpret=True,
            elem_dtype=dt, roll=True))
        np.testing.assert_array_equal(got, want)


def test_mxusel_bool_route_exact():
    """Boolean LUTs route through the MXU-select kernel (no [M,1]
    operand; bf16-exact for 0/1) — interpret-mode equivalence against
    numpy, with and without a tail bound."""
    from bliss_gnn_tpu.ops.gather_pallas import lut_gather

    rng = np.random.default_rng(11)
    sel = jnp.asarray(rng.integers(0, 2, 700).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 700, 4096), jnp.int32)
    expect = np.asarray(sel)[np.asarray(idx)]
    got = np.asarray(lut_gather(sel, idx, interpret=True, mxusel=True))
    np.testing.assert_array_equal(got, expect)
    got = np.asarray(lut_gather(sel, idx, interpret=True, mxusel=True,
                                n_valid=jnp.int32(2048)))
    np.testing.assert_array_equal(got[:2048], expect[:2048])
    np.testing.assert_array_equal(got[2048:], 0)
