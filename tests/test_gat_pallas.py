"""Banded GAT attention kernel (interpret mode) vs the XLA streaming path.

TPU timing/accuracy is exercised in scripts; here the online-softmax fold
logic runs under the Pallas interpreter against full_gat_attention
(ops/fullgraph.py), which is itself tested against dense math.
"""
import numpy as np
import jax
import jax.numpy as jnp

from bliss_gnn_tpu.graph.structure import Graph
from bliss_gnn_tpu.ops.fullgraph import full_gat_attention
from bliss_gnn_tpu.ops.gat_pallas import banded_gat_attention
from bliss_gnn_tpu.ops.spmm_pallas import (
    DeviceBandedLayout,
    build_banded_layout,
)


def test_banded_gat_matches_streaming(rng):
    n, e, H, O = 700, 3000, 4, 8
    g = Graph(rng.integers(0, n, e), rng.integers(0, n, e), n)
    layout = build_banded_layout(g.csc_indptr, g.csc_src, None,
                                 band=256, wr=64, et=2048)
    dl = DeviceBandedLayout.from_host(layout)
    feat = jnp.asarray(rng.normal(size=(n, H, O)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(1, H, O)).astype(np.float32))
    ref = np.asarray(full_gat_attention(
        feat, attn, 0.2, jnp.asarray(g.csc_indptr), jnp.asarray(g.csc_src),
        n, g.n_edges,
    ))
    got = np.asarray(banded_gat_attention(
        feat, attn, 0.2, dl, n, interpret=True,
    ))
    deg = np.diff(g.csc_indptr)
    has = deg > 0
    np.testing.assert_allclose(got[has], ref[has], rtol=2e-4, atol=2e-4)
    if (~has).any():
        # zero-in-degree rows: defined as zeros (denominator clamp)
        assert np.abs(got[~has]).max() == 0.0


def test_banded_gat_single_head_odd_dims(rng):
    """H=1 with a non-lane-aligned O (the output-layer case, O=n_classes)."""
    n, e, H, O = 300, 1500, 1, 41
    g = Graph(rng.integers(0, n, e), rng.integers(0, n, e), n)
    layout = build_banded_layout(g.csc_indptr, g.csc_src, None,
                                 band=256, wr=64, et=2048)
    dl = DeviceBandedLayout.from_host(layout)
    feat = jnp.asarray(rng.normal(size=(n, H, O)).astype(np.float32))
    attn = jnp.asarray(rng.normal(size=(1, H, O)).astype(np.float32))
    ref = np.asarray(full_gat_attention(
        feat, attn, 0.2, jnp.asarray(g.csc_indptr), jnp.asarray(g.csc_src),
        n, g.n_edges,
    ))
    got = np.asarray(banded_gat_attention(
        feat, attn, 0.2, dl, n, interpret=True,
    ))
    deg = np.diff(g.csc_indptr)
    has = deg > 0
    np.testing.assert_allclose(got[has], ref[has], rtol=2e-4, atol=2e-4)


def test_packed_gat_matches_streaming(rng):
    """Pair-packed gather variant: same online-softmax result up to the
    bf16 rounding of the unpacked messages (the only numeric difference on
    the interpreter, where both kernels' MXU contractions run in f32)."""
    from bliss_gnn_tpu.ops.gat_pallas import banded_gat_attention_packed

    n, e, H, O = 700, 3000, 2, 128  # f = 256: no padding tail
    g = Graph(rng.integers(0, n, e), rng.integers(0, n, e), n)
    layout = build_banded_layout(g.csc_indptr, g.csc_src, None,
                                 band=256, wr=64, et=2048)
    dl = DeviceBandedLayout.from_host(layout)
    # bf16-representable features make the pack lossless, so this checks
    # the permutation/fold LOGIC exactly (on TPU both kernels feed the MXU
    # in bf16; the pack adds one message rounding, not tested here)
    feat = jnp.asarray(rng.normal(size=(n, H, O)).astype(np.float32)
                       ).astype(jnp.bfloat16).astype(jnp.float32)
    attn = jnp.asarray(rng.normal(size=(1, H, O)).astype(np.float32))
    ref = np.asarray(full_gat_attention(
        feat, attn, 0.2, jnp.asarray(g.csc_indptr), jnp.asarray(g.csc_src),
        n, g.n_edges,
    ))
    got = np.asarray(banded_gat_attention_packed(
        feat, attn, 0.2, dl, n, interpret=True,
    ))
    deg = np.diff(g.csc_indptr)
    has = deg > 0
    np.testing.assert_allclose(got[has], ref[has], rtol=2e-4, atol=2e-4)
    if (~has).any():
        assert np.abs(got[~has]).max() == 0.0


def test_packed_gat_padding_tail(rng):
    """H=3, O=41 -> o_pad=128, f=384: exercises the f_total=512 padding
    tail (permuted pad columns must stay inert in every contraction)."""
    from bliss_gnn_tpu.ops.gat_pallas import banded_gat_attention_packed

    n, e, H, O = 300, 1500, 3, 41
    g = Graph(rng.integers(0, n, e), rng.integers(0, n, e), n)
    layout = build_banded_layout(g.csc_indptr, g.csc_src, None,
                                 band=256, wr=64, et=2048)
    dl = DeviceBandedLayout.from_host(layout)
    feat = jnp.asarray(rng.normal(size=(n, H, O)).astype(np.float32)
                       ).astype(jnp.bfloat16).astype(jnp.float32)
    attn = jnp.asarray(rng.normal(size=(1, H, O)).astype(np.float32))
    ref = np.asarray(full_gat_attention(
        feat, attn, 0.2, jnp.asarray(g.csc_indptr), jnp.asarray(g.csc_src),
        n, g.n_edges,
    ))
    got = np.asarray(banded_gat_attention_packed(
        feat, attn, 0.2, dl, n, interpret=True,
    ))
    deg = np.diff(g.csc_indptr)
    has = deg > 0
    np.testing.assert_allclose(got[has], ref[has], rtol=2e-4, atol=2e-4)
