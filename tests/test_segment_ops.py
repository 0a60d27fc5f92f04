"""Segment-op layer vs dense numpy references (SURVEY.md §4: kernel unit
tests against dense jnp references)."""
import numpy as np
import jax.numpy as jnp

from bliss_gnn_tpu.ops import segment as S


def _setup(rng, e=64, n_src=10, n_dst=6, f=5):
    e_src = rng.integers(0, n_src, e)
    e_dst = rng.integers(0, n_dst, e)
    mask = rng.random(e) < 0.8
    vals = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n_src, f)).astype(np.float32)
    return e_src, e_dst, mask, vals, x


def test_masked_segment_sum(rng):
    e_src, e_dst, mask, vals, _ = _setup(rng)
    out = S.masked_segment_sum(jnp.array(vals), jnp.array(e_dst), 6, jnp.array(mask))
    ref = np.zeros(6, np.float32)
    np.add.at(ref, e_dst[mask], vals[mask])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


def test_masked_segment_max(rng):
    e_src, e_dst, mask, vals, _ = _setup(rng)
    out = S.masked_segment_max(jnp.array(vals), jnp.array(e_dst), 6, jnp.array(mask))
    for i in range(6):
        sel = vals[(e_dst == i) & mask]
        if len(sel):
            assert np.isclose(float(out[i]), sel.max(), rtol=1e-6)
        else:
            assert np.isneginf(float(out[i]))


def test_u_mul_e_sum_spmm(rng):
    e_src, e_dst, mask, vals, x = _setup(rng)
    out = S.u_mul_e_sum(
        jnp.array(x), jnp.array(e_src), jnp.array(vals), jnp.array(e_dst), 6,
        jnp.array(mask),
    )
    ref = np.zeros((6, x.shape[1]), np.float32)
    for e in range(len(e_src)):
        if mask[e]:
            ref[e_dst[e]] += vals[e] * x[e_src[e]]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_segment_mean_empty_segments_zero(rng):
    e_src, e_dst, mask, vals, x = _setup(rng)
    # force segment 5 empty
    mask = mask & (e_dst != 5)
    out = S.segment_mean(jnp.array(vals), jnp.array(e_dst), 6, jnp.array(mask))
    assert float(out[5]) == 0.0
    cnt = np.bincount(e_dst[mask], minlength=6)
    ref = np.zeros(6, np.float32)
    np.add.at(ref, e_dst[mask], vals[mask])
    ref = ref / np.maximum(cnt, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


def test_edge_softmax_sums_to_one(rng):
    e_src, e_dst, mask, vals, _ = _setup(rng)
    logits = rng.normal(size=(len(e_src), 3)).astype(np.float32) * 5
    a = S.edge_softmax(jnp.array(logits), jnp.array(e_dst), 6, jnp.array(mask))
    a = np.asarray(a)
    assert np.all(a[~mask] == 0)
    for i in range(6):
        sel = a[(e_dst == i) & mask]
        if len(sel):
            np.testing.assert_allclose(sel.sum(axis=0), np.ones(3), rtol=1e-5)
    # parity with dense softmax per segment
    for i in range(6):
        idx = np.where((e_dst == i) & mask)[0]
        if len(idx):
            ref = np.exp(logits[idx] - logits[idx].max(0))
            ref = ref / ref.sum(0)
            np.testing.assert_allclose(a[idx], ref, rtol=1e-4)


def test_edge_softmax_extreme_logits_stable(rng):
    e_dst = np.zeros(4, np.int64)
    logits = np.array([1e4, 1e4 - 1, -1e4, 0.0], np.float32)
    a = np.asarray(S.edge_softmax(jnp.array(logits), jnp.array(e_dst), 1))
    assert np.all(np.isfinite(a))
    np.testing.assert_allclose(a.sum(), 1.0, rtol=1e-5)


def test_segment_count(rng):
    e_src, e_dst, mask, _, _ = _setup(rng)
    out = S.segment_count(jnp.array(e_dst), 6, jnp.array(mask))
    np.testing.assert_array_equal(
        np.asarray(out), np.bincount(e_dst[mask], minlength=6)
    )


def test_onehot_segment_sum_matches_scatter(rng):
    import jax
    """The MXU one-hot route (bf16 payload, f32 accumulation) equals the
    XLA scatter within bf16 tolerance on a block-aggregation shape."""
    from bliss_gnn_tpu.ops import segment as S

    e, f, n = 1 << 15, 128, 96
    data = jnp.asarray(rng.normal(size=(e, f)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    mask = jnp.asarray(rng.random(e) < 0.9)
    want = np.asarray(jax.ops.segment_sum(
        jnp.where(mask[:, None], data, 0).astype(np.float32),
        jnp.where(mask, ids, 0), num_segments=n))
    old = S.ONEHOT_SEGMENT_INTERPRET
    S.ONEHOT_SEGMENT_INTERPRET = True
    try:
        got = np.asarray(
            S.masked_segment_sum(data, ids, n, mask).astype(np.float32))
    finally:
        S.ONEHOT_SEGMENT_INTERPRET = old
    # bf16 message rounding only (accumulation is f32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-1)


def test_onehot_segment_sum_grad(rng):
    """The Pallas kernel's custom VJP (dmsg = g[ids] — the segment-sum's
    gradient IS a row gather; zero-filled for out-of-range ids) matches
    the XLA scatter's gradient — the kernel sits inside the model's
    backward."""
    import jax

    from bliss_gnn_tpu.ops import segment as S

    e, f, n = 1 << 15, 128, 96
    data = jnp.asarray(rng.normal(size=(e, f)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    w = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)

    def loss_ref(d):
        s = jax.ops.segment_sum(d.astype(jnp.float32), ids, num_segments=n)
        return jnp.sum(s * w)

    g_ref = np.asarray(jax.grad(loss_ref)(data).astype(np.float32))

    old = S.ONEHOT_SEGMENT_INTERPRET
    S.ONEHOT_SEGMENT_INTERPRET = True
    try:
        def loss_k(d):
            s = S.masked_segment_sum(d, ids, n).astype(jnp.float32)
            return jnp.sum(s * w)

        g_k = np.asarray(jax.grad(loss_k)(data).astype(np.float32))
    finally:
        S.ONEHOT_SEGMENT_INTERPRET = old
    np.testing.assert_allclose(g_k, g_ref, rtol=2e-2, atol=2e-1)


def test_onehot_segment_sum_grad_out_of_range_ids_zero(rng):
    """Out-of-range segment ids contribute zero FORWARD (one-hot matches
    no segment — XLA segment_sum drop semantics) and must get zero
    GRADIENT: jnp.take's default clamp would silently attribute g[n-1]
    to them (the bug the zero-fill backward fixes)."""
    import jax

    from bliss_gnn_tpu.ops import segment as S

    e, f, n = 1 << 15, 128, 96
    data = jnp.asarray(rng.normal(size=(e, f)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    ids = ids.at[::7].set(n + 3)  # sentinel out-of-range slots
    w = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)

    old = S.ONEHOT_SEGMENT_INTERPRET
    S.ONEHOT_SEGMENT_INTERPRET = True
    try:
        out = S.masked_segment_sum(data, ids, n)
        want = jax.ops.segment_sum(
            data.astype(jnp.float32), ids, num_segments=n)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(want),
            rtol=2e-2, atol=2e-1)

        def loss(d):
            return jnp.sum(
                S.masked_segment_sum(d, ids, n).astype(jnp.float32) * w)

        g = np.asarray(jax.grad(loss)(data).astype(np.float32))
    finally:
        S.ONEHOT_SEGMENT_INTERPRET = old
    assert np.all(g[::7] == 0), "out-of-range slots must get zero grad"
    assert np.any(g[1::7] != 0)
