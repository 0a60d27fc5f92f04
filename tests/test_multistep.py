"""Chained multi-step training (lax.scan over fused steps).

The chained path must be step-for-step equivalent to the single-step path:
same PRNG stream (state.key threads through), same optimizer updates, same
EXP3 evolution.
"""
import numpy as np
import jax
import jax.numpy as jnp

from bliss_gnn_tpu.train.trainer import TrainConfig, Trainer


def _run(steps_per_call):
    cfg = TrainConfig(
        dataset="toy", model="sage", sampler="poisson-bandit",
        fan_out=(4, 4), num_layers=2, batch_size=4, num_steps=6,
        num_hidden=8, disable_checkpoint=True, seed=7,
        logdir=f"/tmp/bliss_multistep_{steps_per_call}",
        steps_per_call=steps_per_call,
    )
    t = Trainer(cfg)
    t.fit()
    return t


def test_chained_steps_match_single_steps():
    t1 = _run(1)
    t3 = _run(3)
    assert int(t1.state.step) == int(t3.state.step) == 6
    p1 = jax.device_get(t1.state.params)
    p3 = jax.device_get(t3.state.params)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(t1.state.exp3_weights, np.float32),
        np.asarray(t3.state.exp3_weights, np.float32),
    )


def test_chain_remainder_falls_back_to_single():
    # 6 steps with K=4: one chained call (4) + 2 single steps
    t = _run(4)
    assert int(t.state.step) == 6
