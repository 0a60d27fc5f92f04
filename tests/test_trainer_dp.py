"""Trainer-level data parallelism: the product path (--dp N) on the
virtual 8-device CPU mesh — mesh build, DP fused step, sharded validation,
capacity refit from psum'd stats, checkpoint/restore of replicated state.

No reference counterpart (train_lightning.py:648-650 pins one device);
semantics contract: identical metric names, global batch --batch-size.
"""
import numpy as np
import jax
import pytest

from bliss_gnn_tpu.train.trainer import TrainConfig, Trainer


def _cfg(tmp_path, **kw):
    base = dict(
        dataset="synth-small", model="sage", sampler="poisson-bandit",
        fan_out=(16, 8), num_layers=2, num_hidden=16, batch_size=32,
        num_steps=4, num_epochs=1, disable_checkpoint=True,
        logdir=str(tmp_path), inference_backend="xla", refit_after=2,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_trainer_dp_end_to_end(tmp_path):
    assert jax.device_count() >= 8
    t = Trainer(_cfg(tmp_path, dp=8))
    assert t.dp == 8 and t.batch_size == 32
    assert t.plan.batch_size == 4  # local batch = global / dp
    t.fit()
    assert t.global_step == 4
    # capacity refit consumed the pmax'd stats (plan tightened or kept)
    assert t._refit_done
    final = t.final_eval()
    assert np.isfinite(final["Test"])


def test_trainer_dp_auto_and_batch_rounding(tmp_path):
    t = Trainer(_cfg(tmp_path, dp=0, batch_size=34, num_steps=1))
    assert t.dp == jax.device_count()
    assert t.batch_size % t.dp == 0


def test_trainer_dp_metrics_match_global_batch(tmp_path):
    """The psum'd dst count of the top layer == the global batch."""
    t = Trainer(_cfg(tmp_path, dp=8, num_steps=2, refit_after=0))
    t.fit()
    # EMA of num_nodes/<L> starts at the exact first-step count
    assert t.ema_nodes[2].value == pytest.approx(32, rel=0.01)


def test_trainer_dp_rejects_oversubscription(tmp_path):
    with pytest.raises(ValueError):
        Trainer(_cfg(tmp_path, dp=1024))
