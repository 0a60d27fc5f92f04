"""Streaming micro-F1 and EMA counters.

Replaces torchmetrics Multiclass/MultilabelF1Score(average='micro')
(train_lightning.py:68-71) with a psum-able confusion-count pytree:

- multiclass micro-F1 over all classes == accuracy (every sample carries
  exactly one true label): track (correct, total);
- multilabel micro-F1 = 2TP / (2TP + FP + FN) with the torchmetrics logit
  convention (inputs outside [0,1] are logits -> sigmoid -> threshold 0.5,
  i.e. logit > 0).

The EMA node/edge counters mirror ModelLightning.num_sampled_nodes/edges
(train_lightning.py:74-98): cum = cum * w + x, displayed as
cum * (1-w) / (1-w^steps), w = 0.99.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class F1State:
    tp: jax.Array  # multiclass: #correct; multilabel: true positives
    fp: jax.Array
    fn: jax.Array
    total: jax.Array  # multiclass: #samples

    @staticmethod
    def zero() -> "F1State":
        z = jnp.zeros((), jnp.float32)
        return F1State(tp=z, fp=z, fn=z, total=z)


def f1_update(
    state: F1State,
    logits: jax.Array,
    labels: jax.Array,
    mask: jax.Array,
    multilabel: bool,
) -> F1State:
    if multilabel:
        pred = logits > 0  # sigmoid(logit) > 0.5
        lab = labels > 0.5
        m = mask[:, None]
        tp = jnp.sum((pred & lab) & m).astype(jnp.float32)
        fp = jnp.sum((pred & ~lab) & m).astype(jnp.float32)
        fn = jnp.sum((~pred & lab) & m).astype(jnp.float32)
        return F1State(state.tp + tp, state.fp + fp, state.fn + fn, state.total)
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum((pred == labels) & mask).astype(jnp.float32)
    total = jnp.sum(mask).astype(jnp.float32)
    return F1State(state.tp + correct, state.fp, state.fn, state.total + total)


def f1_compute(state: F1State, multilabel: bool) -> jax.Array:
    if multilabel:
        denom = 2 * state.tp + state.fp + state.fn
        return jnp.where(denom > 0, 2 * state.tp / jnp.maximum(denom, 1), 0.0)
    return jnp.where(state.total > 0, state.tp / jnp.maximum(state.total, 1), 0.0)


class EmaCounter:
    """Bias-corrected EMA, parity with train_lightning.py:74-98."""

    def __init__(self, w: float = 0.99):
        self.w = w
        self.cum = 0.0
        self.steps = 0

    def push(self, x: float) -> float:
        self.cum = self.cum * self.w + x
        self.steps += 1
        return self.value

    @property
    def value(self) -> float:
        if self.steps == 0:
            return 0.0
        if self.w >= 1:
            return self.cum / self.steps
        return self.cum * (1 - self.w) / (1 - self.w ** self.steps)


class Welford:
    """Running mean/std — the BatchSizeCallback statistics
    (train_lightning.py:432-449)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.n = 0
        self.m = 0.0
        self.s = 0.0

    def push(self, x: float):
        self.n += 1
        m = self.m
        self.m += (x - m) / self.n
        self.s += (x - m) * (x - self.m)

    @property
    def var(self) -> float:
        return self.s / (self.n - 1) if self.n > 1 else 0.0

    @property
    def std(self) -> float:
        return self.var ** 0.5
