"""Metric logging: CSV always, TensorBoard when available.

The metric names replicate the reference's TensorBoard series
(SURVEY.md §5.5) — they are the comparison interface: train_acc, train_loss,
iter_time, forward_backward_time, num_nodes/{i}, num_edges/{i}, val_acc,
val_loss, Final Accuracy/{split}.
"""
from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class MetricLogger:
    """Append-only scalar logger: <run_dir>/metrics.csv (+ TB events if
    torch.utils.tensorboard is importable)."""

    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._csv_path = os.path.join(run_dir, "metrics.csv")
        self._csv_file = open(self._csv_path, "a", newline="")
        self._writer = csv.writer(self._csv_file)
        if os.path.getsize(self._csv_path) == 0:
            self._writer.writerow(["step", "name", "value", "wall_time"])
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=run_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float]):
        t = time.time()
        for name, value in scalars.items():
            self._writer.writerow([step, name, float(value), t])
            if self._tb is not None:
                self._tb.add_scalar(name, float(value), step)

    def flush(self):
        self._csv_file.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._csv_file.close()
        if self._tb is not None:
            self._tb.close()


def next_version_dir(base: str) -> str:
    """Lightning-style version_<k> run dirs (train_lightning.py:663-668
    discovers the newest by the same convention)."""
    os.makedirs(base, exist_ok=True)
    existing = [
        int(d.split("_")[-1])
        for d in os.listdir(base)
        if d.startswith("version_") and d.split("_")[-1].isdigit()
    ]
    v = max(existing) + 1 if existing else 0
    path = os.path.join(base, f"version_{v}")
    os.makedirs(path, exist_ok=True)
    return path


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache — first-compile of the fused sampler
    step costs minutes on TPU (a dozen large sort lowerings); cached runs
    start in seconds."""
    import jax

    path = path or os.environ.get(
        "BLISS_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
