"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX recipe for testing multi-chip sharding without
hardware (SURVEY.md §4): force the host platform and split it into 8
virtual devices.  Must run before jax initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the tunneled TPU backend; tests run
# on the virtual CPU mesh regardless (the config update wins post-import).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from bliss_gnn_tpu.graph.datasets import synthetic_graph, toy_graph  # noqa: E402
from bliss_gnn_tpu.graph.structure import Graph, normalized_edata  # noqa: E402


@pytest.fixture(scope="session")
def toy():
    """Canonicalized toy graph (self-loops added), parity with the harness
    prep at train_lightning.py:334-335."""
    g, n_classes, multilabel = toy_graph()
    g = Graph.canonicalize(g)
    g.edata["w"] = normalized_edata(g)
    return g, n_classes, multilabel


@pytest.fixture(scope="session")
def small_synth():
    g, n_classes, multilabel = synthetic_graph(200, 1200, 16, 4, seed=7)
    g = Graph.canonicalize(g)
    g.edata["w"] = normalized_edata(g)
    return g, n_classes, multilabel


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
