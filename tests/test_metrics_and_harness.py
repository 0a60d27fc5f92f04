"""Metrics parity, checkpoint round-trip, CLI smoke, evaluation helpers."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bliss_gnn_tpu.train.metrics import (
    EmaCounter,
    F1State,
    Welford,
    f1_compute,
    f1_update,
)


def test_multiclass_micro_f1_is_accuracy(rng):
    logits = rng.normal(size=(200, 7)).astype(np.float32)
    labels = rng.integers(0, 7, 200)
    mask = rng.random(200) < 0.9
    st = f1_update(F1State.zero(), jnp.asarray(logits), jnp.asarray(labels),
                   jnp.asarray(mask), multilabel=False)
    acc = float(f1_compute(st, False))
    ref = (logits.argmax(1) == labels)[mask].mean()
    assert np.isclose(acc, ref)


def test_multilabel_micro_f1_matches_sklearn(rng):
    import sklearn.metrics as skm

    logits = rng.normal(size=(150, 5)).astype(np.float32)
    labels = (rng.random((150, 5)) < 0.3).astype(np.float32)
    mask = np.ones(150, bool)
    st = f1_update(F1State.zero(), jnp.asarray(logits), jnp.asarray(labels),
                   jnp.asarray(mask), multilabel=True)
    got = float(f1_compute(st, True))
    pred = (logits > 0).astype(int)
    ref = skm.f1_score(labels, pred, average="micro")
    assert np.isclose(got, ref, atol=1e-6)


def test_f1_accumulates_across_batches(rng):
    logits = rng.normal(size=(100, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 100)
    st = F1State.zero()
    for i in range(0, 100, 25):
        st = f1_update(st, jnp.asarray(logits[i:i+25]),
                       jnp.asarray(labels[i:i+25]), jnp.ones(25, bool), False)
    assert np.isclose(float(f1_compute(st, False)),
                      (logits.argmax(1) == labels).mean())


def test_ema_counter_matches_reference_formula():
    """train_lightning.py:74-98: cum = cum*w + x, value = cum*(1-w)/(1-w^n)."""
    c = EmaCounter(0.99)
    xs = [10, 20, 30, 40]
    cum = 0.0
    for i, x in enumerate(xs, 1):
        got = c.push(x)
        cum = cum * 0.99 + x
        ref = cum * (1 - 0.99) / (1 - 0.99 ** i)
        assert np.isclose(got, ref)


def test_welford():
    w = Welford()
    xs = [3.0, 7.0, 11.0, 5.0]
    for x in xs:
        w.push(x)
    assert np.isclose(w.m, np.mean(xs))
    assert np.isclose(w.std, np.std(xs, ddof=1))


def test_checkpoint_roundtrip(tmp_path):
    from bliss_gnn_tpu.graph.datasets import synthetic_graph
    from bliss_gnn_tpu.graph.structure import Graph, normalized_edata
    from bliss_gnn_tpu.train.trainer import TrainConfig, Trainer

    g, nc, ml = synthetic_graph(200, 1500, 8, 3, seed=11)
    g = Graph.canonicalize(g)
    g.edata["w"] = normalized_edata(g)
    cfg = TrainConfig(
        dataset="synth", model="sage", sampler="poisson-bandit",
        fan_out=(16, 8), batch_size=16, num_hidden=16, num_layers=2,
        lr=0.01, num_epochs=2, logdir=str(tmp_path), lr_step_size=100,
    )
    tr = Trainer(cfg, graph=g, n_classes=nc, multilabel=ml)
    tr.fit()
    step_before = int(tr.state.step)
    params_before = jax.device_get(tr.best_state.params)
    exp3_before = np.asarray(tr.best_state.exp3_weights)

    tr2 = Trainer(cfg, graph=g, n_classes=nc, multilabel=ml)
    ckpt_path = os.path.join(os.path.abspath(tr.run_dir), "checkpoints", "best")
    tr2.load_checkpoint(ckpt_path)
    leaves1 = jax.tree.leaves(params_before)
    leaves2 = jax.tree.leaves(jax.device_get(tr2.state.params))
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(exp3_before, np.asarray(tr2.state.exp3_weights))
    assert int(tr2.state.step) > 0 and int(tr2.state.step) <= step_before


def test_cli_end_to_end(tmp_path, monkeypatch):
    """CLI smoke: synth-small, 1 run, a few steps; exercises argparse ->
    Trainer -> fit -> final_eval path."""
    from bliss_gnn_tpu.train import cli

    results = cli.main([
        "--dataset", "synth-small", "--model", "sage",
        "--sampler", "poisson-bandit", "--num-layers", "2",
        "--fan-out", "32,16", "--batch-size", "64", "--num-steps", "12",
        "--logdir", str(tmp_path), "--disable-checkpoint",
    ])
    assert len(results) == 1
    assert 0 <= results[0]["Test"] <= 1


def test_kruns_reduction(tmp_path):
    from bliss_gnn_tpu.train import cli

    results = cli.main([
        "--dataset", "synth-small", "--model", "sage",
        "--sampler", "ladies", "--num-layers", "2",
        "--fan-out", "16,8", "--batch-size", "64", "--num-steps", "4",
        "--k-runs", "2", "--logdir", str(tmp_path), "--disable-checkpoint",
    ])
    assert len(results) == 2
    red_dir = f"{tmp_path}_reduced"
    files = os.listdir(red_dir)
    assert any(f.endswith(".csv") for f in files)


def test_evaluation_helpers(small_synth):
    from bliss_gnn_tpu.train.evaluation import (
        compute_acc_unsupervised,
        inductive_split,
    )

    g, nc, _ = small_synth
    emb = np.asarray(g.ndata["features"], np.float32)
    labels = np.asarray(g.ndata["labels"])
    tr = np.where(g.ndata["train_mask"])[0]
    va = np.where(g.ndata["val_mask"])[0]
    te = np.where(g.ndata["test_mask"])[0]
    f1v, f1t = compute_acc_unsupervised(emb, labels, tr, va, te)
    assert 0 <= f1v <= 1 and 0 <= f1t <= 1
    # features are noisy class prototypes -> probe beats chance
    assert f1t > 1.0 / nc

    train_g, val_g, test_g = inductive_split(g)
    assert train_g.n_nodes == g.ndata["train_mask"].sum()
    assert val_g.n_nodes == (g.ndata["train_mask"] | g.ndata["val_mask"]).sum()
    assert test_g.n_nodes == g.n_nodes
    s, d = train_g.edges()
    assert train_g.n_edges <= g.n_edges


def test_synthetic_graph_homophily_knob():
    """The 'hard' stand-in family: homophily rewires that fraction of edges
    to same-label endpoints (sampler-quality sensitivity for the
    time-to-val-F1 bench); feature_noise scales prototype noise."""
    from bliss_gnn_tpu.graph.datasets import load_dataset, synthetic_graph

    g0, _, _ = synthetic_graph(400, 4000, 8, 4, seed=3, homophily=0.0)
    g1, _, _ = synthetic_graph(400, 4000, 8, 4, seed=3, homophily=0.8)
    lab = g1.ndata["labels"]

    def same_frac(g):
        lab = np.asarray(g.ndata["labels"])
        dst = np.repeat(np.arange(g.n_nodes), np.diff(g.csc_indptr))
        return float((lab[np.asarray(g.csc_src)] == lab[dst]).mean())

    assert same_frac(g0) < 0.4  # ~1/n_classes plus chance
    assert same_frac(g1) > 0.75
    # labels/masks/shape contracts unchanged
    assert lab.shape == (400,)
    gh, c, ml = load_dataset("synth-pubmed-hard")
    assert gh.n_nodes == 19717 and not ml
