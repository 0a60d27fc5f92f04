"""On-disk dataset loaders exercised against fabricated fixture files in the
real public formats (SURVEY.md §2a row 12; reference load_graph.py:1-89).

No network egress in this environment, so each test writes a tiny dataset in
the exact on-disk layout the loader expects (planetoid ``ind.*`` pickles,
GraphSAINT npz, DGL reddit npz, OGB csv.gz) and checks the parsed Graph.
"""
import gzip
import json
import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

import bliss_gnn_tpu.graph.datasets as ds
from bliss_gnn_tpu.graph.structure import Graph


@pytest.fixture
def data_root(tmp_path, monkeypatch):
    monkeypatch.setattr(ds, "DATA_ROOT", str(tmp_path))
    return tmp_path


def _write_planetoid(d, name, n_known=8, n_test=3, f=6, c=3, gap=False):
    """ind.<name>.{x,y,tx,ty,allx,ally,graph,test.index} family.

    test.index is SHUFFLED, as in the real datasets — tx row i belongs to
    node test_idx[i], and the loader must reorder (a sorted fixture cannot
    catch a scrambled reorder).  ``gap=True`` additionally leaves a hole in
    the index (the citeseer isolated-node quirk)."""
    rng = np.random.default_rng(0)
    os.makedirs(d, exist_ok=True)
    test_idx = (np.array([n_known + 3, n_known, n_known + 1]) if gap
                else np.array([n_known + 2, n_known, n_known + 1]))
    n = n_known + (test_idx.max() - test_idx.min() + 1 if gap else n_test)
    allx = sp.csr_matrix(rng.random((n_known, f)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_test, f)).astype(np.float32))
    ally = np.eye(c)[rng.integers(0, c, n_known)]
    ty = np.eye(c)[rng.integers(0, c, n_test)]
    x, y = allx[:4], ally[:4]
    graph = {i: [int(j) for j in rng.integers(0, n, 2)] for i in range(n)}
    for suffix, obj in [("x", x), ("y", y), ("tx", tx), ("ty", ty),
                        ("allx", allx), ("ally", ally), ("graph", graph)]:
        with open(os.path.join(d, f"ind.{name}.{suffix}"), "wb") as fh:
            pickle.dump(obj, fh)
    np.savetxt(os.path.join(d, f"ind.{name}.test.index"), test_idx, fmt="%d")
    return n, c, test_idx, np.asarray(tx.todense()), ty


def test_planetoid_loader(data_root):
    n, c, test_idx, tx, ty = _write_planetoid(data_root / "pubmed", "pubmed")
    g, n_classes, multilabel = ds.load_dataset("pubmed")
    assert isinstance(g, Graph)
    assert (g.n_nodes, n_classes, multilabel) == (n, c, False)
    assert g.ndata["features"].shape == (n, 6)
    assert g.ndata["labels"].shape == (n,)
    assert g.ndata["test_mask"].sum() == len(test_idx)
    assert g.ndata["test_mask"][test_idx].all()
    assert g.n_edges > 0  # symmetrized adjacency dict
    # tx row i belongs to node test_idx[i] — the reorder must hold for a
    # SHUFFLED index (the real datasets' test.index is shuffled)
    np.testing.assert_allclose(g.ndata["features"][test_idx], tx, rtol=1e-6)
    np.testing.assert_array_equal(g.ndata["labels"][test_idx],
                                  ty.argmax(axis=1))


def test_planetoid_citeseer_isolated_test_nodes(data_root):
    n, c, test_idx, tx, ty = _write_planetoid(
        data_root / "citeseer", "citeseer", gap=True
    )
    g, n_classes, _ = ds.load_dataset("citeseer")
    assert g.n_nodes == n
    assert n_classes == c
    # the hole node exists, carries zero features and label 0
    holes = sorted(set(range(test_idx.min(), test_idx.max() + 1))
                   - set(test_idx.tolist()))
    for hole in holes:
        assert not g.ndata["test_mask"][hole]
        assert np.all(g.ndata["features"][hole] == 0)
    # shuffled-index reorder correctness with the gap extension
    np.testing.assert_allclose(g.ndata["features"][test_idx], tx, rtol=1e-6)
    np.testing.assert_array_equal(g.ndata["labels"][test_idx],
                                  ty.argmax(axis=1))


def _write_saint(d, n=12, f=5, c=4, multilabel=False):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(1)
    adj = sp.random(n, n, density=0.3, random_state=2, format="csr")
    sp.save_npz(os.path.join(d, "adj_full.npz"), adj)
    np.save(os.path.join(d, "feats.npy"), rng.random((n, f)).astype(np.float32))
    if multilabel:
        cm = {str(i): [int(b) for b in rng.integers(0, 2, c)] for i in range(n)}
    else:
        cm = {str(i): int(rng.integers(0, c)) for i in range(n)}
        cm["0"] = c - 1  # pin max so n_classes is deterministic
    with open(os.path.join(d, "class_map.json"), "w") as fh:
        json.dump(cm, fh)
    role = {"tr": list(range(6)), "va": [6, 7, 8], "te": [9, 10, 11]}
    with open(os.path.join(d, "role.json"), "w") as fh:
        json.dump(role, fh)
    return adj


@pytest.mark.parametrize("name,multilabel", [("flickr", False), ("yelp", True)])
def test_saint_loader(data_root, name, multilabel):
    adj = _write_saint(data_root / name, multilabel=multilabel)
    g, n_classes, ml = ds.load_dataset(name)
    assert ml == multilabel
    assert n_classes == 4
    assert g.n_edges == adj.nnz
    assert g.ndata["train_mask"].sum() == 6
    assert g.ndata["val_mask"].sum() == 3
    if multilabel:
        assert g.ndata["labels"].shape == (12, 4)
    else:
        assert g.ndata["labels"].shape == (12,)


def test_reddit_dgl_npz_loader(data_root):
    d = data_root / "reddit"
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(3)
    n, f = 10, 4
    adj = sp.random(n, n, density=0.4, random_state=4, format="csr")
    sp.save_npz(os.path.join(d, "reddit_graph.npz"), adj)
    types = np.array([1, 1, 1, 1, 2, 2, 3, 3, 3, 3])
    np.savez(
        os.path.join(d, "reddit_data.npz"),
        feature=rng.random((n, f)).astype(np.float32),
        label=rng.integers(0, 5, n),
        node_types=types,
    )
    g, n_classes, ml = ds.load_dataset("reddit")
    assert not ml
    assert g.n_nodes == n and g.n_edges == adj.nnz
    assert g.ndata["train_mask"].sum() == 4
    assert g.ndata["val_mask"].sum() == 2
    assert g.ndata["test_mask"].sum() == 4


def test_download_hook_reddit_zip(data_root, monkeypatch, tmp_path):
    """--download / BLISS_ALLOW_DOWNLOAD=1 fetches + extracts missing raw
    files on first use (reference: dgl.data auto-download,
    load_graph.py:16).  The fetch is mocked (no egress here): it serves a
    zip in the real data.dgl.ai layout; everything after — extraction,
    flattening, loader integration — is the production path."""
    import zipfile

    rng = np.random.default_rng(3)
    n, f = 10, 4
    adj = sp.random(n, n, density=0.4, random_state=4, format="csr")
    staging = tmp_path / "staging"
    os.makedirs(staging, exist_ok=True)
    sp.save_npz(staging / "reddit_graph.npz", adj)
    np.savez(
        staging / "reddit_data.npz",
        feature=rng.random((n, f)).astype(np.float32),
        label=rng.integers(0, 5, n),
        node_types=np.array([1, 1, 1, 1, 2, 2, 3, 3, 3, 3]),
    )
    fetched = []

    def fake_fetch(url, dest):
        fetched.append(url)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with zipfile.ZipFile(dest, "w") as zf:
            for fn in ("reddit_graph.npz", "reddit_data.npz"):
                zf.write(staging / fn, fn)

    monkeypatch.setattr(ds, "_fetch", fake_fetch)
    # gate honored: without the env, missing files still raise
    monkeypatch.delenv("BLISS_ALLOW_DOWNLOAD", raising=False)
    with pytest.raises(FileNotFoundError):
        ds.load_dataset("reddit")
    assert fetched == []
    monkeypatch.setenv("BLISS_ALLOW_DOWNLOAD", "1")
    g, n_classes, ml = ds.load_dataset("reddit")
    assert fetched == [f"{ds._DGL_DATA_URL}/reddit.zip"]
    assert g.n_nodes == n and g.n_edges == adj.nnz
    # second load: files on disk, no re-fetch
    ds.load_dataset("reddit")
    assert len(fetched) == 1


def test_download_hook_planetoid_files(data_root, monkeypatch):
    """Planetoid download fetches the ind.<name>.* family file-by-file
    from the canonical host (reference: dgl.data CoraGraphDataset,
    load_graph.py:11-14)."""
    written = _write_planetoid(data_root / "staging", "cora")

    def fake_fetch(url, dest):
        fn = os.path.basename(dest)
        src = data_root / "staging" / fn
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(src, "rb") as s, open(dest, "wb") as d:
            d.write(s.read())

    monkeypatch.setattr(ds, "_fetch", fake_fetch)
    monkeypatch.setenv("BLISS_ALLOW_DOWNLOAD", "1")
    g, n_classes, ml = ds.load_dataset("cora")
    assert g.n_nodes == written[0] and not ml


def test_ogb_loader(data_root):
    import pandas as pd

    d = data_root / "ogbn_arxiv"
    raw = d / "raw"
    split = d / "split" / "time"
    os.makedirs(raw)
    os.makedirs(split)
    rng = np.random.default_rng(5)
    n, f = 9, 3
    edges = rng.integers(0, n, (20, 2))
    pd.DataFrame(edges).to_csv(raw / "edge.csv.gz", header=False, index=False,
                               compression="gzip")
    pd.DataFrame(rng.random((n, f))).to_csv(
        raw / "node-feat.csv.gz", header=False, index=False, compression="gzip"
    )
    # n_classes counts DISTINCT labels (load_graph.py:43) — pin all 6
    labels = rng.integers(0, 6, n)
    labels[:6] = np.arange(6)
    pd.DataFrame(labels).to_csv(raw / "node-label.csv.gz", header=False,
                                index=False, compression="gzip")
    for fname, idx in [("train.csv.gz", [0, 1, 2, 3]), ("valid.csv.gz", [4, 5]),
                       ("test.csv.gz", [6, 7, 8])]:
        pd.DataFrame(idx).to_csv(split / fname, header=False, index=False,
                                 compression="gzip")
    g, n_classes, ml = ds.load_dataset("ogbn-arxiv")
    assert (g.n_nodes, g.n_edges, n_classes, ml) == (n, 20, 6, False)
    assert g.ndata["train_mask"].sum() == 4


def test_ogb_papers100m_binary_layout(data_root):
    """papers100M ships as binary npz (raw/data.npz + raw/node-label.npz)
    with a 'time' split dir, OGB-cased directory name, and NaN labels on
    unlabeled nodes (reference supports it via ogb.nodeproppred,
    load_graph.py:72; n_classes over non-NaN labels, :43)."""
    import pandas as pd

    d = data_root / "ogbn_papers100M"
    raw = d / "raw"
    split = d / "split" / "time"
    os.makedirs(raw)
    os.makedirs(split)
    rng = np.random.default_rng(7)
    n, f = 11, 4
    edge_index = rng.integers(0, n, (2, 25))
    np.savez(raw / "data.npz",
             edge_index=edge_index,
             node_feat=rng.random((n, f)).astype(np.float32))
    labels = rng.integers(0, 4, n).astype(np.float64)
    labels[5:] = np.nan  # unlabeled majority, as in the real dataset
    labels[:4] = [0, 1, 2, 3]  # pin the class set
    np.savez(raw / "node-label.npz", node_label=labels.reshape(-1, 1))
    for fname, idx in [("train.csv.gz", [0, 1]), ("valid.csv.gz", [2]),
                       ("test.csv.gz", [3, 4])]:
        pd.DataFrame(idx).to_csv(split / fname, header=False, index=False,
                                 compression="gzip")
    g, n_classes, ml = ds.load_dataset("ogbn-papers100M")
    assert (g.n_nodes, g.n_edges, n_classes, ml) == (n, 25, 4, False)
    assert g.ndata["labels"].dtype == np.int64
    assert (g.ndata["labels"][5:] == -1).all()  # NaN -> -1, no UB cast
    assert g.ndata["train_mask"].sum() == 2
    assert g.ndata["val_mask"].sum() == 1
    # features are served MEMORY-MAPPED (numpy ignores mmap_mode for npz,
    # so a raw .npy sidecar is streamed out once — a 150 GB data.npz must
    # never be np.load'ed eagerly), and a second load reuses the sidecar
    assert isinstance(g.ndata["features"], np.memmap)
    assert os.path.exists(raw / "data.npz.node_feat.npy")
    g2, _, _ = ds.load_dataset("ogbn-papers100M")
    assert isinstance(g2.ndata["features"], np.memmap)
    np.testing.assert_array_equal(
        np.asarray(g2.ndata["features"]), np.asarray(g.ndata["features"])
    )


def test_parity_checksum_harness(data_root, monkeypatch, capsys):
    """scripts/parity.py produces the checksum report for any dataset found
    under BLISS_DATA_ROOT, flagging divergence from published stats."""
    import importlib

    _write_saint(data_root / "flickr")
    sys_path_parity = os.path.join(os.path.dirname(__file__), "..", "scripts")
    import sys as _sys
    _sys.path.insert(0, sys_path_parity)
    try:
        parity = importlib.import_module("parity")
    finally:
        _sys.path.remove(sys_path_parity)
    monkeypatch.setattr(ds, "DATA_ROOT", str(data_root))
    rep = parity.checksum("flickr")
    assert rep["nodes"] == 12 and rep["edges"] > 0
    assert rep["verdict"].startswith("MISMATCH")  # tiny fixture != published
    assert "nodes" in rep["verdict"]
    assert len(rep["feat_sha"]) == 16
    # a dataset matching its published row verdicts MATCH
    parity.PUBLISHED["flickr"] = dict(nodes=12, feats=5, classes=4,
                                      splits=(6, 3, 3))
    assert parity.checksum("flickr")["verdict"] == "MATCH"


def test_loaders_feed_training(data_root):
    """A loaded-from-disk graph runs through canonicalize + one sampled
    training step (the DataModule path, train_lightning.py:331-373)."""
    _write_saint(data_root / "flickr")
    import jax
    import jax.numpy as jnp

    from bliss_gnn_tpu.graph.structure import Graph as G, normalized_edata
    from bliss_gnn_tpu.sampling.block import CapacityPlan
    from bliss_gnn_tpu.sampling.samplers import (
        SamplerConfig, init_exp3_weights, sample_blocks,
    )

    g, n_classes, _ = ds.load_dataset("flickr")
    g = G.canonicalize(g)
    g.edata["w"] = normalized_edata(g)
    dg = g.to_device()
    cfg = SamplerConfig(kind="poisson-bandit", fanouts=(4, 3))
    plan = CapacityPlan.build(4, cfg.fanouts, g.n_nodes, g.n_edges, kind=cfg.kind)
    exp3 = init_exp3_weights(2, g.n_edges)
    seeds = jnp.arange(plan.batch_size, dtype=jnp.int32) % g.n_nodes
    blocks, stats = jax.jit(
        lambda k: sample_blocks(dg, cfg, plan, k, seeds,
                                jnp.ones(plan.batch_size, bool), exp3)
    )(jax.random.PRNGKey(0))
    assert len(blocks) == 2
    assert int(stats["layer0/n_selected"]) > 0


def test_fetch_verifies_pinned_sha256(tmp_path, monkeypatch):
    """_fetch verifies a pinned sha256 before the atomic rename: a
    mismatching payload is rejected and removed (the reference's ogb
    loader md5-checks its downloads); unpinned archives are refused
    under BLISS_REQUIRE_CHECKSUM=1."""
    import hashlib
    import io
    import urllib.request

    payload = b"graph bytes"

    def fake_urlopen(url, timeout=None):
        class _R(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return _R(payload)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)

    # correct pin -> file lands
    good = hashlib.sha256(payload).hexdigest()
    monkeypatch.setitem(ds._ARCHIVE_SHA256, "good.zip", good)
    dest = tmp_path / "d" / "good.zip"
    ds._fetch("https://example.test/good.zip", str(dest))
    assert dest.read_bytes() == payload

    # wrong pin -> raise, nothing left behind
    monkeypatch.setitem(ds._ARCHIVE_SHA256, "bad.zip", "0" * 64)
    bad = tmp_path / "d" / "bad.zip"
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        ds._fetch("https://example.test/bad.zip", str(bad))
    assert not bad.exists() and not (tmp_path / "d" / "bad.zip.part").exists()

    # strict mode refuses unpinned basenames before any bytes move
    monkeypatch.setenv("BLISS_REQUIRE_CHECKSUM", "1")
    with pytest.raises(RuntimeError, match="no pinned sha256"):
        ds._fetch("https://example.test/unpinned.zip", str(tmp_path / "u.zip"))


def test_gather_rows_oob_forward_matches_backward_drop():
    """ops.segment._gather_rows: out-of-range ids read ZERO forward and
    get zero gradient — forward-drop / backward-drop parity (the old
    clip-mode forward contributed the last row with no gradient)."""
    import jax
    import jax.numpy as jnp
    from bliss_gnn_tpu.ops.segment import _gather_rows

    x = jnp.arange(12.0, dtype=jnp.float32).reshape(4, 3)
    idx = jnp.array([0, 3, 4, 99], dtype=jnp.int32)  # 4 and 99 are OOB
    out = _gather_rows(x, idx, 4)
    np.testing.assert_array_equal(np.asarray(out[2]), 0.0)
    np.testing.assert_array_equal(np.asarray(out[3]), 0.0)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[3]))

    g = jax.grad(lambda x: _gather_rows(x, idx, 4).sum())(x)
    expect = np.zeros((4, 3), np.float32)
    expect[0] = 1.0
    expect[3] = 1.0
    np.testing.assert_array_equal(np.asarray(g), expect)
