"""Dataset loaders: toy fixture, synthetic generators, and on-disk loaders.

Mirrors the reference's data layer (load_graph.py):
- ``load_dataset(name) -> (Graph, n_classes, multilabel)``  (load_graph.py:65-80)
- the 5-node toy fixture (load_graph.py:91-120)
- cora/citeseer/pubmed/reddit/yelp/flickr + ogbn-* dispatch

This environment has no network egress, so the real-dataset loaders read
pre-downloaded files from ``BLISS_DATA_ROOT`` (default ``~/datasets``) in the
standard public formats:
- planetoid (cora/citeseer/pubmed): the ``ind.<name>.*`` pickle family
- GraphSAINT npz (reddit/yelp/flickr): adj_full.npz + feats.npy + class_map.json + role.json
- DGL RedditDataset npz: reddit_data.npz + reddit_graph.npz
- ogbn-*: the OGB extracted directory layout (csv.gz / npy)

Synthetic generators provide benchmark-scale graphs with the same shape
statistics as the published configs (README.md:22-30) when raw data is absent.
"""
from __future__ import annotations

import json
import os
import pickle
import sys
from typing import Tuple

import numpy as np

from bliss_gnn_tpu.graph.structure import Graph

DATA_ROOT = os.environ.get("BLISS_DATA_ROOT", os.path.expanduser("~/datasets"))

# (n_nodes, n_edges(directed, no self-loops), n_feats, n_classes, multilabel)
# Shape statistics of the reference's datasets, for synthetic stand-ins.
DATASET_STATS = {
    "cora": (2708, 10556, 1433, 7, False),
    "citeseer": (3327, 9104, 3703, 6, False),
    "pubmed": (19717, 88648, 500, 3, False),
    "flickr": (89250, 899756, 500, 7, False),
    "reddit": (232965, 114615892, 602, 41, False),
    "yelp": (716847, 13954819, 300, 100, True),
    "ogbn-arxiv": (169343, 1166243, 128, 40, False),
    "ogbn-products": (2449029, 123718280, 100, 47, False),
    # papers100M (load_graph.py:72): the UVA / feature-cache stress case —
    # features alone are ~53 GB bf16, far beyond one chip's HBM.  A full-size
    # synthetic stand-in is not generatable on this host; use
    # synth-papers100m-small for the cache-path shape tests.
    "ogbn-papers100m": (111059956, 1615685872, 128, 172, False),
}

# OGB on-disk split directory per dataset (the split rule name chosen by OGB;
# reference gets it transparently via ogb.nodeproppred, load_graph.py:32-38)
_OGB_SPLIT_DIR = {
    "ogbn-arxiv": "time",
    "ogbn-papers100m": "time",
    "ogbn-products": "sales_ranking",
}


def toy_graph() -> Tuple[Graph, int, bool]:
    """5-node/4-edge deterministic fixture, parity with load_graph.py:91-120.

    Edges ([2,3,3,4] -> [0,0,1,1]), 4-d one-hot-ish features, binary labels,
    all-train masks, edge weights [0.5, 0.5, 0.3, 0.7].
    """
    src = np.array([2, 3, 3, 4])
    dst = np.array([0, 0, 1, 1])
    ndata = {
        "features": np.array(
            [[0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 1, 0], [0, 0, 0, 1], [1, 0, 0, 0]],
            dtype=np.float32,
        ),
        "labels": np.array([0, 0, 1, 1, 1], dtype=np.int64),
        "train_mask": np.ones(5, dtype=bool),
        "val_mask": np.zeros(5, dtype=bool),
        "test_mask": np.zeros(5, dtype=bool),
    }
    edata = {"weight": np.array([0.5, 0.5, 0.3, 0.7], dtype=np.float32)}
    return Graph(src, dst, 5, ndata=ndata, edata=edata), 2, False


def synthetic_graph(
    n_nodes: int,
    n_edges: int,
    n_feats: int,
    n_classes: int,
    multilabel: bool = False,
    seed: int = 0,
    power: float = 0.8,
    homophily: float = 0.0,
    feature_noise: float = 2.0,
    beacon_frac: float = 1.0,
    beacon_scale: float = 1.0,
) -> Tuple[Graph, int, bool]:
    """Power-law random graph with clustered features for benchmark runs.

    Degree distribution follows a Zipf-like law (real social/citation graphs
    are heavy-tailed; Reddit's max in-degree is ~21k).  Features are noisy
    class prototypes so that GNN training makes measurable progress.

    ``homophily`` rewires that fraction of edges to connect SAME-label
    endpoints (real citation/social graphs are homophilous; with 0.0 the
    structure is label-independent and aggregation is pure noise, so
    sampler quality cannot move accuracy).  ``feature_noise`` scales the
    per-node noise on the class prototypes: at the 2.0 default a linear
    probe on raw features already separates classes; the 'hard' bench
    variants raise it so the signal lives in the (homophilous) neighborhood
    aggregate and convergence genuinely depends on WHICH edges get sampled
    — the property the time-to-val-F1 bench needs to be sensitive to a
    broken bandit update.

    ``beacon_frac`` < 1 makes only that fraction of nodes carry the class
    prototype at ``beacon_scale`` amplitude (the rest at amplitude 1, i.e.
    noise-dominated under a large ``feature_noise``).  This gives edges
    HETEROGENEOUS importance in exactly the sense the EXP3 reward measures
    (r_ij ~ alpha^2 * ||h_src||^2 / q^2, bandit_sampler.py:160-193): the
    variance-minimizing sampler concentrates on beacon sources, so a
    working bandit visibly beats uniform arm weights on val F1.
    """
    rng = np.random.default_rng(seed)
    # dst endpoints ~ power-law popularity
    pop = rng.zipf(1.0 + power, size=n_nodes).astype(np.float64)
    pop /= pop.sum()
    dst = rng.choice(n_nodes, size=n_edges, p=pop)
    src = rng.integers(0, n_nodes, size=n_edges)
    labels_int = rng.integers(0, n_classes, size=n_nodes)
    if homophily > 0.0:
        # rewire a homophilous subset: src is redrawn from the dst's class
        # (uniform within class), leaving the power-law dst endpoints alone
        by_class = [np.flatnonzero(labels_int == c) for c in range(n_classes)]
        rewire = rng.random(n_edges) < homophily
        ridx = np.flatnonzero(rewire)
        cls = labels_int[dst[ridx]]
        pick = rng.integers(0, 1 << 62, size=len(ridx))
        # a dst's own class is always non-empty (it contains dst), but
        # guard anyway so an empty class can never divide by zero
        src[ridx] = np.array(
            [by_class[c][p % len(by_class[c])] if len(by_class[c]) else s
             for c, p, s in zip(cls, pick, src[ridx])],
            dtype=src.dtype,
        )
    protos = rng.normal(size=(n_classes, n_feats)).astype(np.float32)
    amp = np.ones((n_nodes, 1), np.float32)
    if beacon_frac < 1.0:
        amp[rng.random(n_nodes) < beacon_frac] = beacon_scale
    feats = protos[labels_int] * amp + rng.normal(
        scale=feature_noise, size=(n_nodes, n_feats)
    ).astype(np.float32)
    if multilabel:
        labels = np.zeros((n_nodes, n_classes), dtype=np.float32)
        labels[np.arange(n_nodes), labels_int] = 1.0
        extra = rng.integers(0, n_classes, size=n_nodes)
        labels[np.arange(n_nodes), extra] = 1.0
    else:
        labels = labels_int.astype(np.int64)
    perm = rng.permutation(n_nodes)
    n_train = int(0.65 * n_nodes)
    n_val = int(0.1 * n_nodes)
    train_mask = np.zeros(n_nodes, dtype=bool)
    val_mask = np.zeros(n_nodes, dtype=bool)
    test_mask = np.zeros(n_nodes, dtype=bool)
    train_mask[perm[:n_train]] = True
    val_mask[perm[n_train : n_train + n_val]] = True
    test_mask[perm[n_train + n_val :]] = True
    ndata = {
        "features": feats,
        "labels": labels,
        "train_mask": train_mask,
        "val_mask": val_mask,
        "test_mask": test_mask,
    }
    return Graph(src, dst, n_nodes, ndata=ndata), n_classes, multilabel


# ---------------------------------------------------------------------------
# On-disk loaders (standard public formats) + guarded auto-download
# ---------------------------------------------------------------------------

# canonical public sources (the same hosts dgl.data / ogb fetch from —
# reference: load_graph.py:11-22 downloads via dgl.data, :32 via ogb)
_PLANETOID_URL = "https://github.com/kimiyoung/planetoid/raw/master/data"
_PLANETOID_SUFFIXES = ("x", "y", "tx", "ty", "allx", "ally", "graph",
                       "test.index")
_DGL_DATA_URL = "https://data.dgl.ai/dataset"
_OGB_URL = "https://snap.stanford.edu/ogb/data/nodeproppred"
# zip -> extracted dir -> final dir expected by _load_ogb
_OGB_ZIPS = {
    "ogbn-arxiv": ("arxiv.zip", "arxiv", "ogbn_arxiv"),
    "ogbn-products": ("products.zip", "products", "ogbn_products"),
    "ogbn-papers100m": ("papers100M-bin.zip", "papers100M-bin",
                        "ogbn_papers100M"),
}


def download_allowed() -> bool:
    """Downloads are opt-in: --download / BLISS_ALLOW_DOWNLOAD=1 (this
    build environment has no egress, so the default must never fetch)."""
    return os.environ.get("BLISS_ALLOW_DOWNLOAD", "0") == "1"


# Pinned sha256 digests per archive/file basename.  The reference's ogb
# loader md5-checks its downloads; dgl.data does not.  This build
# environment has no egress, so real digests could never be computed
# here — the table ships empty and verification activates per-entry the
# moment a pin is added (fill it from a networked machine with
# `sha256sum <archive>` before first production use).  With
# BLISS_REQUIRE_CHECKSUM=1, unpinned archives are refused outright.
_ARCHIVE_SHA256: dict = {
    # "reddit.zip": "<sha256>", "arxiv.zip": "<sha256>", ...
}


def _verify_sha256(path: str, expect: str):
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            h.update(chunk)
    got = h.hexdigest()
    if got != expect:
        os.remove(path)
        raise RuntimeError(
            f"checksum mismatch for {path}: expected {expect}, got {got} "
            f"(file removed; possible corruption or tampering)"
        )


def _fetch(url: str, dest: str):
    """Stream one URL to dest (bounded memory, atomic rename); verify a
    pinned sha256 when one exists for the basename."""
    import shutil
    import urllib.request

    base = os.path.basename(dest)
    pin = _ARCHIVE_SHA256.get(base)
    if pin is None and os.environ.get("BLISS_REQUIRE_CHECKSUM", "0") == "1":
        raise RuntimeError(
            f"BLISS_REQUIRE_CHECKSUM=1 but no pinned sha256 for '{base}' "
            f"in _ARCHIVE_SHA256 — refusing unverifiable download"
        )
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f, length=1 << 22)
    if pin is not None:
        _verify_sha256(tmp, pin)
    os.replace(tmp, dest)


def download_dataset(name: str, root: str | None = None) -> str:
    """Fetch the raw files for ``name`` into the data root from the same
    public sources the reference's loaders use (dgl.data for
    cora/.../reddit/yelp/flickr, load_graph.py:11-22; OGB snapshots,
    :32).  Returns the dataset directory.  Idempotent — existing files
    are kept.  Caller gates on ``download_allowed()``."""
    import zipfile

    root = root or DATA_ROOT
    name = name.lower()
    if name in ("cora", "citeseer", "pubmed"):
        d = os.path.join(root, name)
        for suf in _PLANETOID_SUFFIXES:
            dest = os.path.join(d, f"ind.{name}.{suf}")
            if not os.path.exists(dest):
                _fetch(f"{_PLANETOID_URL}/ind.{name}.{suf}", dest)
        return d
    if name in ("reddit", "yelp", "flickr"):
        d = os.path.join(root, name)
        zpath = os.path.join(d, f"{name}.zip")
        probe = (
            "reddit_data.npz" if name == "reddit" else "adj_full.npz"
        )
        if not os.path.exists(os.path.join(d, probe)):
            if not os.path.exists(zpath):
                _fetch(f"{_DGL_DATA_URL}/{name}.zip", zpath)
            with zipfile.ZipFile(zpath) as zf:
                zf.extractall(d)
            # some archives nest a single top-level dir — flatten it
            inner = os.path.join(d, name)
            if os.path.isdir(inner) and not os.path.exists(
                os.path.join(d, probe)
            ):
                for f in os.listdir(inner):
                    os.replace(os.path.join(inner, f), os.path.join(d, f))
        return d
    if name in _OGB_ZIPS:
        zname, extracted, final = _OGB_ZIPS[name]
        d = os.path.join(root, final)
        if not os.path.exists(os.path.join(d, "raw")):
            zpath = os.path.join(root, zname)
            if not os.path.exists(zpath):
                _fetch(f"{_OGB_URL}/{zname}", zpath)
            with zipfile.ZipFile(zpath) as zf:
                zf.extractall(root)
            src = os.path.join(root, extracted)
            if src != d and os.path.isdir(src):
                if os.path.isdir(d):
                    # stale dir from an interrupted earlier attempt (it
                    # has no raw/, or we wouldn't be here) — clear it so
                    # the rename stays idempotent
                    import shutil

                    shutil.rmtree(d)
                os.replace(src, d)
        return d
    raise ValueError(f"no download source known for dataset '{name}'")


def _planetoid_dir(name: str) -> str:
    for cand in (
        os.path.join(DATA_ROOT, name),
        os.path.join(DATA_ROOT, "planetoid"),
        DATA_ROOT,
    ):
        if os.path.exists(os.path.join(cand, f"ind.{name}.graph")):
            return cand
    raise FileNotFoundError(
        f"planetoid raw files 'ind.{name}.*' not found under {DATA_ROOT}; "
        f"set BLISS_DATA_ROOT or use the synthetic stand-in "
        f"(load_dataset('synth-{name}'))."
    )


def _load_planetoid(name: str) -> Tuple[Graph, int, bool]:
    """Parse the ind.<name>.{x,y,tx,ty,allx,ally,graph,test.index} family."""
    import scipy.sparse as sp

    d = _planetoid_dir(name)

    def _pkl(suffix):
        with open(os.path.join(d, f"ind.{name}.{suffix}"), "rb") as f:
            if sys.version_info.major > 2:
                return pickle.load(f, encoding="latin1")
            return pickle.load(f)

    x, y, tx, ty, allx, ally, graph = (
        _pkl(s) for s in ["x", "y", "tx", "ty", "allx", "ally", "graph"]
    )
    test_idx = np.loadtxt(
        os.path.join(d, f"ind.{name}.test.index"), dtype=np.int64
    )
    test_range = np.arange(test_idx.min(), test_idx.max() + 1)
    test_sorted = np.sort(test_idx)
    if name == "citeseer":
        # citeseer has isolated test nodes missing from tx/ty
        # rows are placed at SORTED positions (the standard Kipf/GCN loader:
        # tx_extended[test_idx_range - min] = tx); the reorder swap below
        # then moves each row to its true (shuffled) node id.  Indexing by
        # the unsorted test_idx here would pre-place rows at final positions
        # and the swap would scramble them.
        tx_ext = np.zeros((len(test_range), x.shape[1]), dtype=np.float32)
        tx_ext[test_sorted - test_idx.min(), :] = np.asarray(tx.todense())
        tx = sp.csr_matrix(tx_ext)
        ty_ext = np.zeros((len(test_range), y.shape[1]))
        ty_ext[test_sorted - test_idx.min(), :] = ty
        ty = ty_ext
    # un-shuffle the test rows: position test_idx[i] gets the i-th test row
    # (which vstack placed at sorted position test_sorted[i]) — the standard
    # planetoid reorder; test_sorted == test_range only when the index list
    # is gap-free (citeseer has isolated nodes missing from it)
    features = sp.vstack((allx, tx)).tolil()
    features[test_idx, :] = features[test_sorted, :]
    labels_oh = np.vstack((ally, ty))
    labels_oh[test_idx, :] = labels_oh[test_sorted, :]
    labels = labels_oh.argmax(axis=1)
    n = features.shape[0]
    src, dst = [], []
    for u, nbrs in graph.items():
        for v in nbrs:
            src.append(u)
            dst.append(v)
    src = np.asarray(src)
    dst = np.asarray(dst)
    # planetoid graphs are symmetric dicts; standard loaders symmetrize
    src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    n_train = {"cora": 140, "citeseer": 120, "pubmed": 60}[name]
    train_mask = np.zeros(n, dtype=bool)
    train_mask[:n_train] = True
    val_mask = np.zeros(n, dtype=bool)
    val_mask[n_train : n_train + 500] = True
    test_mask = np.zeros(n, dtype=bool)
    test_mask[test_idx] = True
    ndata = {
        "features": np.asarray(features.todense(), dtype=np.float32),
        "labels": labels.astype(np.int64),
        "train_mask": train_mask,
        "val_mask": val_mask,
        "test_mask": test_mask,
    }
    return Graph(src, dst, n, ndata=ndata), labels_oh.shape[1], False


def _load_saint_npz(name: str) -> Tuple[Graph, int, bool]:
    """GraphSAINT format: adj_full.npz, feats.npy, class_map.json, role.json."""
    import scipy.sparse as sp

    d = os.path.join(DATA_ROOT, name)
    if not os.path.exists(os.path.join(d, "adj_full.npz")):
        raise FileNotFoundError(
            f"GraphSAINT files for '{name}' not found under {d}; "
            f"set BLISS_DATA_ROOT or use load_dataset('synth-{name}')."
        )
    adj = sp.load_npz(os.path.join(d, "adj_full.npz")).tocoo()
    feats = np.load(os.path.join(d, "feats.npy")).astype(np.float32)
    with open(os.path.join(d, "class_map.json")) as f:
        class_map = json.load(f)
    with open(os.path.join(d, "role.json")) as f:
        role = json.load(f)
    n = feats.shape[0]
    first = next(iter(class_map.values()))
    multilabel = isinstance(first, list)
    if multilabel:
        n_classes = len(first)
        labels = np.zeros((n, n_classes), dtype=np.float32)
        for k, v in class_map.items():
            labels[int(k)] = v
    else:
        labels = np.zeros(n, dtype=np.int64)
        for k, v in class_map.items():
            labels[int(k)] = v
        n_classes = int(labels.max()) + 1
    masks = {}
    for split, key in [("train_mask", "tr"), ("val_mask", "va"), ("test_mask", "te")]:
        m = np.zeros(n, dtype=bool)
        m[np.asarray(role[key])] = True
        masks[split] = m
    ndata = {"features": feats, "labels": labels, **masks}
    return Graph(adj.row, adj.col, n, ndata=ndata), n_classes, multilabel


def _load_reddit_dgl(d: str) -> Tuple[Graph, int, bool]:
    """DGL RedditDataset raw layout: reddit_data.npz (feature/label/
    node_types with 1=train, 2=val, 3=test) + reddit_graph.npz (scipy coo).
    The alternative on-disk format for the reference's reddit loader
    (load_graph.py:16 via dgl.data.RedditDataset)."""
    import scipy.sparse as sp

    data = np.load(os.path.join(d, "reddit_data.npz"))
    adj = sp.load_npz(os.path.join(d, "reddit_graph.npz")).tocoo()
    feats = data["feature"].astype(np.float32)
    labels = data["label"].reshape(-1).astype(np.int64)
    types = data["node_types"].reshape(-1)
    ndata = {
        "features": feats,
        "labels": labels,
        "train_mask": types == 1,
        "val_mask": types == 2,
        "test_mask": types == 3,
    }
    n = feats.shape[0]
    return Graph(adj.row, adj.col, n, ndata=ndata), int(labels.max()) + 1, False


def _npz_member_memmap(npz_path: str, member: str) -> np.ndarray:
    """Serve one member of an .npz memory-mapped, with bounded-memory
    extraction.

    numpy IGNORES mmap_mode for .npz archives (verified: np.load(...,
    mmap_mode='r')['member'] returns a plain in-RAM ndarray for both
    stored and deflated members), so a direct np.load of papers100M's
    data.npz would materialize ~150 GB.  Here the member is streamed out
    of the zip once (shutil.copyfileobj in 16 MB chunks, bounded memory)
    into a raw ``.npy`` sidecar next to the archive, and every load after
    that is an O(1)-memory np.load(mmap_mode='r') of the sidecar."""
    import shutil
    import zipfile

    sidecar = f"{npz_path}.{member}.npy"
    if not os.path.exists(sidecar):
        with zipfile.ZipFile(npz_path) as zf:
            fname = f"{member}.npy"
            if fname not in zf.namelist():
                raise KeyError(f"{member} not in {npz_path}")
            tmp = sidecar + ".tmp"
            with zf.open(fname) as src, open(tmp, "wb") as dst:
                shutil.copyfileobj(src, dst, length=1 << 24)
            os.replace(tmp, sidecar)
    return np.load(sidecar, mmap_mode="r")


def sbm_graph(
    n_nodes: int,
    n_edges: int,
    n_feats: int,
    n_classes: int,
    multilabel: bool = False,
    seed: int = 0,
    n_blocks: int = 50,
    intra: float = 0.8,
    power: float = 0.8,
    block_power: float = 1.2,
    feature_noise: float = 2.0,
) -> Tuple[Graph, int, bool]:
    """Degree-corrected stochastic block model: the community-structured
    synthetic family.

    Every layout statistic behind the SpMM kernel routing (dense-block
    coverage at dense_t=300, equal-src run lengths, hybrid-vs-packed
    crossovers, refit caps) was originally measured on ONE generator
    (``synthetic_graph``: power-law popularity, label-independent
    structure).  Real Reddit is a *community* graph — its (256x256)
    block-density statistics after a locality reorder can differ
    materially.  This generator plants ``n_blocks`` communities with
    Zipf-skewed sizes (``block_power``), per-node Zipf degree propensity
    (``power``, degree-corrected SBM), and routes ``intra`` of the edges
    inside their community; labels follow a node's community (mod
    ``n_classes``) so the structure is homophilous like real
    citation/social graphs.  Node ids are SHUFFLED at the end — community
    membership is latent, exactly the situation a locality/community
    reorder (spmm_pallas layout) has to recover.

    Reference datasets this stands in for: load_graph.py:11-22.
    """
    rng = np.random.default_rng(seed)
    # Zipf-skewed community sizes
    bw = 1.0 / np.arange(1, n_blocks + 1) ** block_power
    bw /= bw.sum()
    node_comm = rng.choice(n_blocks, size=n_nodes, p=bw)
    # degree-corrected: per-node propensity ~ Zipf (heavy tail like
    # Reddit), capped so no node's expected degree exceeds ~21k at
    # Reddit's edge count (same realism cap as bench.build_graph — an
    # unbounded zipf puts ~10% of all edges on one node, which no real
    # graph does and which distorts every layout statistic)
    theta = rng.zipf(1.0 + power, size=n_nodes).astype(np.float64)
    max_frac = 21_000.0 / 114_848_857.0  # Reddit cap / Reddit edges
    for _ in range(8):  # clipping shifts the sum; iterate to fixpoint
        cap = max_frac * theta.sum()
        if theta.max() <= cap:
            break
        theta = np.minimum(theta, cap)
    # per-community node lists + normalized propensities
    order = np.argsort(node_comm, kind="stable")
    comm_sorted = node_comm[order]
    starts = np.searchsorted(comm_sorted, np.arange(n_blocks))
    ends = np.searchsorted(comm_sorted, np.arange(n_blocks), side="right")
    comm_mass = np.array(
        [theta[order[s:e]].sum() if e > s else 0.0
         for s, e in zip(starts, ends)]
    )
    # intra edges: community per edge ~ its propensity mass, endpoints
    # ~ theta within the community; inter edges: endpoints ~ theta global
    n_intra = int(round(intra * n_edges))
    pm = comm_mass / comm_mass.sum()
    intra_counts = rng.multinomial(n_intra, pm)
    src_parts, dst_parts = [], []
    for c in range(n_blocks):
        m = intra_counts[c]
        if m == 0 or ends[c] <= starts[c]:
            continue
        nodes_c = order[starts[c] : ends[c]]
        p_c = theta[nodes_c] / theta[nodes_c].sum()
        src_parts.append(rng.choice(nodes_c, size=m, p=p_c))
        dst_parts.append(rng.choice(nodes_c, size=m, p=p_c))
    n_inter = n_edges - sum(len(p) for p in src_parts)
    if n_inter > 0:
        pg = theta / theta.sum()
        src_parts.append(rng.choice(n_nodes, size=n_inter, p=pg))
        dst_parts.append(rng.choice(n_nodes, size=n_inter, p=pg))
    src = np.concatenate(src_parts)
    dst = np.concatenate(dst_parts)
    # latent communities: shuffle the id space so degree-sorting alone
    # cannot see the block structure
    relabel = rng.permutation(n_nodes)
    src = relabel[src]
    dst = relabel[dst]
    labels_int = np.empty(n_nodes, dtype=np.int64)
    labels_int[relabel] = node_comm % n_classes
    protos = rng.normal(size=(n_classes, n_feats)).astype(np.float32)
    feats = protos[labels_int] + rng.normal(
        scale=feature_noise, size=(n_nodes, n_feats)
    ).astype(np.float32)
    if multilabel:
        labels = np.zeros((n_nodes, n_classes), dtype=np.float32)
        labels[np.arange(n_nodes), labels_int] = 1.0
        extra = rng.integers(0, n_classes, size=n_nodes)
        labels[np.arange(n_nodes), extra] = 1.0
    else:
        labels = labels_int
    perm = rng.permutation(n_nodes)
    n_train = int(0.65 * n_nodes)
    n_val = int(0.1 * n_nodes)
    masks = {
        "train_mask": np.zeros(n_nodes, dtype=bool),
        "val_mask": np.zeros(n_nodes, dtype=bool),
        "test_mask": np.zeros(n_nodes, dtype=bool),
    }
    masks["train_mask"][perm[:n_train]] = True
    masks["val_mask"][perm[n_train : n_train + n_val]] = True
    masks["test_mask"][perm[n_train + n_val :]] = True
    ndata = {"features": feats, "labels": labels, **masks}
    return Graph(src, dst, n_nodes, ndata=ndata), n_classes, multilabel


def bandit_bench_graph(
    n_nodes: int = 19717,
    n_edges: int = 240_000,
    n_feats: int = 24,
    n_classes: int = 3,
    dead_frac: float = 0.75,
    n_dead: int = 2000,
    seed: int = 0,
) -> Tuple[Graph, int, bool]:
    """Pubmed-dimensioned stand-in where the BANDIT measurably matters.

    A plain clustered synthetic saturates in a handful of steps regardless
    of sampler (the round-2 time_to_f1 critique).  Here ``dead_frac`` of
    every node's in-edges are rerouted to featureless DEAD distractor
    nodes: aggregating them dilutes the class signal, and their
    near-zero embedding norms are exactly what the EXP3 reward
    r_ij ~ ||h_j||^2 / q_ij^2 (bandit_sampler.py:160-193) learns to
    downweight — static importance keeps sampling them.  time-to-val-F1
    on this graph separates the bandit from a broken/disabled bandit
    update (bench.py time_to_val_f1)."""
    g, n_classes, ml = synthetic_graph(
        n_nodes, n_edges, n_feats, n_classes, seed=seed
    )
    rng = np.random.default_rng(seed + 1)
    # rebuild the edge list from the CSC arrays
    dst = np.repeat(np.arange(g.n_nodes), np.diff(g.csc_indptr))
    src = np.asarray(g.csc_src)
    reroute = rng.random(len(src)) < dead_frac
    src = np.where(
        reroute, n_nodes + rng.integers(0, n_dead, len(src)), src
    )
    n_total = n_nodes + n_dead
    feats = np.concatenate([
        np.asarray(g.ndata["features"]),
        rng.normal(scale=0.02, size=(n_dead, n_feats)).astype(np.float32),
    ])
    labels = np.concatenate([
        np.asarray(g.ndata["labels"]),
        rng.integers(0, n_classes, n_dead).astype(np.int64),
    ])
    masks = {
        k: np.concatenate([np.asarray(g.ndata[k]), np.zeros(n_dead, bool)])
        for k in ("train_mask", "val_mask", "test_mask")
    }
    ndata = {"features": feats, "labels": labels, **masks}
    return Graph(src, dst, n_total, ndata=ndata), n_classes, ml


def _load_ogb(name: str) -> Tuple[Graph, int, bool]:
    """OGB node-prop on-disk layouts (reference: load_graph.py:32-63 via
    ogb.nodeproppred; supported names ogbn-products/arxiv/papers100M,
    load_graph.py:72):

    - csv.gz (arxiv/products): <root>/<name_>/raw/{edge,node-feat,node-label}.csv.gz
    - binary npz (papers100M ships this way — csv would be ~terabytes):
      raw/data.npz (edge_index [2,E], node_feat [N,F]) + raw/node-label.npz

    Labels may carry NaN on unlabeled nodes (papers100M labels only ~1.4% of
    nodes); the reference casts NaN straight to long (load_graph.py:44) and
    relies on the split masks only covering labeled nodes — here NaN becomes
    -1 for the same effect without UB.  n_classes counts distinct non-NaN
    labels (load_graph.py:43)."""
    under = name.replace("-", "_")
    # OGB's extracted dir preserves the original capitalization
    # (ogbn_papers100M); load_dataset lowercases names — try both
    cands = [os.path.join(DATA_ROOT, under),
             os.path.join(DATA_ROOT, under.replace("100m", "100M"))]
    d = next((c for c in cands if os.path.exists(os.path.join(c, "raw"))),
             cands[0])
    raw = os.path.join(d, "raw")
    if not os.path.exists(raw):
        raise FileNotFoundError(
            f"OGB raw dir for '{name}' not found at {raw}; "
            f"set BLISS_DATA_ROOT or use load_dataset('synth-{name}')."
        )
    if os.path.exists(os.path.join(raw, "data.npz")):
        # beyond-RAM layout: the papers100M node_feat member alone is
        # ~150 GB — never np.load it eagerly.  Stream each big member out
        # of the zip once into a raw .npy sidecar (bounded-memory
        # decompression), then serve it memory-mapped; the UVA feature
        # cache (graph/featurecache.py) reads rows straight off the map.
        feats = _npz_member_memmap(os.path.join(raw, "data.npz"),
                                   "node_feat")
        ei = _npz_member_memmap(os.path.join(raw, "data.npz"),
                                "edge_index")
        edges = ei.T  # [E, 2] view, no copy
        labels_f = np.load(os.path.join(raw, "node-label.npz"))[
            "node_label"
        ].reshape(-1).astype(np.float64)
    else:
        import pandas as pd

        edges = pd.read_csv(
            os.path.join(raw, "edge.csv.gz"), header=None
        ).values.astype(np.int64)
        feats = pd.read_csv(
            os.path.join(raw, "node-feat.csv.gz"), header=None
        ).values.astype(np.float32)
        labels_f = pd.read_csv(
            os.path.join(raw, "node-label.csv.gz"), header=None
        ).values.reshape(-1).astype(np.float64)
    labeled = ~np.isnan(labels_f)
    labels = np.where(labeled, labels_f, -1).astype(np.int64)
    n = feats.shape[0]
    split_dir = os.path.join(
        d, "split", _OGB_SPLIT_DIR.get(name.lower(), "time")
    )
    import pandas as pd

    masks = {}
    for split, fname in [
        ("train_mask", "train.csv.gz"),
        ("val_mask", "valid.csv.gz"),
        ("test_mask", "test.csv.gz"),
    ]:
        idx = pd.read_csv(os.path.join(split_dir, fname), header=None).values.reshape(-1)
        m = np.zeros(n, dtype=bool)
        m[idx] = True
        masks[split] = m
    n_classes = len(np.unique(labels[labeled]))
    ndata = {"features": feats, "labels": labels, **masks}
    return Graph(edges[:, 0], edges[:, 1], n, ndata=ndata), n_classes, False


def load_dataset(name: str, seed: int = 0) -> Tuple[Graph, int, bool]:
    """Dispatch mirroring load_graph.py:65-80, plus 'synth-*' stand-ins.

    'synth-<dataset>' generates a random graph with the same node/edge/feature
    dimensions as <dataset> (see DATASET_STATS) for benchmarking without the
    raw files.  'synth-small' is a fast CI-scale graph.
    """
    name = name.lower()
    if name == "toy":
        return toy_graph()
    if name.startswith("synth-"):
        base = name[len("synth-") :]
        if base == "small":
            return synthetic_graph(2000, 20000, 64, 7, seed=seed)
        if base == "papers100m-small":
            # scaled-down papers100M stand-in (same feat/class dims, ~0.5%
            # of the nodes) for exercising the UVA feature-cache path and
            # sparse-label (-1) handling without 160 GB of raw data
            g, c, ml = synthetic_graph(500_000, 8_000_000, 128, 172, seed=seed)
            labeled = np.random.default_rng(seed).random(g.n_nodes) < 0.014
            g.ndata["labels"] = np.where(labeled, g.ndata["labels"], -1)
            for m in ("train_mask", "val_mask", "test_mask"):
                g.ndata[m] &= labeled
            return g, c, ml
        if base.startswith("sbm-"):
            # community-structured family (degree-corrected SBM) at the
            # named dataset's dimensions — the second generator for
            # layout statistics (see sbm_graph docstring)
            sub = base[len("sbm-") :]
            if sub == "small":
                return sbm_graph(2000, 20000, 64, 7, seed=seed)
            if sub in DATASET_STATS:
                n, e, f, c, ml = DATASET_STATS[sub]
                return sbm_graph(n, e, f, c, multilabel=ml, seed=seed)
            raise ValueError(f"unknown sbm synthetic dataset '{name}'")
        hard = base.endswith("-hard")
        if hard:
            base = base[: -len("-hard")]
        if base in DATASET_STATS:
            n, e, f, c, ml = DATASET_STATS[base]
            if hard:
                # convergence-bench variant: homophilous structure, weak
                # bulk features, and a beacon minority carrying the signal
                # at high amplitude — val F1 then depends on sampling
                # quality (see synthetic_graph docstring; A/B-calibrated
                # against a broken EXP3 update in
                # scripts/calibrate_ttvf1.py)
                return synthetic_graph(n, e, f, c, multilabel=ml, seed=seed,
                                       homophily=0.6, feature_noise=10.0,
                                       beacon_frac=0.25, beacon_scale=8.0)
            return synthetic_graph(n, e, f, c, multilabel=ml, seed=seed)
        raise ValueError(f"unknown synthetic dataset '{name}'")
    if name in ("cora", "citeseer", "pubmed"):
        _maybe_download(name, lambda: _planetoid_dir(name))
        return _load_planetoid(name)
    if name in ("reddit", "yelp", "flickr"):
        _maybe_download(
            name,
            lambda: _saint_or_reddit_present(name) or _raise_missing(name),
        )
        if name == "reddit" and not os.path.exists(
            os.path.join(DATA_ROOT, name, "adj_full.npz")
        ) and os.path.exists(
            os.path.join(DATA_ROOT, name, "reddit_data.npz")
        ):
            return _load_reddit_dgl(os.path.join(DATA_ROOT, name))
        return _load_saint_npz(name)
    if name.startswith("ogbn-"):
        if name in _OGB_ZIPS:  # only names with a known download source
            _maybe_download(
                name,
                lambda: os.path.exists(
                    os.path.join(DATA_ROOT, _OGB_ZIPS[name][2], "raw")
                ) or _raise_missing(name),
            )
        return _load_ogb(name)
    raise ValueError(f"unknown dataset '{name}'")


def _saint_or_reddit_present(name: str) -> bool:
    d = os.path.join(DATA_ROOT, name)
    return os.path.exists(os.path.join(d, "adj_full.npz")) or (
        name == "reddit"
        and os.path.exists(os.path.join(d, "reddit_data.npz"))
    )


def _raise_missing(name: str):
    raise FileNotFoundError(name)


def _maybe_download(name: str, present) -> None:
    """Fetch raw files on first use when downloads are enabled (guarded —
    the reference auto-downloads unconditionally via dgl.data/ogb,
    load_graph.py:11-22,32; this environment has no egress, so the
    default is off; enable with BLISS_ALLOW_DOWNLOAD=1 / --download)."""
    if not download_allowed():
        return
    try:
        present()
        return  # already on disk
    except FileNotFoundError:
        pass
    download_dataset(name)
