"""Graph container + canonicalization + normalized_edata tests."""
import numpy as np

from bliss_gnn_tpu.graph.datasets import toy_graph
from bliss_gnn_tpu.graph.structure import Graph, normalized_edata


def test_toy_graph_structure():
    g, n_classes, multilabel = toy_graph()
    assert g.n_nodes == 5 and g.n_edges == 4
    assert n_classes == 2 and not multilabel
    src, dst = g.edges()
    # edges ([2,3,3,4] -> [0,0,1,1]) in canonical (dst-grouped) order
    assert sorted(zip(src.tolist(), dst.tolist())) == [
        (2, 0), (3, 0), (3, 1), (4, 1),
    ]
    np.testing.assert_array_equal(g.in_degrees(), [2, 2, 0, 0, 0])
    np.testing.assert_array_equal(g.out_degrees(), [0, 0, 1, 2, 1])


def test_csr_csc_consistency():
    rng = np.random.default_rng(0)
    n, e = 50, 400
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = Graph(src, dst, n)
    # every canonical eid appears exactly once in the CSR eid map
    assert sorted(g.csr_eid.tolist()) == list(range(e))
    # CSR row r contains exactly the edges with src == r
    s2, d2 = g.edges()
    for r in [0, 7, n - 1]:
        lo, hi = g.csr_indptr[r], g.csr_indptr[r + 1]
        eids = g.csr_eid[lo:hi]
        assert np.all(s2[eids] == r)
        np.testing.assert_array_equal(np.sort(g.csr_dst[lo:hi]), np.sort(d2[eids]))


def test_canonicalize_self_loops():
    g, _, _ = toy_graph()
    g2 = Graph.canonicalize(g)
    assert g2.n_edges == 4 + 5  # no pre-existing self-loops, add 5
    src, dst = g2.edges()
    loops = (src == dst).sum()
    assert loops == 5
    # edge weights padded with zeros for the new loops
    assert g2.edata["weight"].shape == (9,)
    assert g2.edata["weight"].sum() == g.edata["weight"].sum()


def test_to_undirected_doubles_edges():
    g, _, _ = toy_graph()
    g2 = g.to_undirected()
    assert g2.n_edges == 8
    np.testing.assert_array_equal(g2.in_degrees(), g2.out_degrees()[[0, 1, 2, 3, 4]] * 0 + g2.in_degrees())
    s, d = g2.edges()
    pairs = set(zip(s.tolist(), d.tolist()))
    assert (0, 2) in pairs and (2, 0) in pairs


def test_normalized_edata_matches_reference_semantics():
    """bandit_sampler.py:20-27 with W=1: w_e = 1/in_deg(dst)."""
    g, _, _ = toy_graph()
    g = Graph.canonicalize(g)
    w = normalized_edata(g)
    _, dst = g.edges()
    indeg = g.in_degrees()
    np.testing.assert_allclose(w, 1.0 / indeg[dst], rtol=1e-6)
    # weighted variant: w_e = W_e / sum_in(W)
    w2 = normalized_edata(g, weight="weight")
    W = g.edata["weight"]
    sums = np.zeros(g.n_nodes)
    np.add.at(sums, dst, W)
    expected = np.where(sums[dst] > 0, W / np.where(sums[dst] > 0, sums[dst], 1), 0)
    np.testing.assert_allclose(w2, expected, rtol=1e-6)
    # ladies variant (multiply_weight=False): 1 / sum_in(W)
    w3 = normalized_edata(g, weight="weight", multiply_weight=False)
    expected3 = np.where(sums[dst] > 0, 1.0 / np.where(sums[dst] > 0, sums[dst], 1), 0)
    np.testing.assert_allclose(w3, expected3, rtol=1e-6)


def test_edata_reindexed_to_canonical_order():
    # input edge order differs from canonical (dst-grouped) order
    src = np.array([4, 2, 3, 3])
    dst = np.array([1, 0, 1, 0])
    ed = {"x": np.array([10.0, 20.0, 30.0, 40.0])}
    g = Graph(src, dst, 5, edata=ed)
    s, d = g.edges()
    for i in range(4):
        orig = {(4, 1): 10.0, (2, 0): 20.0, (3, 1): 30.0, (3, 0): 40.0}
        assert g.edata["x"][i] == orig[(s[i], d[i])]


def test_sbm_family_planted_communities():
    """synth-sbm-*: degree-corrected SBM stand-ins (the SECOND layout
    generator — kernel-routing statistics must not be fit to one
    generator).  Planted communities => homophilous edges; shuffled ids
    => community structure is latent in the id space."""
    import numpy as np
    from bliss_gnn_tpu.graph.datasets import load_dataset

    g, c, ml = load_dataset("synth-sbm-small")
    assert g.n_nodes == 2000 and g.n_edges == 20000 and c == 7 and not ml
    dst = np.repeat(np.arange(g.n_nodes), np.diff(g.csc_indptr))
    src = np.asarray(g.csc_src)
    lab = np.asarray(g.ndata["labels"])
    same = (lab[src] == lab[dst]).mean()
    assert same > 3.0 / c, f"not homophilous: {same}"
    # masks partition the nodes
    m = (g.ndata["train_mask"].astype(int) + g.ndata["val_mask"]
         + g.ndata["test_mask"])
    assert (m == 1).all()
    # determinism
    g2, _, _ = load_dataset("synth-sbm-small")
    np.testing.assert_array_equal(np.asarray(g.csc_src),
                                  np.asarray(g2.csc_src))
