"""Static-shape subgraph algebra vs numpy references."""
import numpy as np
import jax
import jax.numpy as jnp

from bliss_gnn_tpu.graph.structure import Graph
from bliss_gnn_tpu.sampling.frontier import (
    SENTINEL,
    compact_by_mask,
    compact_candidates,
    gather_in_edges,
)


def _rand_graph(rng, n=40, e=300):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    return Graph(src, dst, n)


def test_gather_in_edges_matches_numpy(rng):
    g = _rand_graph(rng)
    dg = g.to_device()
    seeds_np = rng.choice(g.n_nodes, size=8, replace=False)
    seeds = jnp.array(np.concatenate([seeds_np, [0, 0]]), dtype=jnp.int32)
    smask = jnp.array([True] * 8 + [False] * 2)
    fr = gather_in_edges(dg.csc_indptr, dg.csc_src, seeds, smask, 256)
    # reference: all in-edges of the valid seeds, via CSC slicing
    exp_eids, exp_src, exp_owner = [], [], []
    for i, s in enumerate(seeds_np):
        lo, hi = g.csc_indptr[s], g.csc_indptr[s + 1]
        for eid in range(lo, hi):
            exp_eids.append(eid)
            exp_src.append(g.csc_src[eid])
            exp_owner.append(i)
    n_e = int(jnp.sum(fr.e_mask))
    assert n_e == len(exp_eids) == int(fr.total_edges)
    got = set(zip(
        np.asarray(fr.eid)[np.asarray(fr.e_mask)].tolist(),
        np.asarray(fr.src_gid)[np.asarray(fr.e_mask)].tolist(),
        np.asarray(fr.dst_spos)[np.asarray(fr.e_mask)].tolist(),
    ))
    assert got == set(zip(exp_eids, [int(x) for x in exp_src], exp_owner))


def test_gather_in_edges_truncation_reported(rng):
    g = _rand_graph(rng)
    dg = g.to_device()
    seeds = jnp.arange(20, dtype=jnp.int32)
    smask = jnp.ones(20, bool)
    total = int(g.in_degrees()[:20].sum())
    cap = max(8, total // 2)
    fr = gather_in_edges(dg.csc_indptr, dg.csc_src, seeds, smask, cap)
    assert int(fr.total_edges) == total
    kept = int(jnp.sum(fr.e_mask))
    assert 0 < kept < total  # truncated, chunk-granular


def test_gather_in_edges_zero_degree_seeds(rng):
    g = Graph(np.array([1, 2]), np.array([0, 0]), 4)
    dg = g.to_device()
    seeds = jnp.array([3, 0, 2], dtype=jnp.int32)  # 3 and 2 have no in-edges
    smask = jnp.ones(3, bool)
    fr = gather_in_edges(dg.csc_indptr, dg.csc_src, seeds, smask, 8)
    assert int(fr.total_edges) == 2
    m = np.asarray(fr.e_mask)
    np.testing.assert_array_equal(np.asarray(fr.dst_spos)[m], [1, 1])
    assert set(np.asarray(fr.src_gid)[m].tolist()) == {1, 2}


def test_compact_candidates(rng):
    g = _rand_graph(rng)
    dg = g.to_device()
    seeds_np = rng.choice(g.n_nodes, size=6, replace=False)
    seeds = jnp.array(seeds_np, dtype=jnp.int32)
    smask = jnp.ones(6, bool)
    fr = gather_in_edges(dg.csc_indptr, dg.csc_src, seeds, smask, 256)
    cand = compact_candidates(seeds, smask, fr, 128, g.n_nodes)
    m = np.asarray(fr.e_mask)
    expected = np.unique(
        np.concatenate([seeds_np, np.asarray(fr.src_gid)[m]])
    )
    got = np.asarray(cand.gids)[np.asarray(cand.mask)]
    np.testing.assert_array_equal(np.sort(got), expected)
    assert int(cand.n) == len(expected)
    # relabel round-trips
    gids = np.asarray(cand.gids)
    np.testing.assert_array_equal(
        gids[np.asarray(cand.seed_cpos)], seeds_np
    )
    np.testing.assert_array_equal(
        gids[np.asarray(cand.src_cpos)[m]], np.asarray(fr.src_gid)[m]
    )
    # is_seed marks exactly the seeds
    np.testing.assert_array_equal(
        np.sort(gids[np.asarray(cand.is_seed)]), np.sort(seeds_np)
    )


def test_compact_by_mask(rng):
    mask = jnp.array(rng.random(50) < 0.3)
    idx, omask, n = compact_by_mask(mask, 20)
    true_idx = np.where(np.asarray(mask))[0]
    k = min(len(true_idx), 20)
    assert int(n) == len(true_idx)
    np.testing.assert_array_equal(
        np.asarray(idx)[np.asarray(omask)], true_idx[:k]
    )


def test_compact_by_mask_jit(rng):
    f = jax.jit(lambda m: compact_by_mask(m, 8))
    mask = jnp.array([True, False, True, True] + [False] * 12)
    idx, omask, n = f(mask)
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(idx)[:3], [0, 2, 3])


def test_frontier_gather_grid_path_matches_flat(rng):
    """The pre-shaped [R, 128] grid copy (upload-time, '__grid__*') must
    return identical values to the on-the-fly reshape, on a frontier whose
    ck is exactly 128 (the production plans' value)."""
    import jax.numpy as jnp

    from bliss_gnn_tpu.sampling.frontier import (
        EDGE_PAD,
        edge_grid,
        frontier_gather,
        gather_in_edges,
    )

    n, e = 300, 60_000  # dense enough that e_cap/(2*n_seeds) >= 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = Graph(src, dst, n)
    csc_src = jnp.asarray(
        np.concatenate([g.csc_src, np.zeros(EDGE_PAD, g.csc_src.dtype)]),
        jnp.int32)
    seeds = jnp.asarray(rng.choice(n, 64, replace=False), jnp.int32)
    smask = jnp.ones(64, bool)
    fr = gather_in_edges(jnp.asarray(g.csc_indptr, jnp.int32), csc_src,
                         seeds, smask, 1 << 15)
    assert fr.ck == 128  # the grid fast path must actually engage
    data = rng.normal(size=e + EDGE_PAD).astype(np.float32)
    grid = jnp.asarray(edge_grid(data))
    flat = jnp.asarray(data)
    np.testing.assert_array_equal(
        np.asarray(frontier_gather(fr, flat)),
        np.asarray(frontier_gather(fr, flat, grid=grid)))
    # and gather_in_edges with the csc_src grid reproduces src_gid
    fr2 = gather_in_edges(jnp.asarray(g.csc_indptr, jnp.int32), csc_src,
                          seeds, smask, 1 << 15,
                          csc_src_grid=jnp.asarray(edge_grid(
                              np.asarray(csc_src))))
    np.testing.assert_array_equal(np.asarray(fr.src_gid),
                                  np.asarray(fr2.src_gid))
