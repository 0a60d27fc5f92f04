"""Stage attribution of the fused sampler at the Reddit config.

Times cumulative prefixes of one layer-0 sampling pass (the 3M-edge
frontier) plus the full 3-layer pass, on the real TPU.

PYTHONPATH=.:/root/.axon_site python scripts/probe_sample_stages.py
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()

SCALE = float(os.environ.get("BLISS_PROF_SCALE", "1.0"))
N_NODES = int(232_965 * SCALE)

import bench  # noqa: E402

bench.N_NODES = N_NODES
bench.N_EDGES = int((114_615_892 + 232_965) * SCALE)
indptr, csc_src = bench.build_graph()
n_edges = len(csc_src)

from bliss_gnn_tpu.graph.structure import DeviceGraph  # noqa: E402
from bliss_gnn_tpu.sampling.frontier import (  # noqa: E402
    EDGE_PAD,
    compact_by_mask,
    dense_candidates,
    gather_in_edges,
)
from bliss_gnn_tpu.sampling.block import CapacityPlan  # noqa: E402
from bliss_gnn_tpu.sampling import samplers as S  # noqa: E402

deg = np.diff(indptr)
w = (1.0 / np.maximum(deg, 1.0)).repeat(deg).astype(np.float32)


def pad_e(a):
    return np.concatenate([a, np.zeros(EDGE_PAD, a.dtype)])


dummy = jnp.zeros(1, jnp.int32)
key = jax.random.PRNGKey(0)
graph = DeviceGraph(
    n_nodes=N_NODES, n_edges=n_edges,
    csc_indptr=jnp.asarray(indptr, jnp.int32),
    csc_src=jnp.asarray(pad_e(csc_src.astype(np.int32))),
    csr_indptr=dummy, csr_dst=dummy, csr_eid=dummy,
    ndata=dict(
        features=jax.random.normal(key, (N_NODES, 602), jnp.bfloat16),
        labels=jax.random.randint(key, (N_NODES,), 0, 41),
    ),
    edata=dict(w=jnp.asarray(pad_e(w), jnp.bfloat16)),
)
jax.block_until_ready(graph.csc_src)

cfg = S.SamplerConfig(kind="poisson-bandit", fanouts=(4096, 2048, 1024))
plan = CapacityPlan.build(256, cfg.fanouts, N_NODES, n_edges,
                          kind=cfg.kind, deg_std=float(deg.std()),
                          max_degree=int(deg.max()))
exp3 = S.init_exp3_weights(3, n_edges)

# layer-0 seeds: run the two outer layers once to get realistic seeds
blocks, _ = jax.jit(
    lambda k, s, m, g, e: S.sample_blocks(g, cfg, plan, k, s, m, e)
)(jax.random.PRNGKey(1),
  jnp.asarray(np.random.default_rng(0).integers(0, N_NODES, 256), jnp.int32),
  jnp.ones(256, bool), graph, exp3)
seeds0 = blocks[1].src_gids
smask0 = blocks[1].src_mask
jax.block_until_ready(seeds0)
if os.environ.get("BLISS_REFIT"):
    _, sstats = jax.jit(
        lambda k, s, m, g, e: S.sample_blocks(g, cfg, plan, k, s, m, e)
    )(jax.random.PRNGKey(2),
      jnp.asarray(np.random.default_rng(0).integers(0, N_NODES, 256),
                  jnp.int32),
      jnp.ones(256, bool), graph, exp3)
    fr = [int(sstats[f"layer{l}/frontier_edges"]) for l in range(3)]
    be = [int(sstats[f"layer{l}/n_block_edges_true"]) for l in range(3)]
    plan = plan.refit(fr, be, max_degree=int(deg.max()))
    print(f"refit plan: frontier={plan.frontier_caps} "
          f"block_e={plan.block_e_caps}", flush=True)
layer = 0
num = cfg.fanouts[layer]
n_seed_cap = plan.dst_caps[layer]
e_cap = plan.frontier_caps[layer]
c_cap = plan.cand_caps[layer]
print(f"layer0: seeds={seeds0.shape[0]} e_cap={e_cap} c_cap={c_cap} "
      f"extra={plan.extra_caps[layer]} e_blk={plan.block_e_caps[layer]}",
      flush=True)


def timeit(fn, *args, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        # fetch one scalar to force completion through the tunnel
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        ts.append(time.perf_counter() - t0 - 0.033)
    return min(ts)


def st_frontier(g, s, m):
    fr = gather_in_edges(g.csc_indptr, g.csc_src, s, m, e_cap)
    return fr.eid


def st_cand(g, s, m):
    fr = gather_in_edges(g.csc_indptr, g.csc_src, s, m, e_cap)
    cand = dense_candidates(s, m, fr, c_cap, g.n_nodes)
    return cand.is_seed


def st_edgeprob(g, s, m, e):
    fr = gather_in_edges(g.csc_indptr, g.csc_src, s, m, e_cap)
    q = S._exp3_edge_prob(g, S.exp3_row(e, layer, 3), cfg.eta, fr, s, n_seed_cap)
    return q


def st_nodeprob(g, s, m, e):
    fr = gather_in_edges(g.csc_indptr, g.csc_src, s, m, e_cap)
    cand = dense_candidates(s, m, fr, c_cap, g.n_nodes)
    q = S._exp3_edge_prob(g, S.exp3_row(e, layer, 3), cfg.eta, fr, s, n_seed_cap)
    prob = S._importance_node_prob(q, fr, cand, n_seed_cap, True)
    return prob


def st_select(g, s, m, e, k):
    fr = gather_in_edges(g.csc_indptr, g.csc_src, s, m, e_cap)
    cand = dense_candidates(s, m, fr, c_cap, g.n_nodes)
    q = S._exp3_edge_prob(g, S.exp3_row(e, layer, 3), cfg.eta, fr, s, n_seed_cap)
    prob = S._importance_node_prob(q, fr, cand, n_seed_cap, True)
    mask = (prob > 0) | cand.is_seed
    cand = cand._replace(mask=mask, n=jnp.sum(mask.astype(jnp.int32)))
    prob = jnp.where(mask, prob, 0.0)
    p = S._poisson_scale(prob, cand, num, cfg.poisson_eps, cfg.poisson_iters)
    sel = S._bernoulli_select(k, p, cand.mask)
    return sel


def st_layer(g, s, m, e, k):
    blk, _ = S._sample_layer_ladies(g, cfg, plan, layer, e, k, s, m)
    return blk.e_weight


def st_all(g, s, m, e, k):
    bs, _ = S.sample_blocks(g, cfg, plan, k, s, m, e)
    return bs[0].e_weight


k0 = jax.random.PRNGKey(7)
stages = [
    ("frontier (in_subgraph)", lambda: timeit(st_frontier, graph, seeds0, smask0)),
    ("+ dense candidates", lambda: timeit(st_cand, graph, seeds0, smask0)),
    ("+ exp3 edge prob", lambda: timeit(st_edgeprob, graph, seeds0, smask0, exp3)),
    ("+ importance node prob", lambda: timeit(st_nodeprob, graph, seeds0, smask0, exp3)),
    ("+ poisson + bernoulli", lambda: timeit(st_select, graph, seeds0, smask0, exp3, k0)),
    ("+ build_block (layer0)", lambda: timeit(st_layer, graph, seeds0, smask0, exp3, k0)),
    ("all 3 layers", lambda: timeit(st_all, graph,
                                    jnp.asarray(np.random.default_rng(0)
                                                .integers(0, N_NODES, 256),
                                                jnp.int32),
                                    jnp.ones(256, bool), exp3, k0)),
]
for name, f in stages:
    t = f()
    print(f"{name:26s}: {t*1e3:7.1f} ms", flush=True)
