"""Coverage-vs-reorder statistics for the hybrid SpMM (VERDICT r4 #1).

Question: can a locality/community node reorder lift the dense-tier
coverage of the hybrid SpMM past the degree sort's, and by how much —
on (a) the production degree-matched Reddit synth (bench.build_graph:
power-law dst, UNIFORM src) and (b) the community-structured SBM family
(datasets.sbm_graph, planted Zipf-sized communities, latent ids)?

Host-only by default: coverage + the committed cycle budget
(spmm_pallas.py: dense ~2.35 cy/edge, gather ~6.9) predict the blended
rate without touching the TPU.  BLISS_PROBE_TPU=1 additionally builds
the winning and baseline layouts and times hybrid_spmm on the real chip
(honest chained-distinct-input protocol, like probe_hybrid.py).

Usage: PYTHONPATH=.:/root/.axon_site python scripts/probe_reorder.py
Env: BLISS_PROBE_SCALE (default 1.0), BLISS_PROBE_TPU (default 0),
     BLISS_HYBRID_T (dense_t, default 300).

MEASURED (2026-08-21, this machine, full scale=1.0, dense_t=300):

  degree-matched Reddit synth (233k nodes / 114.8M edges,
  bench.build_graph — power-law dst, UNIFORM src):
    degree       cov=0.400  pred=5.08 cy/edge  dense_blocks=51909
    cluster      cov=0.400  pred=5.08          dense_blocks=51909
    hub-cluster  cov=0.400  pred=5.08          dense_blocks=51909
  -> measured REJECTION for this family, and exactly as the marginals
     predict: with uniform src endpoints every 256-node src group has
     identical expected counts, so NO permutation can concentrate the
     src axis — coverage is purely the dst-window effect the degree
     sort already maximizes.  LPA collapses to ONE community (uniform
     wiring has no modular structure), so the cluster orders literally
     reduce to the degree sort (identical dense-block sets).  This is
     why four rounds of degree-sort tuning were flat at 0.505 SoL: on
     THIS graph the reorder lever does not exist.

  SBM Reddit synth (233k nodes / 114.8M edges, 50 planted communities,
  intra=0.8, capped Zipf degrees — datasets.sbm_graph, ids shuffled):
    degree       cov=0.858  pred=3.00 cy/edge  dense_blocks=38851
    cluster      cov=0.899  pred=2.81          dense_blocks=24054
    hub-cluster  cov=0.907  pred=2.77          dense_blocks=24200
  -> LPA recovers all 50 latent communities; the community orders lift
     dense coverage 0.858 -> 0.907 AND shrink the dense-block count
     38851 -> 24200 (fewer partial tiles, less accumulator traffic).
     Coverage is already high under the degree sort because the SBM's
     src propensity is itself Zipf-heavy (unlike the uniform-src bench
     graph).

  TPU timing (v5e, F=602, single-dispatch scalar-perturbed protocol,
  grouped dense sweep — the per-band tiling could not even COMPILE
  these layouts, 3 MB of tile metadata vs the 1 MB SMEM budget):
    sbm/degree       151.2 M edges/s  (759.6 ms/pass)
    sbm/hub-cluster  182.8 M edges/s  (628.3 ms/pass)  = 1.21x
  The measured 1.21x beats the coverage model's 1.08x because fewer,
  fuller dense blocks also cut partial-tile waste and per-window
  accumulator traffic — terms the blended-rate model ignores.  At
  0.537 of stream-SoL the community graph under the community order
  runs FASTER than the degree-matched synth's 0.507 headline.

Conclusion: the reorder lever is real but graph-dependent — a no-op
without community structure (proved by invariance above), measured
1.21x with it.  build_hybrid_layout takes node_perm="auto" which
measures coverage host-side (cheap, exact) and keeps the degree sort
when clustering buys nothing.  Bench keys: spmm_sbm_edges_per_s_M /
spmm_sbm_coverage / spmm_sbm_sol_frac.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bliss_gnn_tpu.graph.reorder import (  # noqa: E402
    dense_coverage,
    locality_perm,
    propagate_labels,
)

SCALE = float(os.environ.get("BLISS_PROBE_SCALE", "1.0"))
DENSE_T = int(os.environ.get("BLISS_HYBRID_T", "300"))
RUN_TPU = os.environ.get("BLISS_PROBE_TPU", "0") == "1"
T0 = time.time()


def log(m):
    print(f"[reorder +{time.time()-T0:.0f}s] {m}", flush=True)


def eval_graph(tag, indptr, csc_src):
    log(f"{tag}: {len(indptr)-1} nodes, {len(csc_src)} edges")
    t = time.time()
    labels = propagate_labels(indptr, csc_src, n_iters=4)
    n_comm = len(np.unique(labels))
    log(f"{tag}: LPA {time.time()-t:.0f}s, {n_comm} communities")
    results = {}
    for order in ("degree", "cluster", "hub-cluster"):
        p = locality_perm(indptr, csc_src, order=order, labels=labels)
        cov, st = dense_coverage(indptr, csc_src, p, dense_t=DENSE_T)
        results[order] = (cov, st["pred_cy_per_edge"], p)
        log(f"{tag}: {order:12s} cov={cov:.3f} "
            f"pred={st['pred_cy_per_edge']:.2f} cy/edge "
            f"dense_blocks={st['n_dense_blocks']}")
    return results


def tpu_time(tag, indptr, csc_src, perm, order):
    """Honest chained timing of hybrid_spmm under the given perm."""
    import jax
    import jax.numpy as jnp

    from bliss_gnn_tpu.ops.spmm_pallas import (
        DeviceHybridLayout,
        build_hybrid_layout,
        hybrid_spmm,
        load_hybrid_layout,
        save_hybrid_layout,
    )
    from bliss_gnn_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()
    import bench

    n = len(indptr) - 1
    f = 602
    w = np.random.default_rng(1).random(len(csc_src)).astype(np.float32)
    t = time.time()
    cache = os.path.join(
        bench.CACHE, f"reorder2_{tag}_{order}_{n}_{len(csc_src)}.npz"
    )
    if os.path.exists(cache):
        hl = load_hybrid_layout(cache)
    else:
        hl = build_hybrid_layout(indptr, csc_src, w, dense_t=DENSE_T,
                                 node_perm=perm)
        save_hybrid_layout(cache, hl)
    log(f"{tag}/{order}: layout {time.time()-t:.0f}s, "
        f"{hl.meta.dense_edges/hl.meta.n_edges:.1%} dense")
    dl = DeviceHybridLayout.from_host(hl)
    m = hl.meta
    rng = np.random.default_rng(2)
    f_pad = ((f + 127) // 128) * 128
    x = rng.normal(size=(n, f)).astype(np.float32)
    # pre-permute/pad on host (one-time, same as bench)
    xb = jnp.asarray(np.pad(
        x[hl.perm],
        ((0, m.n_bands * m.band - n), (0, f_pad - f)),
    ))
    acc0 = jnp.zeros((m.n_wins * m.wr, f_pad), jnp.float32)
    # single-dispatch, scalar-perturbed inputs (the bench protocol —
    # distinct inputs defeat the tunnel's memoization; a K-chained jit of
    # this program overflows SMEM with 8x the scalar-prefetch operands)
    fn = jax.jit(
        lambda xb, acc, dl, s: hybrid_spmm(xb * (1 + s * 1e-6), dl, acc)[0, 0]
    )
    float(fn(xb, acc0, dl, jnp.float32(0)))  # compile+warm
    ts = []
    for r in range(3):
        t0 = time.time()
        float(fn(xb, acc0, dl, jnp.float32(1 + r)))
        ts.append(time.time() - t0 - 0.033)
    rate = len(csc_src) / min(ts) / 1e6
    log(f"{tag}/{order}: {rate:.1f} M edges/s ({min(ts)*1e3:.1f} ms/pass)")
    return rate


def main():
    import bench

    bench.N_NODES = int(232_965 * SCALE)
    bench.N_EDGES = int((114_615_892 + 232_965) * SCALE)
    indptr, csc_src = bench.build_graph()
    res_deg = eval_graph("degree-synth", indptr, csc_src)

    from bliss_gnn_tpu.graph.datasets import sbm_graph

    cache = os.path.join(bench.CACHE,
                         f"sbm_reddit_v1_{bench.N_NODES}_{bench.N_EDGES}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        s_indptr, s_src = d["indptr"], d["src"]
    else:
        t = time.time()
        g, _, _ = sbm_graph(bench.N_NODES, bench.N_EDGES, 8, 41, seed=0)
        log(f"sbm gen {time.time()-t:.0f}s")
        s_indptr, s_src = np.asarray(g.csc_indptr), np.asarray(g.csc_src)
        np.savez(cache, indptr=s_indptr, src=s_src)
    res_sbm = eval_graph("sbm-synth", s_indptr, s_src)

    if RUN_TPU:
        best = max(res_sbm, key=lambda k: res_sbm[k][0])
        tpu_time("sbm", s_indptr, s_src, res_sbm["degree"][2], "degree")
        tpu_time("sbm", s_indptr, s_src, res_sbm[best][2], best)


if __name__ == "__main__":
    main()
