"""Headline benchmark: SpMM aggregation edges/s/chip at Reddit scale.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

- graph: synthetic stand-in with Reddit's dimensions (233k nodes, ~115M
  directed edges incl. self-loops, power-law in-degrees, 602-d features) —
  the real Reddit raw files are not present in this environment, and the
  SpMM cost depends only on the shape statistics;
- value: edges/s of the banded Pallas SpMM kernel (ops/spmm_pallas.py),
  the aggregation that dominates full-graph inference and large-fanout
  training (BASELINE.md north star: "edges/s/chip (SpMM agg) on Reddit");
- vs_baseline: speedup over the XLA segment-sum SpMM (ops/fullgraph.py) —
  the path a straight port of the reference's gspmm call would take on TPU.

The synthetic graph is cached in .bench_cache/ after first generation.
Timing protocol: everything under one jit; device sync via a scalar fetch
(block_until_ready is unreliable over the axon tunnel); the ~33ms dispatch
round-trip is subtracted.
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

N_NODES = 232_965
N_EDGES = 114_615_892 + N_NODES  # directed edges + self-loops (Reddit prep)
N_FEATS = 602
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
DISPATCH_OVERHEAD_S = 0.033

# scale down via env for smoke runs
SCALE = float(os.environ.get("BLISS_BENCH_SCALE", "1.0"))
N_NODES = int(N_NODES * SCALE)
N_EDGES = int(N_EDGES * SCALE)


def build_graph():
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"reddit_synth_v2_{N_NODES}_{N_EDGES}.npz")
    if os.path.exists(path):
        d = np.load(path)
        return d["indptr"], d["src"]
    rng = np.random.default_rng(0)
    # power-law in-degree SEQUENCE with a Reddit-like cap (~21k): an
    # unbounded zipf draw concentrates half the edges on one node, which no
    # real graph does and which distorts both SpMM tiling and sampler
    # frontier statistics
    e_rand = N_EDGES - N_NODES
    ranks = np.arange(1, N_NODES + 1, dtype=np.float64)
    wgt = np.minimum(ranks ** -0.8, np.inf)
    deg = wgt / wgt.sum() * e_rand
    deg = np.minimum(deg, 21_000).astype(np.int64)
    deg[deg < 1] = 1
    # rescale to hit e_rand edges, assign hub degrees to random node ids
    while deg.sum() < e_rand:
        deficit = e_rand - deg.sum()
        bump = np.minimum(deg, np.maximum(deficit // len(deg), 1))
        deg = np.minimum(deg + bump, 21_000)
    deg = deg[: N_NODES]
    extra = deg.sum() - e_rand
    if extra > 0:  # trim from the tail
        for i in range(N_NODES - 1, -1, -1):
            cut = min(extra, deg[i] - 1)
            deg[i] -= cut
            extra -= cut
            if extra == 0:
                break
    node_of_rank = rng.permutation(N_NODES)
    dst = np.repeat(node_of_rank, deg)
    src = rng.integers(0, N_NODES, size=len(dst))
    loop = np.arange(N_NODES, dtype=np.int64)
    dst = np.concatenate([dst, loop])
    src = np.concatenate([src, loop])
    from bliss_gnn_tpu.graph import native

    indptr, csc_src, _ = native.build_csc(src, dst, N_NODES)
    np.savez(path, indptr=indptr, src=csc_src)
    return indptr, csc_src


def _cached_layout(indptr, csc_src, w, band=16384, wr=256, et=2048):
    """Banded layout, cached on disk (the build is O(E) host work that is
    identical across bench runs; edge_perm is dropped — the kernel never
    consumes it)."""
    from bliss_gnn_tpu.ops.spmm_pallas import (
        BandedLayout,
        BandedMeta,
        build_banded_layout,
    )

    path = os.path.join(
        CACHE, f"layout_v1_{len(indptr)-1}_{len(csc_src)}_{band}_{wr}_{et}.npz"
    )
    if os.path.exists(path):
        d = np.load(path)
        meta = BandedMeta(**{k: int(d[f"meta_{k}"]) for k in (
            "n_nodes", "n_edges", "band", "wr", "et", "n_bands", "n_wins",
            "n_tiles", "nt_per_band")})
        return BandedLayout(
            meta=meta, tile_win=d["tile_win"], tile_first=d["tile_first"],
            src_rel=d["src_rel"], dst_rel=d["dst_rel"], edge_w=d["edge_w"],
            edge_perm=np.zeros((0,), np.int64),
        )
    layout = build_banded_layout(indptr, csc_src, w, band=band, wr=wr, et=et)
    m = layout.meta
    np.savez(
        path, tile_win=layout.tile_win, tile_first=layout.tile_first,
        src_rel=layout.src_rel, dst_rel=layout.dst_rel,
        edge_w=layout.edge_w,
        **{f"meta_{k}": getattr(m, k) for k in (
            "n_nodes", "n_edges", "band", "wr", "et", "n_bands", "n_wins",
            "n_tiles", "nt_per_band")},
    )
    return layout


def _log(msg):
    if os.environ.get("BLISS_BENCH_VERBOSE"):
        print(f"[bench +{time.time()-_T0:.0f}s] {msg}", flush=True)


_T0 = time.time()


def main():
    from bliss_gnn_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()
    indptr, csc_src = build_graph()
    _log("graph ready")
    n_edges = len(csc_src)
    from bliss_gnn_tpu.ops.fullgraph import full_spmm_sum

    w = np.random.default_rng(1).random(n_edges).astype(np.float32)
    # hybrid layout: degree-sorted dense blocks + gather remainder
    # (measured 1.27x the pure gather kernel at this scale,
    # scripts/probe_hybrid.py); host build is cached on disk
    from bliss_gnn_tpu.ops.spmm_pallas import (
        DeviceHybridLayout,
        build_hybrid_layout,
        hybrid_spmm,
        load_hybrid_layout,
        save_hybrid_layout,
    )

    hpath = os.path.join(CACHE, f"hybrid_v1_{N_NODES}_{n_edges}_300.npz")
    if os.path.exists(hpath):
        hl = load_hybrid_layout(hpath)
    else:
        hl = build_hybrid_layout(indptr, csc_src, w, dense_t=300)
        save_hybrid_layout(hpath, hl)
    m = hl.meta
    _log(f"hybrid layout: {m.dense_edges/n_edges:.0%} edges dense, "
         f"{m.nt_dense} dense + {hl.gather.meta.nt_per_band} gather "
         f"tiles/band")
    dl = DeviceHybridLayout.from_host(hl)
    jax.block_until_ready(dl.d_w)
    _log("layout on device")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(N_NODES, N_FEATS)).astype(np.float32)
    xp = x[hl.perm]  # degree-sorted node space (host-side, one-time)
    f_pad = ((N_FEATS + 127) // 128) * 128
    xb = jnp.asarray(np.pad(
        xp, ((0, m.n_bands * m.band - N_NODES), (0, f_pad - N_FEATS))
    ))
    acc0 = jnp.zeros((m.n_wins * m.wr, f_pad), jnp.float32)
    _log("features banded")

    # scalar-perturbed input per repeat: the axon tunnel memoizes repeat
    # dispatches with identical inputs (CLAUDE.md), so each timed call must
    # be distinct; 1e-6 > f32 eps so the streamed VALUES genuinely differ
    # per repeat (1e-9 would round 1+s*eps to exactly 1.0 and leave only
    # the dispatch key distinct).  The extra elementwise pass over xb is
    # ~1 ms at stream rate vs the ~600 ms kernel
    pallas_fn = jax.jit(
        lambda xb, acc, dl, s: hybrid_spmm(xb * (1 + s * 1e-6), dl, acc)[0, 0]
    )
    float(pallas_fn(xb, acc0, dl, jnp.float32(0)))  # compile + warmup
    _log("pallas compiled + warm")
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(pallas_fn(xb, acc0, dl, jnp.float32(1 + r)))
        ts.append(time.perf_counter() - t0 - DISPATCH_OVERHEAD_S)
    t_pallas = min(ts)
    edges_per_s = n_edges / t_pallas

    # baseline: the XLA chunked segment-sum path (what a naive port of the
    # reference's gspmm does).  Measured on a ~16M-edge dst-prefix of the
    # same graph — its edges/s rate is scale-invariant (verified at 10%/
    # 100% scale) and the full-graph XLA program takes >10min to compile
    # through the remote-compile tunnel.
    sub_edges = min(n_edges, 16_000_000)
    nk = int(np.searchsorted(indptr, sub_edges))
    sub_edges = int(indptr[nk])
    dg_indptr = jnp.asarray(indptr[: nk + 1], jnp.int32)
    dg_src = jnp.asarray(csc_src[:sub_edges], jnp.int32)
    x_base = jnp.asarray(x, jnp.bfloat16)
    wd = jnp.asarray(w[:sub_edges])
    xla_fn = jax.jit(
        lambda x, ip, sr, wv, s: full_spmm_sum(
            x * (1 + s * 1e-6), ip, sr, nk, sub_edges, edge_vals=wv,
            chunk=1 << 18,
        )[0, 0],
        static_argnames=(),
    )
    _log("xla baseline compiling")
    float(xla_fn(x_base, dg_indptr, dg_src, wd, jnp.float32(0)))
    _log("xla baseline warm")
    t0 = time.perf_counter()
    float(xla_fn(x_base, dg_indptr, dg_src, wd, jnp.float32(1)))
    t_xla = time.perf_counter() - t0 - DISPATCH_OVERHEAD_S
    xla_edges_per_s = sub_edges / t_xla

    print(json.dumps({
        "metric": "spmm_agg_edges_per_s_reddit",
        "value": round(edges_per_s / 1e6, 1),
        "unit": "M edges/s/chip",
        "vs_baseline": round(edges_per_s / xla_edges_per_s, 2),
    }))


if __name__ == "__main__":
    main()
