"""Hybrid dense-block SpMM vs the base gather kernel at full Reddit scale.

PYTHONPATH=.:/root/.axon_site python scripts/probe_hybrid.py
Env: BLISS_HYBRID_T (dense_t, default 300), BLISS_PROBE_SCALE.
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()

SCALE = float(os.environ.get("BLISS_PROBE_SCALE", "1.0"))
DENSE_T = int(os.environ.get("BLISS_HYBRID_T", "300"))
SUB = int(os.environ.get("BLISS_HYBRID_SUB", "256"))
ET_D = int(os.environ.get("BLISS_HYBRID_ETD", "512"))

import bench  # noqa: E402

bench.N_NODES = int(232_965 * SCALE)
bench.N_EDGES = int((114_615_892 + 232_965) * SCALE)
T0 = time.time()


def log(m):
    print(f"[hy +{time.time()-T0:.0f}s] {m}", flush=True)


indptr, csc_src = bench.build_graph()
n_edges = len(csc_src)
n_nodes = bench.N_NODES
log(f"graph ready: {n_nodes} nodes {n_edges} edges")

from bliss_gnn_tpu.ops.spmm_pallas import (  # noqa: E402
    DeviceBandedLayout,
    DeviceHybridLayout,
    HybridLayout,
    HybridMeta,
    band_features,
    banded_spmm,
    build_hybrid_layout,
    hybrid_spmm,
)

w = np.random.default_rng(1).random(n_edges).astype(np.float32)

cache = os.path.join(bench.CACHE, f"hybrid_v1_{n_nodes}_{n_edges}_{DENSE_T}_{SUB}_{ET_D}.npz")
if os.path.exists(cache):
    d = np.load(cache)
    from bliss_gnn_tpu.ops.spmm_pallas import BandedLayout, BandedMeta

    gmeta = BandedMeta(**{k: int(d[f"gm_{k}"]) for k in (
        "n_nodes", "n_edges", "band", "wr", "et", "n_bands", "n_wins",
        "n_tiles", "nt_per_band")})
    gather = BandedLayout(
        meta=gmeta, tile_win=d["g_tile_win"], tile_first=d["g_tile_first"],
        src_rel=d["g_src_rel"], dst_rel=d["g_dst_rel"], edge_w=d["g_edge_w"],
        edge_perm=np.zeros((0,), np.int64))
    hmeta = HybridMeta(**{k: int(d[f"hm_{k}"]) for k in (
        "n_nodes", "n_edges", "band", "wr", "sub", "et_d", "n_bands",
        "n_wins", "nt_dense", "dense_edges", "dense_t")})
    hl = HybridLayout(
        meta=hmeta, perm=d["perm"], d_win=d["d_win"], d_sub=d["d_sub"],
        d_first_win=d["d_first_win"], d_first_blk=d["d_first_blk"],
        d_last_blk=d["d_last_blk"], d_dst_rel=d["d_dst_rel"],
        d_src_rel=d["d_src_rel"], d_w=d["d_w"], gather=gather)
else:
    t0 = time.time()
    hl = build_hybrid_layout(indptr, csc_src, w, dense_t=DENSE_T, sub=SUB, et_d=ET_D)
    log(f"hybrid layout built in {time.time()-t0:.0f}s")
    g = hl.gather
    np.savez(
        cache, perm=hl.perm, d_win=hl.d_win, d_sub=hl.d_sub,
        d_first_win=hl.d_first_win, d_first_blk=hl.d_first_blk,
        d_last_blk=hl.d_last_blk, d_dst_rel=hl.d_dst_rel,
        d_src_rel=hl.d_src_rel, d_w=hl.d_w,
        g_tile_win=g.tile_win, g_tile_first=g.tile_first,
        g_src_rel=g.src_rel, g_dst_rel=g.dst_rel, g_edge_w=g.edge_w,
        **{f"gm_{k}": getattr(g.meta, k) for k in (
            "n_nodes", "n_edges", "band", "wr", "et", "n_bands", "n_wins",
            "n_tiles", "nt_per_band")},
        **{f"hm_{k}": getattr(hl.meta, k) for k in (
            "n_nodes", "n_edges", "band", "wr", "sub", "et_d", "n_bands",
            "n_wins", "nt_dense", "dense_edges", "dense_t")},
    )
m = hl.meta
log(f"dense edges {m.dense_edges} ({m.dense_edges/n_edges:.1%}), "
    f"dense tiles/band {m.nt_dense}, gather tiles/band "
    f"{hl.gather.meta.nt_per_band}")
dl = DeviceHybridLayout.from_host(hl)
jax.block_until_ready(dl.d_w)
log("layout on device")

rng = np.random.default_rng(2)
x = rng.normal(size=(n_nodes, 602)).astype(np.float32)
xp = x[hl.perm]  # permute on host (library permutes on device; timing
# below isolates the aggregation itself)
xb = jnp.asarray(np.pad(xp, ((0, m.n_bands * m.band - n_nodes), (0, 38))))
acc0 = jnp.zeros((m.n_wins * m.wr, 640), jnp.float32)
xb_base = jnp.asarray(np.pad(x, ((0, m.n_bands * m.band - n_nodes), (0, 38))))
log("features ready")

hy = jax.jit(lambda xb, acc, dl, s: hybrid_spmm(xb * (1 + s * 1e-9), dl, acc)[0, 0])
float(hy(xb, acc0, dl, jnp.float32(0)))
log("hybrid compiled+warm")
ts = []
for r in range(3):
    t0 = time.perf_counter()
    float(hy(xb, acc0, dl, jnp.float32(1 + r)))
    ts.append(time.perf_counter() - t0 - 0.033)
t_h = min(ts)
log(f"hybrid: {t_h*1e3:.0f} ms -> {n_edges/t_h/1e6:.1f} M edges/s")

if os.environ.get("BLISS_HYBRID_SKIP_BASE"):
    import sys
    out_h = jax.jit(lambda xb, dl: hybrid_spmm(xb, dl))(xb, dl)
    rows = np.sort(rng.choice(n_nodes, 8, replace=False))
    log(f"sample row sums: {np.asarray(out_h[rows]).sum(axis=1)[:4]}")
    sys.exit(0)

# base kernel on the same graph (canonical space, cached layout from bench)
bl = bench._cached_layout(indptr, csc_src, w)
dbl = DeviceBandedLayout.from_host(bl)
jax.block_until_ready(dbl.src_rel)
base = jax.jit(lambda xb, acc, dl, s: banded_spmm(xb * (1 + s * 1e-9), dl, acc)[0, 0])
float(base(xb_base, acc0, dbl, jnp.float32(0)))
log("base compiled+warm")
ts = []
for r in range(3):
    t0 = time.perf_counter()
    float(base(xb_base, acc0, dbl, jnp.float32(1 + r)))
    ts.append(time.perf_counter() - t0 - 0.033)
t_b = min(ts)
log(f"base: {t_b*1e3:.0f} ms -> {n_edges/t_b/1e6:.1f} M edges/s "
    f"(hybrid speedup {t_b/t_h:.2f}x)")

# correctness: compare a window of rows (hybrid is in permuted space)
out_h = jax.jit(lambda xb, dl: hybrid_spmm(xb, dl))(xb, dl)
out_b = jax.jit(lambda xb, dl: banded_spmm(xb, dl))(xb_base, dbl)
rows = np.sort(rng.choice(n_nodes, 64, replace=False))
h_rows = np.asarray(out_h[rows])          # permuted space: new id r = old perm[r]
b_rows = np.asarray(out_b[hl.perm[rows]])  # canonical space lookup
err = np.abs(h_rows - b_rows) / (np.abs(b_rows) + 1)
log(f"row check: max rel err {err.max():.4f}")
