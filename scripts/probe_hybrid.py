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

cache = os.path.join(bench.CACHE, f"hybrid_v2_{n_nodes}_{n_edges}_{DENSE_T}_{SUB}_{ET_D}.npz")
from bliss_gnn_tpu.ops.spmm_pallas import (  # noqa: E402
    load_hybrid_layout,
    save_hybrid_layout,
)

if os.path.exists(cache):
    hl = load_hybrid_layout(cache)
else:
    t0 = time.time()
    hl = build_hybrid_layout(indptr, csc_src, w, dense_t=DENSE_T, sub=SUB, et_d=ET_D)
    log(f"hybrid layout built in {time.time()-t0:.0f}s")
    save_hybrid_layout(cache, hl)
m = hl.meta
log(f"dense edges {m.dense_edges} ({m.dense_edges/n_edges:.1%}), "
    f"dense groups {m.n_groups} (x{m.nt_dense} tiles), gather tiles/band "
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
