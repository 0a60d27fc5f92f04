"""Honest (perturbed-input) full-Reddit-scale timing of the bf16
pair-packed gather kernel at F=256 (the hidden-layer case) vs the f32
kernel — the original 595 M edges/s figure was measured at 8M-edge probe
scale before the tunnel-memoization discovery (CLAUDE.md).

PYTHONPATH=.:/root/.axon_site python scripts/probe_packed_honest.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()

import bench  # noqa: E402

T0 = time.time()


def log(m):
    print(f"[pk +{time.time()-T0:.0f}s] {m}", flush=True)


indptr, csc_src = bench.build_graph()
n_edges = len(csc_src)
n_nodes = bench.N_NODES
log(f"graph: {n_nodes} nodes {n_edges} edges")

from bliss_gnn_tpu.ops.spmm_pallas import (  # noqa: E402
    DeviceBandedLayout,
    band_features,
    banded_spmm,
    banded_spmm_packed,
    pack_band_features,
)

w = np.random.default_rng(1).random(n_edges).astype(np.float32)
bl = bench._cached_layout(indptr, csc_src, w)
dl = DeviceBandedLayout.from_host(bl)
jax.block_until_ready(dl.src_rel)
m = bl.meta
log("layout on device")

F = 256
rng = np.random.default_rng(2)
x = jnp.asarray(rng.normal(size=(n_nodes, F)).astype(np.float32))
xp = pack_band_features(x, m.band, m.n_bands)
xb = band_features(x, m.band, m.n_bands)
jax.block_until_ready(xp)
log("features ready")


def timeit(fn, *args):
    f = jax.jit(fn)
    float(f(*args, jnp.float32(0)))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(f(*args, jnp.float32(1 + r)))
        ts.append(time.perf_counter() - t0 - 0.033)
    return min(ts)


t_p = timeit(lambda xp, dl, s: banded_spmm_packed(xp * (1 + s * 1e-9), dl)[0, 0],
             xp, dl)
log(f"packed (F={F}): {t_p*1e3:.0f} ms -> {n_edges/t_p/1e6:.1f} M edges/s")
t_f = timeit(lambda xb, dl, s: banded_spmm(xb * (1 + s * 1e-9), dl)[0, 0],
             xb, dl)
log(f"f32    (F={F}): {t_f*1e3:.0f} ms -> {n_edges/t_f/1e6:.1f} M edges/s "
    f"(packed {t_f/t_p:.2f}x)")
