"""Hybrid-packed SpMM at F=256 (hidden width) vs the pure banded packed
kernel — honest perturbed-input protocol (CLAUDE.md).

PYTHONPATH=.:/root/.axon_site python scripts/probe_hybrid_packed.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()
SCALE = float(os.environ.get("BLISS_PROBE_SCALE", "1.0"))
import bench  # noqa: E402

bench.N_NODES = int(232_965 * SCALE)
bench.N_EDGES = int((114_615_892 + 232_965) * SCALE)
T0 = time.time()


def log(m):
    print(f"[hp +{time.time()-T0:.0f}s] {m}", flush=True)


indptr, csc_src = bench.build_graph()
n_edges = len(csc_src)
n_nodes = bench.N_NODES
w = np.random.default_rng(1).random(n_edges).astype(np.float32)

from bliss_gnn_tpu.ops.spmm_pallas import (  # noqa: E402
    DeviceBandedLayout,
    DeviceHybridLayout,
    build_hybrid_layout,
    load_hybrid_layout,
    save_hybrid_layout,
    spmm_via_pallas,
    spmm_via_pallas_hybrid,
)

CACHE = bench.CACHE
hpath = os.path.join(CACHE, f"hybrid_v1_{n_nodes}_{n_edges}_300.npz")
if os.path.exists(hpath):
    hl = load_hybrid_layout(hpath)
else:
    hl = build_hybrid_layout(indptr, csc_src, w, dense_t=300)
    save_hybrid_layout(hpath, hl)
dhl = DeviceHybridLayout.from_host(hl)
bl = bench._cached_layout(indptr, csc_src, w)
dbl = DeviceBandedLayout.from_host(bl)
jax.block_until_ready(dhl.d_w)
jax.block_until_ready(dbl.edge_w)
log("layouts on device")

x = jnp.asarray(
    np.random.default_rng(3).normal(size=(n_nodes, 256)), jnp.bfloat16)


def timeit(name, fn, layout):
    # layout rides as an ARGUMENT: closing the jit over its device arrays
    # inlines GBs into the remote-compile payload (CLAUDE.md)
    f = jax.jit(fn)
    float(f(x, layout, jnp.float32(0)))
    log(f"{name} warm")
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(f(x, layout, jnp.float32(1 + r)))
        ts.append(time.perf_counter() - t0 - 0.033)
    t = min(ts)
    log(f"{name}: {t*1e3:.0f} ms -> {n_edges/t/1e6:.1f} M edges/s")
    return t


t_b = timeit("banded packed ", lambda x, dl_, s: spmm_via_pallas(
    x * jnp.bfloat16(1 + s * 1e-2), dl_, n_nodes, packed=True)[0, 0], dbl)
t_h = timeit("hybrid packed ", lambda x, dl_, s: spmm_via_pallas_hybrid(
    x * jnp.bfloat16(1 + s * 1e-2), dl_, n_nodes, packed=True)[0, 0], dhl)
log(f"hybrid-packed vs banded-packed: {t_b/t_h:.2f}x")
a = np.asarray(jax.jit(lambda x, dl_: spmm_via_pallas(
    x, dl_, n_nodes, packed=True)[:256])(x, dbl))
b = np.asarray(jax.jit(lambda x, dl_: spmm_via_pallas_hybrid(
    x, dl_, n_nodes, packed=True)[:256])(x, dhl))
log(f"xcheck max|diff| {np.abs(a-b).max():.3e} scale {np.abs(a).max():.3e}")
