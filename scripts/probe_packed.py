"""Correctness + timing of the bf16 pair-packed banded SpMM vs the f32 one.

Run on the real TPU:  PYTHONPATH=.:/root/.axon_site python scripts/probe_packed.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache
from bliss_gnn_tpu.ops.spmm_pallas import (
    DeviceBandedLayout,
    band_features,
    banded_spmm,
    banded_spmm_packed,
    build_banded_layout,
    pack_band_features,
    unpermute_features,
)

enable_compilation_cache()

# -- correctness on a small graph ---------------------------------------
rng = np.random.default_rng(0)
N, E, F = 3000, 40000, 300
dst = np.sort(rng.integers(0, N, size=E))
src = rng.integers(0, N, size=E)
indptr = np.searchsorted(dst, np.arange(N + 1))
w = rng.random(E).astype(np.float32)
layout = build_banded_layout(indptr, src, w, band=1024, wr=256, et=2048)
dl = DeviceBandedLayout.from_host(layout)
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32), jnp.bfloat16)

ref = np.zeros((N, F), np.float32)
xs = np.asarray(x, np.float32)
np.add.at(ref, dst, xs[src] * w[:, None])

m = layout.meta
xb = band_features(x, m.band, m.n_bands)
out_f32 = np.asarray(jax.jit(
    lambda xb, dl: banded_spmm(xb, dl)
)(xb, dl))[:N, :F]
xp = pack_band_features(x, m.band, m.n_bands)
out_pk = np.asarray(jax.jit(
    lambda xp, dl: unpermute_features(banded_spmm_packed(xp, dl), F)
)(xp, dl))[:N]
err_f = np.abs(out_f32 - ref).max() / (np.abs(ref).max() + 1e-9)
err_p = np.abs(out_pk - ref).max() / (np.abs(ref).max() + 1e-9)
err_fp = np.abs(out_pk - out_f32).max() / (np.abs(out_f32).max() + 1e-9)
print(f"rel err f32-kernel={err_f:.2e} packed={err_p:.2e} "
      f"packed-vs-f32={err_fp:.2e}", flush=True)
assert err_p < 2e-2 and err_fp < 1e-3, "packed kernel mismatch"

# -- timing at probe scale ----------------------------------------------
N = 65536
E = 8_000_000
dst = np.sort(rng.integers(0, N, size=E))
src = rng.integers(0, N, size=E)
indptr = np.searchsorted(dst, np.arange(N + 1))
w = rng.random(E).astype(np.float32)
layout = build_banded_layout(indptr, src, w, band=16384, wr=256, et=2048)
dl = DeviceBandedLayout.from_host(layout)
m = layout.meta
jax.block_until_ready(dl.src_rel)


def timeit(fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0 - 0.033)
    return min(ts)


for F in (256, 512, 602, 640):
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32), jnp.bfloat16)
    xp = pack_band_features(x, m.band, m.n_bands)
    acc0 = jnp.zeros((m.n_wins * m.wr, 2 * xp.shape[1]), jnp.float32)
    for unroll in (8, 32):
        t = timeit(
            lambda xp, acc, dl, u=unroll: banded_spmm_packed(
                xp, dl, acc, unroll=u)[0, 0],
            xp, acc0, dl)
        print(f"packed F={F:4d} (lanes {xp.shape[1]:4d}) unroll={unroll:3d}: "
              f"{t*1e3:7.1f} ms  {E/t/1e6:7.1f} M edges/s", flush=True)
