"""Probe: banded-SpMM kernel time vs feature width + no-gather floor.

Decides whether bf16 pair-packed gathers (half the lanes per row) are worth
implementing: if kernel time scales with row width, packing ~halves the
gather bottleneck; if per-row overhead dominates, it won't.

Run on the real TPU:  python scripts/probe_gather.py
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
    build_banded_layout,
)

enable_compilation_cache()

# a mid-size slice: big enough to time, small enough to compile fast
N = 65536
E = 8_000_000
rng = np.random.default_rng(0)
dst = np.sort(rng.integers(0, N, size=E))
src = rng.integers(0, N, size=E)
indptr = np.searchsorted(dst, np.arange(N + 1))
w = rng.random(E).astype(np.float32)
layout = build_banded_layout(indptr, src, w, band=16384, wr=256, et=2048)
dl = DeviceBandedLayout.from_host(layout)
jax.block_until_ready(dl.src_rel)
m = layout.meta
print(f"tiles={m.n_tiles} bands={m.n_bands} nt/band={m.nt_per_band}",
      flush=True)


def timeit(fn, *args):
    f = jax.jit(fn)
    float(f(*args))  # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0 - 0.033)
    return min(ts)


for F in (128, 256, 384, 512, 640):
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    xb = band_features(x, m.band, m.n_bands)
    acc0 = jnp.zeros((m.n_wins * m.wr, xb.shape[1]), jnp.float32)
    t = timeit(lambda xb, acc, dl: banded_spmm(xb, dl, acc)[0, 0],
               xb, acc0, dl)
    print(f"F={F:4d}: {t*1e3:7.1f} ms  {E/t/1e6:7.1f} M edges/s", flush=True)

# unroll sweep at F=640
x = jnp.asarray(rng.normal(size=(N, 640)).astype(np.float32))
xb = band_features(x, m.band, m.n_bands)
acc0 = jnp.zeros((m.n_wins * m.wr, xb.shape[1]), jnp.float32)
for unroll in (4, 8, 16, 32):
    t = timeit(
        lambda xb, acc, dl, u=unroll: banded_spmm(xb, dl, acc, unroll=u)[0, 0],
        xb, acc0, dl)
    print(f"unroll={unroll:3d} F=640: {t*1e3:7.1f} ms  {E/t/1e6:7.1f} M e/s",
          flush=True)
