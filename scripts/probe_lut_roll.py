"""Probe: roll-based LUT gather (per-slot lane rotation + diagonal
extract) vs the one-hot kernel, honest chained-distinct-input timing.

The base kernel's [M, 1] index-column operand is T(8,128)-tiled — i.e.
physically ~128x padded — and its production costs ~2.9 ms per sample
call at Reddit scale (trace copy.11/copy.52).  The roll variant drops
that operand; this measures whether the per-row dynamic rotate +
diagonal extract is cheaper end-to-end.

PYTHONPATH=.:/root/.axon_site python scripts/probe_lut_roll.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache
from bliss_gnn_tpu.ops.gather_pallas import lut_gather

enable_compilation_cache()

N = 233_088          # candidate-set scale LUT
M = 2_641_920        # refit l0 frontier slots

rng = np.random.default_rng(0)
lut = jnp.asarray(rng.normal(size=N).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
T0 = time.time()


def log(m):
    print(f"[lutroll +{time.time()-T0:.0f}s] {m}", flush=True)


def timeit(name, fn):
    # chain K distinct-index invocations in one jit (tunnel memoization)
    K = 4

    def chained(lut, idx, s):
        tot = jnp.float32(0)
        for k in range(K):
            ix = jnp.clip(idx + s.astype(jnp.int32) + k, 0, N - 1)
            tot = tot + fn(lut, ix)[0]
        return tot

    f = jax.jit(chained)
    float(f(lut, idx, jnp.float32(0)))
    log(f"{name} warm")
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(f(lut, idx, jnp.float32(1 + r)))
        ts.append(time.perf_counter() - t0 - 0.033)
    per = min(ts) / K
    log(f"{name}: {per*1e3:.2f} ms/call -> {per/M*1e9:.2f} ns/idx")
    return per


base = timeit("one-hot flat2d", lambda l, ix: lut_gather(
    l, ix, elem_dtype=jnp.float32, flat2d=True))
roll = timeit("roll diagonal ", lambda l, ix: lut_gather(
    l, ix, elem_dtype=jnp.float32, roll=True))
log(f"roll vs base: {base/roll:.2f}x")
a = np.asarray(lut_gather(lut, idx, elem_dtype=jnp.float32, flat2d=True))
b = np.asarray(lut_gather(lut, idx, elem_dtype=jnp.float32, roll=True))
log(f"exact match: {np.array_equal(a, b)}")
