"""Honest (chained-dispatch) tune of banked_scatter_add (unroll, tile) at
the sampler's L0 shape.  The previous tune predated the discovery that the
axon tunnel memoizes identical repeat dispatches (CLAUDE.md).

PYTHONPATH=.:/root/.axon_site python scripts/probe_scatter_params.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache
from bliss_gnn_tpu.ops.scatter_pallas import banked_scatter_add

enable_compilation_cache()

E = 2_383_872
N = 232_965
CHAIN = 6

rng = np.random.default_rng(0)
ranks = np.arange(1, N + 1, dtype=np.float64)
p = (ranks ** -0.8) / (ranks ** -0.8).sum()
keys = jnp.asarray(
    rng.permutation(N)[rng.choice(N, size=E, p=p)].astype(np.int32)
)
vals = jnp.asarray(rng.random(E).astype(np.float32))


def timeit(f, reps=3):
    def chained(s, k, v):
        tot = jnp.float32(0)
        for i in range(CHAIN):
            tot += f(k, v * (s + i))[0]
        return tot

    g = jax.jit(chained)
    float(g(jnp.float32(1.0), keys, vals))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(g(jnp.float32(2.0 + r), keys, vals))
        ts.append((time.perf_counter() - t0 - 0.033) / CHAIN)
    return min(ts)


for tile in (4096, 8192, 16384):
    for unroll in (4, 8, 16, 32):
        t = timeit(lambda k, v, tl=tile, u=unroll: banked_scatter_add(
            k, v, N, tile=tl, unroll=u))
        print(f"tile={tile:6d} unroll={unroll:2d}: {t*1e3:6.2f} ms "
              f"({t/E*1e9:4.2f} ns/elem)", flush=True)
