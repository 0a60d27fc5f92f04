"""Tune the sampler's two big scatters at their real shapes/key patterns.

1. compaction (compact_by_mask): keys are MONOTONE slot positions
   (cumsum ranks) — probe banked kernel vs XLA unique-indexed scatter-set.
2. importance node prob: scatter-ADD of r^2 by src gid — ZIPF keys (hubs);
   probe bank counts 16/32/64 vs XLA segment-sum-style scatter-add.

PYTHONPATH=.:/root/.axon_site python scripts/probe_scatter_tune.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache
from bliss_gnn_tpu.ops.scatter_pallas import banked_scatter_add

enable_compilation_cache()

E = 2_383_872  # L0 frontier slots (refit Reddit config)
N = 232_965
OUT_CAP = 120_064

rng = np.random.default_rng(0)

# --- zipf keys mirroring the synth reddit in-degree law (for node prob) ---
ranks = np.arange(1, N + 1, dtype=np.float64)
p = np.minimum(ranks ** -0.8, np.inf)
p /= p.sum()
node_of_rank = rng.permutation(N)
zipf_keys = node_of_rank[rng.choice(N, size=E, p=p)].astype(np.int32)
uni_keys = rng.integers(0, N, E).astype(np.int32)
vals = rng.random(E).astype(np.float32)

# --- monotone keys (compaction): ~5% kept, rest to dump ------------------
keep = rng.random(E) < 0.05
pos = np.cumsum(keep) - 1
mono_keys = np.where(keep & (pos < OUT_CAP), pos, OUT_CAP).astype(np.int32)
arange_v = np.arange(E, dtype=np.float32)
# XLA alternative: distinct out-of-range targets for dropped slots
mono_keys_distinct = np.where(
    keep & (pos < OUT_CAP), pos, OUT_CAP + np.arange(E)
).astype(np.int32)


CHAIN = 8


def timeit(f, keys, x, reps=3):
    """Chain CHAIN distinct-input invocations inside ONE jit: the axon
    tunnel memoizes identical dispatches, so repeats of f(same args) return
    without executing (measured 0.1 ns/elem 'scatters').  A scalar seed
    perturbs the values of each link; time per link = (t - dispatch)/CHAIN."""

    def chained(keys, x, s):
        tot = jnp.float32(0)
        for k in range(CHAIN):
            out = f(keys, x * (s + k))
            tot += jnp.asarray(out).reshape(-1)[0].astype(jnp.float32)
        return tot

    g = jax.jit(chained)
    float(g(keys, x, jnp.float32(1.0)))
    ts = []
    for r in range(reps):
        s = jnp.float32(2.0 + r)
        t0 = time.perf_counter()
        float(g(keys, x, s))
        ts.append((time.perf_counter() - t0 - 0.033) / CHAIN)
    return min(ts)


kz = jnp.asarray(zipf_keys)
ku = jnp.asarray(uni_keys)
v = jnp.asarray(vals)
km = jnp.asarray(mono_keys)
kmd = jnp.asarray(mono_keys_distinct)
av = jnp.asarray(arange_v)
ai = jnp.asarray(np.arange(E, dtype=np.int32))

print("=== node-prob style: scatter-ADD, n_out=233k ===", flush=True)
for name, keys in [("uniform", ku), ("zipf", kz)]:
    for banks in (16, 32, 64):
        t = timeit(lambda k, x, b=banks: banked_scatter_add(k, x, N, banks=b),
                   keys, v)
        print(f"banked banks={banks:2d} {name:8s}: {t*1e3:6.1f} ms "
              f"({t/E*1e9:4.2f} ns/elem)", flush=True)
    t = timeit(lambda k, x: jnp.zeros(N, jnp.float32).at[k].add(x), keys, v)
    print(f"XLA scatter-add  {name:8s}: {t*1e3:6.1f} ms ({t/E*1e9:4.2f} ns/elem)",
          flush=True)

print("=== compaction style: monotone keys ===", flush=True)
for banks in (16, 32, 64):
    t = timeit(lambda k, x, b=banks: banked_scatter_add(
        k, x, OUT_CAP + 1, banks=b), km, av)
    print(f"banked banks={banks:2d} monotone: {t*1e3:6.1f} ms "
          f"({t/E*1e9:4.2f} ns/elem)", flush=True)
t = timeit(
    lambda k, x: jnp.zeros(OUT_CAP, jnp.float32).at[k].set(
        x, mode="drop", unique_indices=True), kmd, av)
print(f"XLA unique scatter-set    : {t*1e3:6.1f} ms ({t/E*1e9:4.2f} ns/elem)",
      flush=True)
t = timeit(
    lambda k, x: jnp.zeros(OUT_CAP + 1, jnp.float32).at[
        jnp.minimum(k, OUT_CAP)].set(x, mode="drop"), kmd, av)
print(f"XLA clamped scatter-set   : {t*1e3:6.1f} ms ({t/E*1e9:4.2f} ns/elem)",
      flush=True)
