"""Probe EXP3 apply variants: does unique_indices (padded slots remapped to
a dump index in the EDGE_PAD tail) speed the 1-D donated scatter-mul?

HISTORICAL: probes the LEGACY flat-state XLA scatter path.  Production
now stores the state as a [L, R, 128] grid and applies updates via the
Pallas streaming kernel (ops/exp3_pallas.py; 15.1 -> 3.1 ms in-step) —
apply_exp3_deltas keeps the flat path this script exercises for
comparison.

PYTHONPATH=.:/root/.axon_site python scripts/probe_exp3_apply.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache
from bliss_gnn_tpu.sampling.frontier import EDGE_PAD

enable_compilation_cache()

N_EDGES = 114_848_857
L = 3
ROW = N_EDGES + EDGE_PAD
CAPS = [120_064, 27_136, 3_584]  # refit block_e caps (Reddit config)
VALID = [110_000, 25_000, 3_200]

rng = np.random.default_rng(0)
eids, drs, masks = [], [], []
for cap, val in zip(CAPS, VALID):
    e = np.zeros(cap, np.int32)
    e[:val] = rng.choice(N_EDGES, val, replace=False)
    d = np.zeros(cap, np.float32)
    d[:val] = rng.random(val) * 0.5
    m = np.zeros(cap, bool)
    m[:val] = True
    eids.append(jnp.asarray(e))
    drs.append(jnp.asarray(d))
    masks.append(jnp.asarray(m))

def timeit(f, *args, reps=4):
    w0 = jax.jit(lambda: jnp.ones(L * ROW, jnp.bfloat16))()  # fresh, on-device
    g = jax.jit(f, donate_argnums=0)
    w = g(w0, *args)
    jax.block_until_ready(w)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        w = g(w, *args)
        float(w[0])
        ts.append(time.perf_counter() - t0 - 0.033)
    del w
    return min(ts)


def apply_base(w, eids, drs):
    flat = jnp.concatenate([
        e.astype(jnp.int32) + jnp.int32(i * ROW) for i, e in enumerate(eids)
    ])
    mult = jnp.concatenate([jnp.exp(d).astype(w.dtype) for d in drs])
    return w.at[flat].multiply(mult)


def apply_unique(w, eids, drs, masks):
    # masked slots -> per-layer dump index inside the EDGE_PAD tail (weights
    # there are 0 and never read); real eids are unique within a layer
    flat = jnp.concatenate([
        jnp.where(m, e, N_EDGES + EDGE_PAD - 1).astype(jnp.int32)
        + jnp.int32(i * ROW)
        for i, (e, m) in enumerate(zip(eids, masks))
    ])
    mult = jnp.concatenate([jnp.exp(d).astype(w.dtype) for d in drs])
    return w.at[flat].multiply(mult, unique_indices=True)


def apply_unique_f32mult(w, eids, drs, masks):
    flat = jnp.concatenate([
        jnp.where(m, e, N_EDGES + EDGE_PAD - 1).astype(jnp.int32)
        + jnp.int32(i * ROW)
        for i, (e, m) in enumerate(zip(eids, masks))
    ])
    mult = jnp.concatenate([jnp.exp(d) for d in drs])
    return w.at[flat].multiply(mult.astype(w.dtype), unique_indices=True,
                               indices_are_sorted=False)


t_base = timeit(apply_base, eids, drs)
print(f"base scatter-mul           : {t_base*1e3:6.1f} ms", flush=True)
t_u = timeit(apply_unique, eids, drs, masks)
print(f"unique_indices + dump remap: {t_u*1e3:6.1f} ms", flush=True)

# gather-modify-scatter alternative: read the touched weights, multiply on
# the VPU, scatter-SET back (set with unique indices has no combine pass)
def apply_set(w, eids, drs, masks):
    flat = jnp.concatenate([
        jnp.where(m, e, N_EDGES + EDGE_PAD - 1).astype(jnp.int32)
        + jnp.int32(i * ROW)
        for i, (e, m) in enumerate(zip(eids, masks))
    ])
    mult = jnp.concatenate([jnp.exp(d) for d in drs])
    # the dump slot may be read by several layers; it stays 0 under set
    cur = jnp.take(w, flat).astype(jnp.float32)
    new = (cur * mult).astype(w.dtype)
    return w.at[flat].set(new, unique_indices=True)


t_s = timeit(apply_set, eids, drs, masks)
print(f"gather*mul + scatter-set   : {t_s*1e3:6.1f} ms", flush=True)
