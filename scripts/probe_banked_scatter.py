"""Probe: banked Pallas scatter-add vs XLA's ~7 ns/elem sequential scatter.

The sampler's biggest single cost is segment-summing ~2.5M f32 values by
candidate id into a [233k] accumulator (importance node prob).  XLA's
scatter executes one read-modify-write at a time; the idea here is B
independent accumulator banks in VMEM — element i updates bank i%B, so
consecutive RMW chains hit different addresses and can pipeline — plus a
final (tiny) bank reduction.

Key layout: acc [B * ceil(N/128), 128] f32; key k of bank b lands at row
b*rows + k//128, lane k%128 (lane-masked one-hot add).

PYTHONPATH=.:/root/.axon_site python scripts/probe_banked_scatter.py
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()


def _kernel(n_rows: int, banks: int, tile: int, unroll: int):
    def kern(row_ref, lane_ref, val_ref, acc_ref):
        # row_ref/lane_ref: SMEM [tile] int32 (row already includes bank
        # offset, precomputed on the XLA side); val_ref: SMEM [tile] f32
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                r = row_ref[base + j]
                ln = lane_ref[base + j]
                v = val_ref[base + j]
                onehot = jnp.where(lane_iota == ln, v, 0.0)
                acc_ref[pl.ds(r, 1), :] = acc_ref[pl.ds(r, 1), :] + onehot
            return 0

        jax.lax.fori_loop(0, tile // unroll, body, 0)

    return kern


def banked_scatter_add(keys, vals, n_out, banks=8, tile=8192, unroll=8,
                       interpret=False):
    e = keys.shape[0]
    assert e % tile == 0
    n_rows = (n_out + 127) // 128
    bank = (jnp.arange(e, dtype=jnp.int32) % banks) * n_rows
    row = bank + (keys >> 7)
    lane = keys & 127
    acc = pl.pallas_call(
        _kernel(n_rows, banks, tile, unroll),
        out_shape=jax.ShapeDtypeStruct((banks * n_rows, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(e // tile,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(row, lane, vals)
    return acc.reshape(banks, n_rows * 128).sum(axis=0)[:n_out]


# correctness
rng = np.random.default_rng(0)
E, N = 65536, 10000
keys = rng.integers(0, N, size=E).astype(np.int32)
vals = rng.normal(size=E).astype(np.float32)
expect = np.zeros(N, np.float32)
np.add.at(expect, keys, vals)
try:
    got = np.asarray(jax.jit(
        functools.partial(banked_scatter_add, n_out=N)
    )(jnp.asarray(keys), jnp.asarray(vals)))
    err = np.abs(got - expect).max() / (np.abs(expect).max() + 1e-9)
    print(f"banked scatter-add correct, rel err {err:.2e}", flush=True)
except Exception as ex:  # noqa: BLE001
    print(f"banked scatter-add FAILED: {str(ex)[:300]}", flush=True)
    raise SystemExit(1)


def timeit(f, *args):
    fn = jax.jit(f)
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0 - 0.033)
    return min(ts)


E, N = 2_498_560, 233_088  # layer-0 frontier scale (tile-aligned)
keys = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
vals = jnp.asarray(rng.normal(size=E).astype(np.float32))
t = timeit(lambda k, v: jnp.zeros(N, jnp.float32).at[k].add(v), keys, vals)
print(f"XLA scatter-add    E={E}: {t*1e3:7.1f} ms  {t/E*1e9:.2f} ns/elem",
      flush=True)
for banks in (1, 4, 8, 16):
    for unroll in (8, 16):
        t = timeit(functools.partial(
            banked_scatter_add, n_out=N, banks=banks, unroll=unroll),
            keys, vals)
        print(f"banked B={banks:2d} u={unroll:2d}  E={E}: {t*1e3:7.1f} ms  "
              f"{t/E*1e9:.2f} ns/elem", flush=True)

# -- masked-run sensitivity: ~34% of slots masked (key 0) in runs --------
keys_np = np.asarray(keys)
masked = np.zeros(E, bool)
# mask the tail (the real frontier's beyond-total_chunks region) + per-chunk
# run tails, mimicking gather_in_edges' layout
masked[int(E * 0.75):] = True
rng2 = np.random.default_rng(3)
starts = rng2.integers(0, int(E * 0.75), size=E // 1024)
for s in starts:
    masked[s:s + 40] = True
frac = masked.mean()
k_runs = jnp.asarray(np.where(masked, 0, keys_np).astype(np.int32))
v_runs = jnp.asarray(np.where(masked, 0.0, np.asarray(vals)).astype(np.float32))
t = timeit(functools.partial(banked_scatter_add, n_out=N, banks=16,
                             unroll=16), k_runs, v_runs)
print(f"runs->key0 ({frac:.0%} masked): {t*1e3:7.1f} ms  "
      f"{t/E*1e9:.2f} ns/elem", flush=True)
# fix candidate: masked keys spread over a dump region of 2048 keys
dump = N + (np.arange(E) % 2048)
k_spread = jnp.asarray(np.where(masked, dump, keys_np).astype(np.int32))
t = timeit(functools.partial(banked_scatter_add, n_out=N + 2048, banks=16,
                             unroll=16), k_spread, v_runs)
print(f"runs->spread dump          : {t*1e3:7.1f} ms  "
      f"{t/E*1e9:.2f} ns/elem", flush=True)

# -- in-one-jit chained double-scatter (mimic the sampler's usage) --------
def two_scatters(k1, v1, k2, v2):
    a = banked_scatter_add(k1, v1, N, banks=16, unroll=16)
    b = banked_scatter_add(k2, v2, 120_065, banks=16, unroll=16)
    return a[0] + b[0]

k2 = jnp.asarray(rng.integers(0, 120_000, size=E).astype(np.int32))
t = timeit(two_scatters, k_runs, v_runs, k2, vals)
print(f"two chained scatters in one jit: {t*1e3:7.1f} ms "
      f"({t/(2*E)*1e9:.2f} ns/elem)", flush=True)
for unroll in (4, 8, 32):
    for tile in (8192,):
        t = timeit(functools.partial(banked_scatter_add, n_out=N, banks=16,
                                     unroll=unroll, tile=tile),
                   k_runs, v_runs)
        print(f"tuned B=16 u={unroll:2d} t={tile:5d}: {t*1e3:7.1f} ms  "
              f"{t/E*1e9:.2f} ns/elem", flush=True)
