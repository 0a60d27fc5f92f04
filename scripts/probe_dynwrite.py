"""Probe: data-dependent dynamic WRITES in Pallas on TPU (v5e, jax 0.9).

Known from earlier probes: data-dependent dynamic READS work on 2-D VMEM
refs with SMEM scalar indices.  This tests the write direction, which a
fused stream-compaction kernel (keep-mask -> packed rows) and a VMEM
scatter-add kernel would need:

  1. row write   out[pl.ds(idx, 1), :] = row      (idx from SMEM data)
  2. row RMW     acc[pl.ds(idx, 1), :] += row     (scatter-add)
  3. timing: sequential scatter-add of E values by random keys into a
     VMEM-resident [N, 128] accumulator vs jax.ops.segment_sum.

PYTHONPATH=.:/root/.axon_site python scripts/probe_dynwrite.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()


# -- 1/2: correctness of dynamic row write + RMW --------------------------
def _kern_write(idx_ref, src_ref, out_ref):
    def body(i, _):
        out_ref[pl.ds(idx_ref[i], 1), :] = src_ref[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, src_ref.shape[0], body, 0)


def _kern_rmw(idx_ref, src_ref, out_ref):
    out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, _):
        j = idx_ref[i]
        out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + src_ref[
            pl.ds(i, 1), :
        ]
        return 0

    jax.lax.fori_loop(0, src_ref.shape[0], body, 0)


E, N, F = 1024, 256, 128
rng = np.random.default_rng(0)
idx = rng.integers(0, N, size=E).astype(np.int32)
src = rng.normal(size=(E, F)).astype(np.float32)

for name, kern, ref in [
    ("dyn row write", _kern_write, None),
    ("dyn row RMW (scatter-add)", _kern_rmw, None),
]:
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            input_output_aliases={},
        )(jnp.asarray(idx), jnp.asarray(src))
        out = np.asarray(out)
        if name.startswith("dyn row write"):
            expect = np.zeros((N, F), np.float32)
            # last write wins per index — replicate sequentially
            for i in range(E):
                expect[idx[i]] = src[i]
            # out is uninitialized where never written; compare only touched
            touched = np.zeros(N, bool)
            touched[idx] = True
            ok = np.allclose(out[touched], expect[touched])
        else:
            expect = np.zeros((N, F), np.float32)
            np.add.at(expect, idx, src)
            touched = np.zeros(N, bool)
            touched[idx] = True
            ok = np.allclose(out[touched], expect[touched], atol=1e-4)
        print(f"{name}: ran, correct={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {str(e)[:300]}", flush=True)

# -- 3: timing scatter-add at scale ---------------------------------------
# keys over [N] with payload width 128 (one vreg row per element)
E, N = 3_000_000, 2048  # acc [2048, 128] = 1 MB VMEM


def _kern_rmw_big(idx_ref, src_ref, out_ref):
    out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, _):
        j = idx_ref[i]
        out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + src_ref[
            pl.ds(i, 1), :
        ]
        return 0

    jax.lax.fori_loop(0, src_ref.shape[0], body, 0)


idx = rng.integers(0, N, size=E).astype(np.int32)
srcv = rng.normal(size=(E,)).astype(np.float32)
idx_d = jnp.asarray(idx)
src_d = jnp.asarray(srcv)


def timeit(f, *args):
    fn = jax.jit(f)
    float(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0 - 0.033)
    return min(ts)


t = timeit(
    lambda i, s: jax.ops.segment_sum(s, i, num_segments=N)[0], idx_d, src_d
)
print(f"XLA segment_sum   E={E}: {t*1e3:7.1f} ms  {t/E*1e9:.2f} ns/elem",
      flush=True)
t = timeit(
    lambda i, s: jnp.zeros(N, jnp.float32).at[i].add(s)[0], idx_d, src_d
)
print(f"XLA scatter-add   E={E}: {t*1e3:7.1f} ms  {t/E*1e9:.2f} ns/elem",
      flush=True)

# pallas sequential RMW at scale: keys idx -> rows of [N, 128] acc, value
# broadcast to the full row (we only need lane 0 semantically)
def _pallas_rmw(i, s):
    def kern(idx_ref, src_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)

        def body(k, _):
            j = idx_ref[k]
            out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + src_ref[k]
            return 0

        jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(i, s)[0, 0]

try:
    # correctness at small scale first
    small_i = jnp.asarray(idx[:100000])
    small_s = jnp.asarray(srcv[:100000])
    out = jax.jit(lambda i, s: _pallas_rmw(i, s))
    # reuse kernel but fetch full array
    def _pallas_rmw_full(i, s):
        def kern(idx_ref, src_ref, out_ref):
            out_ref[...] = jnp.zeros_like(out_ref)
            def body(k, _):
                j = idx_ref[k]
                out_ref[pl.ds(j, 1), :] = (
                    out_ref[pl.ds(j, 1), :] + src_ref[k])
                return 0
            jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )(i, s)
    got = np.asarray(jax.jit(_pallas_rmw_full)(small_i, small_s))[:, 0]
    expect = np.zeros(N, np.float32)
    np.add.at(expect, idx[:100000], srcv[:100000])
    print(f"pallas RMW @100k correct={np.allclose(got, expect, atol=1e-2)} "
          f"maxerr={np.abs(got-expect).max():.2e}", flush=True)
    t = timeit(_pallas_rmw, idx_d, src_d)
    print(f"pallas seq RMW    E={E}: {t*1e3:7.1f} ms  {t/E*1e9:.2f} ns/elem",
          flush=True)
except Exception as e:
    print(f"pallas RMW big: FAILED {str(e)[:300]}", flush=True)
