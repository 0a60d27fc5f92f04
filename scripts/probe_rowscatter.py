"""Banked ROW scatter-add vs XLA on the GAT aggregation shapes.

The r5 GAT trace showed three [E ~ 100k, 1024] bf16 segment sums /
gather-VJPs at ~3.8 ms each (fusion.131/157/158) riding XLA's scatter —
the layers.py budget MODELED an F-tiled banked RMW kernel at ~3 ms and
called it "not worth a new kernel family".  This probe replaces the
model with a measurement (ops/rowscatter_pallas.py).

Protocol: honest distinct-input timing (scalar-perturbed data per
repeat), GAT l0 shapes: E=100096 (true 56k -> n_valid tail skip), F=1024
bf16, S=3712 (dst) and S=8064 (src table), dst-SORTED ids like the real
block edges (long equal-dst runs — the banked rotation's worst-case
test).

MEASURED (2026-08-21, v5e, chained K=16 distinct-input protocol):
  S=3712  XLA scatter: 4.12 ms   row kernel: 3.50 ms  -> 1.18x
  S=8064  XLA scatter: 4.20 ms   row kernel: 3.90 ms  -> 1.08x
  Param sweep at S=3712: banks 4/8/16 -> 3.44/3.53/3.91 ms, larger
  tiles/unroll all LOSE (et=8192+unroll=16: 4.35) — the row-RMW issue
  rate plateaus ~7 cy/row-RMW (vs the 1-D kernel's 3.7: the extra
  (1,128) data-row load per element roughly doubles the chain).
  Exactness: allclose rtol 2e-2 vs f32 reference in bf16.
-> The layers.py budget MODELED this family at ~3 ms vs XLA's 3.8 and
   the measurement agrees (3.44-3.50 vs 4.12): a real but modest
   1.1-1.2x.  WIRED (ops/segment.py routes wide 2-D payloads past the
   one-hot cap through it, banks=4).  IN SITU the win is larger than
   this isolated probe because the n_valid tail skip engages (the probe
   sets n_valid=TRUE but the chain perturbation keeps the full data
   live): the r5 GAT step trace shows the three [E,1024] aggregations
   at 2.15/2.15/2.22 ms vs XLA's 3.8 each = 1.74x; GAT step 71.9 ->
   68.7 ms device.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bliss_gnn_tpu.ops.rowscatter_pallas import (  # noqa: E402
    banked_row_scatter_add,
)
from bliss_gnn_tpu.utils.logging import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

E, F = 100096, 1024
TRUE = 56000
rng = np.random.default_rng(0)


def run(S):
    ids_np = np.sort(rng.integers(0, S, E)).astype(np.int32)
    ids_np[TRUE:] = 0
    data_np = rng.normal(size=(E, F)).astype(np.float32)
    data_np[TRUE:] = 0.0
    ids = jnp.asarray(ids_np)
    data = jnp.asarray(data_np, jnp.bfloat16)
    nv = jnp.int32(TRUE)

    K = 16  # ops are ~1-4 ms, far under the ~33 ms dispatch round-trip:
    # chain K DISTINCT-input links inside one jit and divide (CLAUDE.md
    # honest-microbenchmark protocol; the perturbation scalar is fed from
    # the previous link's output so XLA cannot CSE the links)

    def chain(op):
        @jax.jit
        def fn(i, d, s):
            acc = jnp.float32(s)
            for k in range(K):
                out0 = op(i, (d * (1 + acc * 1e-12 + k * 1e-3)).astype(
                    jnp.bfloat16))
                acc = acc + out0
            return acc

        return fn

    xla = chain(lambda i, d: jax.ops.segment_sum(
        d, i, num_segments=S)[0, 0].astype(jnp.float32))
    ker = chain(lambda i, d: banked_row_scatter_add(
        i, d, S, n_valid=nv)[0, 0])

    ref = np.zeros((S, F), np.float32)
    np.add.at(ref, ids_np, data_np.astype(np.float32))
    got = np.asarray(banked_row_scatter_add(ids, data, S, n_valid=nv))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-1)

    out = {}
    for name, fn in (("xla", xla), ("rowscatter", ker)):
        float(fn(ids, data, jnp.float32(0)))
        ts = []
        for r in range(4):
            t0 = time.perf_counter()
            float(fn(ids, data, jnp.float32(1 + r)))
            ts.append((time.perf_counter() - t0 - 0.033) / K)
        out[name] = min(ts)
        print(f"S={S:5d} {name:10s} {min(ts)*1e3:6.2f} ms", flush=True)
    print(f"S={S:5d} ratio {out['xla']/out['rowscatter']:.2f}x", flush=True)


for S in (3712, 8064):
    run(S)
