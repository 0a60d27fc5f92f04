"""MXU-select LUT gather vs the base one-hot kernel (keep-mask shape).

The base kernel needs idx twice: SMEM (row compute) AND a [M, 1] VMEM
column (lane select) whose T(1,128)->T(8,128) relayout costs ~2.5 ms per
sample call at the Reddit refit caps (trace copy.11/copy.26).  The
mxusel variant takes idx's natural [M/128, 128] 2-D view (a free bitcast
of the 1-D stream) and extracts lanes per 128-sub-block via one bf16 MXU
contraction + diagonal reduce — exact for bf16-representable values
(keep masks are 0/1).

Honest protocol: K distinct-input invocations chained in one jit
(perturb the LUT with the running output), divide by K.

PYTHONPATH=.:/root/.axon_site python scripts/probe_lut_mxusel.py

MEASURED (2026-08-21, v5e, N=233k 0/1 LUT, M=2,203,648 uniform idx,
K=8, n_valid=M; each chain link also pays one .at[0].set perturbation,
identical in both arms):
  base kernel (incl. its [M,1] operand copy):  4.44 ms/call  2.02 ns/idx
  mxusel      (no [M,1] operand):              3.39 ms/call  1.54 ns/idx
  -> 1.31x on the keep-mask gather; wired as the automatic route for
  BOOLEAN LUTs in maybe_lut_gather (bool => 0/1 => bf16-exact).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bliss_gnn_tpu.ops.gather_pallas import lut_gather  # noqa: E402
from bliss_gnn_tpu.utils.logging import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = 233_088
M = 2_203_648
K = 8
rng = np.random.default_rng(0)
sel = jnp.asarray(rng.integers(0, 2, N).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, M), jnp.int32)
nv = jnp.int32(M)


def chained(mxusel):
    @jax.jit
    def fn(sel, idx, s):
        acc = jnp.zeros((), jnp.float32)
        cur = sel
        for i in range(K):
            out = lut_gather(cur, idx, elem_dtype=jnp.float32,
                             flat2d=not mxusel, mxusel=mxusel, n_valid=nv)
            acc = acc + out[0] + out[M - 1]
            # distinct inputs per link: flip one entry data-dependently
            cur = sel.at[0].set((acc * 1e-20 + i) % 2.0)
        return acc

    return fn


for name, mx in (("base", False), ("mxusel", True)):
    fn = chained(mx)
    float(fn(sel, idx, jnp.float32(0)))  # compile
    ts = []
    for r in range(4):
        t0 = time.perf_counter()
        float(fn(sel, idx, jnp.float32(1 + r)))
        ts.append((time.perf_counter() - t0 - 0.033) / K)
    per = min(ts)
    print(f"{name:8s} {per*1e3:.2f} ms/call  {per/M*1e9:.2f} ns/idx",
          flush=True)

# exactness on-device
a = np.asarray(lut_gather(sel, idx, elem_dtype=jnp.float32, flat2d=True))
b = np.asarray(lut_gather(sel, idx, elem_dtype=jnp.float32, mxusel=True))
np.testing.assert_array_equal(a, b)
print("exact: mxusel == base")
