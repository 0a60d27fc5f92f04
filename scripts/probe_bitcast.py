"""Probe pltpu.bitcast semantics for bf16 pair-packed gathers.

Plan: band stored as f32 [band, F/2] where each f32 lane packs two adjacent
bf16 features (host-side bitcast of bf16 [band, F/2, 2]). The kernel
gathers packed rows (half the lanes per row), then unpacks to bf16 [et, F]
for the MXU dot. This script checks what pltpu.bitcast actually produces
and whether the unpack roundtrips.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("jax", jax.__version__, jax.devices(), flush=True)

ET, F = 256, 512  # rows, bf16 features (F/2 f32 lanes packed)


def pack_host(x_bf16):
    # [n, F] bf16 -> [n, F/2] f32, adjacent feature pairs per f32 lane
    n, f = x_bf16.shape
    return jax.lax.bitcast_convert_type(
        x_bf16.reshape(n, f // 2, 2), jnp.float32
    )


def kernel(packed_ref, out_ref):
    x = packed_ref[:]  # [ET, F/2] f32
    b = pltpu.bitcast(x, jnp.bfloat16)
    # print shape at trace time
    pl.debug_print("bitcast rows {}", b.shape[0])
    out_ref[:] = b.reshape(out_ref.shape).astype(jnp.float32)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(ET, F)), jnp.bfloat16)
packed = pack_host(x)
print("packed", packed.shape, packed.dtype, flush=True)

# try: does bitcast give [2*ET, F/2] or [ET, F]?
try:
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * ET, F // 2), jnp.float32),
        interpret=False,
    )(packed)
    out = np.asarray(out)
    ref = np.asarray(x, np.float32)
    # hypothesis A: row i unpacks to rows (2i, 2i+1)? or interleaved blocks?
    # check a few mappings
    for name, view in [
        ("rows 2i/2i+1 = feat even/odd?",
         ref.reshape(ET, F // 2, 2).transpose(0, 2, 1).reshape(2 * ET, F // 2)),
        ("first ET rows = even feats?",
         np.concatenate([ref[:, 0::2], ref[:, 1::2]], axis=0)),
    ]:
        print(name, np.allclose(out, view, atol=1e-2), flush=True)
    print("sample out[0,:4]", out[0, :4], "ref[0,:8]", ref[0, :8], flush=True)
    print("sample out[1,:4]", out[1, :4], flush=True)
    print("sample out[ET,:4]", out[ET, :4], flush=True)
except Exception as e:
    print("bitcast->2ET failed:", type(e).__name__, str(e)[:500], flush=True)
