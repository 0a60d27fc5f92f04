"""Probe: can the banded SpMM beat the sequential-gather floor at F=602?

Variants (vs the shipped f32 kernel at ~136 M edges/s Reddit-scale):
  A. chunked  — split the tile into C chunks, interleave gather / MXU dot
                straight-line so Mosaic can overlap VPU copies with matmuls;
  B. pk-deint — packed bf16 gather (half the lanes), then bitcast to
                [2et, fh] bf16 and de-interleave rows via reshape+slice into
                even/odd halves -> two half-width dots (NO [et, 2fh] reshape);
  C. pk-2hot  — packed gather + bitcast only; the dot columns are doubled
                (dst_rel repeated 2x, even/odd-masked weights) -> two
                [wr, 2et] @ [2et, fh] dots, zero relayout of msgs.

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_overlap.py
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_gnn_tpu.utils.logging import enable_compilation_cache
from bliss_gnn_tpu.ops.spmm_pallas import (
    DeviceBandedLayout,
    band_features,
    banded_spmm,
    build_banded_layout,
    pack_band_features,
    unpermute_features,
)

enable_compilation_cache()


# ---------------------------------------------------------------- kernels
def _kernel_chunked(et, wr, f, unroll, C):
    etc = et // C

    def kernel(tw_ref, tf_ref, src_ref, dst_ref, w_ref, band_ref,
               acc_in_ref, acc_out_ref, *msgs_refs):
        t = pl.program_id(0)
        rel = dst_ref[0, 0, :]
        wv = w_ref[0, 0, :]
        parts = None
        for c in range(C):
            ms = msgs_refs[c]

            def body(i, _, c=c, ms=ms):
                base = i * unroll
                for j in range(unroll):
                    ms[pl.ds(base + j, 1), :] = band_ref[
                        pl.ds(src_ref[c * etc + base + j], 1), :
                    ]
                return 0

            jax.lax.fori_loop(0, etc // unroll, body, 0)
            relc = jax.lax.slice(rel, (c * etc,), ((c + 1) * etc,))
            wc = jax.lax.slice(wv, (c * etc,), ((c + 1) * etc,))
            rows = jax.lax.broadcasted_iota(jnp.int32, (wr, etc), 0)
            onehot = jnp.where(rows == relc[None, :], wc[None, :], 0.0
                               ).astype(jnp.bfloat16)
            p = jnp.dot(onehot, ms[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            parts = p if parts is None else parts + p
        first = tf_ref[t] == 1

        @pl.when(first)
        def _():
            acc_out_ref[:, :] = acc_in_ref[:, :] + parts

        @pl.when(jnp.logical_not(first))
        def _():
            acc_out_ref[:, :] = acc_out_ref[:, :] + parts

    return kernel


def _kernel_pk_deint(et, wr, fh, unroll):
    def kernel(tw_ref, tf_ref, src_ref, dst_ref, w_ref, band_ref,
               acc_in_ref, acc_out_ref, msgs_ref):
        t = pl.program_id(0)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                msgs_ref[pl.ds(base + j, 1), :] = band_ref[
                    pl.ds(src_ref[base + j], 1), :
                ]
            return 0

        jax.lax.fori_loop(0, et // unroll, body, 0)
        rel = dst_ref[0, 0, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (wr, et), 0)
        onehot = jnp.where(rows == rel[None, :], w_ref[0, 0, :][None, :], 0.0
                           ).astype(jnp.bfloat16)
        m2 = pltpu.bitcast(msgs_ref[:], jnp.bfloat16)  # [2et, fh]
        m3 = m2.reshape(et, 2, fh)
        me = m3[:, 0, :]
        mo = m3[:, 1, :]
        pe = jnp.dot(onehot, me, preferred_element_type=jnp.float32)
        po = jnp.dot(onehot, mo, preferred_element_type=jnp.float32)
        first = tf_ref[t] == 1

        @pl.when(first)
        def _():
            acc_out_ref[:, :fh] = acc_in_ref[:, :fh] + pe
            acc_out_ref[:, fh:] = acc_in_ref[:, fh:] + po

        @pl.when(jnp.logical_not(first))
        def _():
            acc_out_ref[:, :fh] = acc_out_ref[:, :fh] + pe
            acc_out_ref[:, fh:] = acc_out_ref[:, fh:] + po

    return kernel


def _kernel_pk_2hot(et, wr, fh, unroll):
    # dst2_ref: [1, 1, 2et] (dst_rel repeated 2x), we/wo: even/odd-masked w
    def kernel(tw_ref, tf_ref, src_ref, dst2_ref, we_ref, wo_ref, band_ref,
               acc_in_ref, acc_out_ref, msgs_ref):
        t = pl.program_id(0)

        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                msgs_ref[pl.ds(base + j, 1), :] = band_ref[
                    pl.ds(src_ref[base + j], 1), :
                ]
            return 0

        jax.lax.fori_loop(0, et // unroll, body, 0)
        rel2 = dst2_ref[0, 0, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (wr, 2 * et), 0)
        mask = rows == rel2[None, :]
        ohe = jnp.where(mask, we_ref[0, 0, :][None, :], 0.0
                        ).astype(jnp.bfloat16)
        oho = jnp.where(mask, wo_ref[0, 0, :][None, :], 0.0
                        ).astype(jnp.bfloat16)
        m2 = pltpu.bitcast(msgs_ref[:], jnp.bfloat16)  # [2et, fh]
        pe = jnp.dot(ohe, m2, preferred_element_type=jnp.float32)
        po = jnp.dot(oho, m2, preferred_element_type=jnp.float32)
        first = tf_ref[t] == 1

        @pl.when(first)
        def _():
            acc_out_ref[:, :fh] = acc_in_ref[:, :fh] + pe
            acc_out_ref[:, fh:] = acc_in_ref[:, fh:] + po

        @pl.when(jnp.logical_not(first))
        def _():
            acc_out_ref[:, :fh] = acc_out_ref[:, :fh] + pe
            acc_out_ref[:, fh:] = acc_out_ref[:, fh:] + po

    return kernel


# ------------------------------------------------------------- wrappers
def run_chunked(x2d, layout, C, unroll=32):
    m = layout.meta
    f = x2d.shape[-1]
    acc = jnp.zeros((m.n_wins * m.wr, f), jnp.float32)
    kernel = _kernel_chunked(m.et, m.wr, f, unroll, C)
    nt = m.nt_per_band
    etc = m.et // C
    for band_id in range(m.n_bands):
        t0, t1 = band_id * nt, (band_id + 1) * nt
        band_slice = jax.lax.dynamic_slice_in_dim(
            x2d, band_id * m.band, m.band, axis=0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((m.et,), lambda i, tw, tf: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, m.et), lambda i, tw, tf: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, m.et), lambda i, tw, tf: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((m.wr, f), lambda i, tw, tf: (tw[i], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m.wr, f), lambda i, tw, tf: (tw[i], 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((etc, f), jnp.float32)
                            for _ in range(C)],
        )
        acc = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m.n_wins * m.wr, f), jnp.float32),
            grid_spec=grid_spec,
            input_output_aliases={6: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(layout.tile_win[band_id], layout.tile_first[band_id],
          layout.src_rel[band_id], layout.dst_rel[t0:t1],
          layout.edge_w[t0:t1], band_slice, acc)
    return acc


def run_pk(xp, layout, kind, unroll=32):
    m = layout.meta
    fh = xp.shape[-1]
    acc = jnp.zeros((m.n_wins * m.wr, 2 * fh), jnp.float32)
    nt = m.nt_per_band
    if kind == "deint":
        kernel = _kernel_pk_deint(m.et, m.wr, fh, unroll)
    else:
        kernel = _kernel_pk_2hot(m.et, m.wr, fh, unroll)
    # host-doubled operands for 2hot, derived on device outside the kernel
    if kind == "2hot":
        dst2 = jnp.repeat(layout.dst_rel, 2, axis=-1)  # [B*NT, 1, 2et]
        col = jnp.arange(2 * m.et, dtype=jnp.int32)
        w2 = jnp.repeat(layout.edge_w, 2, axis=-1)
        we = jnp.where((col % 2 == 0)[None, None, :], w2, 0.0)
        wo = jnp.where((col % 2 == 1)[None, None, :], w2, 0.0)
    for band_id in range(m.n_bands):
        t0, t1 = band_id * nt, (band_id + 1) * nt
        band_slice = jax.lax.dynamic_slice_in_dim(
            xp, band_id * m.band, m.band, axis=0)
        edge_specs = [
            pl.BlockSpec((1, 1, 2 * m.et), lambda i, tw, tf: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * (3 if kind == "2hot" else 0) or [
            pl.BlockSpec((1, 1, m.et), lambda i, tw, tf: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 2
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((m.et,), lambda i, tw, tf: (i,),
                             memory_space=pltpu.SMEM),
                *edge_specs,
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((m.wr, 2 * fh), lambda i, tw, tf: (tw[i], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m.wr, 2 * fh),
                                   lambda i, tw, tf: (tw[i], 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m.et, fh), jnp.float32)],
        )
        n_in = 7 if kind == "2hot" else 6
        args = [layout.tile_win[band_id], layout.tile_first[band_id],
                layout.src_rel[band_id]]
        if kind == "2hot":
            args += [dst2[t0:t1], we[t0:t1], wo[t0:t1]]
        else:
            args += [layout.dst_rel[t0:t1], layout.edge_w[t0:t1]]
        args += [band_slice, acc]
        acc = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m.n_wins * m.wr, 2 * fh),
                                           jnp.float32),
            grid_spec=grid_spec,
            input_output_aliases={n_in: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(*args)
    return acc


# ------------------------------------------------------------------ main
rng = np.random.default_rng(0)

# correctness at small scale
N, E, F = 3000, 40000, 602
dst = np.sort(rng.integers(0, N, size=E))
src = rng.integers(0, N, size=E)
indptr = np.searchsorted(dst, np.arange(N + 1))
w = rng.random(E).astype(np.float32)
layout = build_banded_layout(indptr, src, w, band=1024, wr=256, et=2048)
dl = DeviceBandedLayout.from_host(layout)
m = layout.meta
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32), jnp.bfloat16)
ref = np.zeros((N, F), np.float32)
xs = np.asarray(x, np.float32)
np.add.at(ref, dst, xs[src] * w[:, None])

xb = band_features(x, m.band, m.n_bands)
xp = pack_band_features(x, m.band, m.n_bands)


def relerr(out):
    return np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)


for name, fn in [
    ("chunk2", lambda: run_chunked(xb, dl, 2)[:N, :F]),
    ("chunk4", lambda: run_chunked(xb, dl, 4)[:N, :F]),
    ("pk-deint", lambda: unpermute_features(run_pk(xp, dl, "deint"), F)[:N]),
    ("pk-2hot", lambda: unpermute_features(run_pk(xp, dl, "2hot"), F)[:N]),
]:
    try:
        out = np.asarray(jax.jit(fn)())
        print(f"{name:9s} rel err {relerr(out):.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:9s} FAILED: {str(e)[:300]}", flush=True)

# timing at probe scale
N, E = 65536, 8_000_000
dst = np.sort(rng.integers(0, N, size=E))
src = rng.integers(0, N, size=E)
indptr = np.searchsorted(dst, np.arange(N + 1))
w = rng.random(E).astype(np.float32)
layout = build_banded_layout(indptr, src, w, band=16384, wr=256, et=2048)
dl = DeviceBandedLayout.from_host(layout)
m = layout.meta
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32), jnp.bfloat16)
xb = band_features(x, m.band, m.n_bands)
xp = pack_band_features(x, m.band, m.n_bands)
jax.block_until_ready(xp)


def timeit(fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0 - 0.033)
    return min(ts)


t = timeit(lambda xb, dl: banded_spmm(xb, dl)[0, 0], xb, dl)
print(f"base f32      : {t*1e3:7.1f} ms  {E/t/1e6:7.1f} M edges/s",
      flush=True)
for C in (2, 4):
    t = timeit(lambda xb, dl, C=C: run_chunked(xb, dl, C)[0, 0], xb, dl)
    print(f"chunk{C}        : {t*1e3:7.1f} ms  {E/t/1e6:7.1f} M edges/s",
          flush=True)
for kind in ("deint", "2hot"):
    t = timeit(lambda xp, dl, k=kind: run_pk(xp, dl, k)[0, 0], xp, dl)
    print(f"pk-{kind:9s}: {t*1e3:7.1f} ms  {E/t/1e6:7.1f} M edges/s",
          flush=True)
