"""Pallas LUT gather: out[i] = lut[idx[i]] for arbitrary per-edge indices.

The sampler's per-edge "SDDMM u->e" ops — keep-mask lookup sel[src_gid[e]],
candidate relabeling pos_of_gid[src_gid[e]], the block-build takes of
frontier-indexed arrays by the kept-edge index list — lower to XLA scalar
gathers at ~6-29 ns/element on TPU (measured; they dominate the fused
sampling step at multi-million-edge frontier capacities).  This kernel
keeps the whole LUT resident in VMEM as a [ceil(N/128), 128] grid and, per
edge, copies the 128-lane row containing the target (the (1, 128) dynamic
row slice hits Mosaic's fast path, ~1.7 cycles — see
scripts/probe_gather.py) then selects the lane with a vectorized one-hot
reduce: ~2.3 ns/edge measured, 3-10x the XLA path.

Two element types share the kernel body:
- f32 (floats/bool/bf16 LUTs travel as f32);
- int32 (EXACT — the one-hot select runs in integer arithmetic, so values
  above 2^24, e.g. global edge ids or csc_indptr offsets, survive).

Constraints (same probing as ops/spmm_pallas.py):
- indices must be read from SMEM for the row computation AND be available
  as a VMEM vector for the lane select -> idx is passed twice;
- SMEM int32 blocks need >=1024-element tiles -> edge tile et=2048;
- LUT must fit in VMEM: N <= ~24M 4-byte entries (96 MB).  Callers fall
  back to jnp.take above that (maybe_lut_gather routes automatically).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident LUT (v5e has ~128 MB/core; leave room for
# the edge tiles and scratch)
MAX_LUT_ELEMS = 24 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def maybe_lut_gather(lut: jax.Array, idx: jax.Array,
                     n_valid: jax.Array | None = None) -> jax.Array:
    """lut_gather on TPU when the LUT fits VMEM and the kernel overhead is
    amortized; jnp.take otherwise.  Output dtype follows the LUT.  Integer
    and boolean LUTs route through the exact int32 kernel (no f32
    round-trip), so arbitrary int32 values — global edge ids, indptr
    offsets — are safe.  ``n_valid``: see lut_gather."""
    use = (
        jax.default_backend() == "tpu"
        and lut.shape[0] <= MAX_LUT_ELEMS
        # probed break-even (r5, chained K=256 distinct-input timing at
        # the l1 block-build shape, 22784 idx from a 958k LUT): the
        # kernel runs 1.57 ns/idx vs XLA take's 5.75 — 3.7x — so the old
        # 1<<16 gate left the l1 block-build gathers on the slow path
        and idx.shape[0] >= 1 << 14
    )
    if not use:
        return jnp.take(lut, idx)
    # flat2d: [M//128, 128]-tiled output reshaped back — consumers read it
    # without the XLA relayout of the [M, 1] column (22% faster end-to-end
    # on a 2.4M keep-mask lookup, scripts/probe_kernel_v2.py)
    if lut.dtype == jnp.bool_:
        # 0/1 values are bf16-exact -> the MXU-select kernel applies: no
        # [M, 1] relayout operand at all, 1.31x the base kernel at the
        # keep-mask shape (scripts/probe_lut_mxusel.py)
        out = lut_gather(lut.astype(jnp.float32), idx,
                         elem_dtype=jnp.float32, mxusel=True,
                         n_valid=n_valid)
        return out != 0
    if jnp.issubdtype(lut.dtype, jnp.integer):
        out = lut_gather(lut.astype(jnp.int32), idx, elem_dtype=jnp.int32,
                         flat2d=True, n_valid=n_valid)
        return out.astype(lut.dtype)
    out = lut_gather(lut.astype(jnp.float32), idx, elem_dtype=jnp.float32,
                     flat2d=True, n_valid=n_valid)
    return out.astype(lut.dtype)


def maybe_lut_gather_multi(luts, idx: jax.Array,
                           n_valid: jax.Array | None = None):
    """K gathers sharing one index list.

    Currently per-field passes: an interleaved-LUT kernel (K fields of an
    entry packed in one 128-lane row, one row copy serving all K) was
    built and probed on v5e (2026-08-20) and LOST — with a 3M-entry LUT
    and 2M sorted indices the single-field kernel runs at 0.99 ns/idx, the
    K=8 interleaved variant at 1.82 ns/FIELD (9.1 ns/idx): the one-hot
    lane select, not the row copy, dominates at these sizes, and select
    work scales per extracted field (a grouped-reduction select that would
    amortize it hits Mosaic's 'unsupported shape cast' on [et, 128] ->
    [et, 128/K, K]).  Callers still use this entry point so a future
    select-efficient variant can slot in."""
    return [maybe_lut_gather(l, idx, n_valid=n_valid) for l in luts]


def _lut_gather_kernel_roll(et: int, unroll: int):
    """Roll-variant: each copied row is lane-ROTATED so slot s's wanted
    element lands at lane s%128; extraction is then a diagonal mask-reduce
    of static [128, 128] sub-blocks.  This removes the [M, 1] index-column
    operand of the base kernel — [M, 1] tiled T(8,128) is physically
    ~128x padded and its production cost 2.9 ms/sample call at Reddit
    scale (trace copy.11/copy.52) — and the in-kernel one-hot compare
    with it."""

    def kernel(idx_smem, lut_ref, out_ref, msgs_ref):
        def body(i, _):
            base = i * unroll
            for j in range(unroll):
                s = base + j
                v = idx_smem[s]
                row = lut_ref[pl.ds(v >> 7, 1), :]
                # land lane (v & 127) at lane (s & 127)
                msgs_ref[pl.ds(s, 1), :] = pltpu.roll(
                    row, (s & 127) - (v & 127), 1
                )
            return 0

        jax.lax.fori_loop(0, et // unroll, body, 0)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        )
        for r in range(et // 128):
            blk = msgs_ref[r * 128 : (r + 1) * 128, :]
            out_ref[r : r + 1, :] = jnp.sum(
                jnp.where(eye, blk, 0), axis=0, keepdims=True
            )

    return kernel


def _lut_gather_kernel_mxusel(et: int, unroll: int):
    """MXU-select variant: idx arrives ONLY as the SMEM stream plus its
    natural [et//128, 128] 2-D view (a pure bitcast of the 1-D T(1024)
    stream — NO [M, 1] relayout copy operand, which costs ~2.5 ms/step
    at the Reddit refit caps, trace copy.11/copy.26).  Lane extraction
    runs per 128-row sub-block as one bf16 MXU contraction
    msgs[128, 128] @ onehot[128, 128] (onehot[l, j] = (idx_row[j] == l))
    followed by a diagonal mask-reduce — the matmul performs the
    lane->sublane transpose the VPU cannot do cheaply.  EXACT only for
    LUT values representable in bf16 (the keep masks' 0/1) — callers
    gate via bf16_exact."""

    def kernel(nv_ref, idx_smem, idx2d_ref, lut_ref, out_ref, msgs_ref):
        t = pl.program_id(0)

        def live():
            def body(i, _):
                base = i * unroll
                for j in range(unroll):
                    msgs_ref[pl.ds(base + j, 1), :] = lut_ref[
                        pl.ds(idx_smem[base + j] >> 7, 1), :
                    ]
                return 0

            jax.lax.fori_loop(0, et // unroll, body, 0)
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            eye = sub_iota == jax.lax.broadcasted_iota(
                jnp.int32, (128, 128), 1
            )
            for r in range(et // 128):
                mb = msgs_ref[r * 128 : (r + 1) * 128, :].astype(
                    jnp.bfloat16
                )
                row = idx2d_ref[r : r + 1, :] & 127  # (1, 128) lane-major
                onehot = (sub_iota == row).astype(jnp.bfloat16)
                prod = jnp.dot(mb, onehot,
                               preferred_element_type=jnp.float32)
                out_ref[r : r + 1, :] = jnp.sum(
                    jnp.where(eye, prod, 0.0), axis=0, keepdims=True
                ).astype(out_ref.dtype)

        @pl.when(t * et < nv_ref[0])
        def _():
            live()

        @pl.when(t * et >= nv_ref[0])
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

    return kernel


def _lut_gather_kernel(et: int, unroll: int, flat2d: bool = False):
    def kernel(nv_ref, idx_smem, idx_col, lut_ref, out_ref, msgs_ref):
        t = pl.program_id(0)

        def live():
            def body(i, _):
                base = i * unroll
                for j in range(unroll):
                    msgs_ref[pl.ds(base + j, 1), :] = lut_ref[
                        pl.ds(idx_smem[base + j] >> 7, 1), :
                    ]
                return 0

            jax.lax.fori_loop(0, et // unroll, body, 0)
            rel = idx_col[:, 0] & 127  # [et] sublane-major
            lanes = jax.lax.broadcasted_iota(jnp.int32, (et, 128), 1)
            onehot = (lanes == rel[:, None]).astype(msgs_ref.dtype)
            col = jnp.sum(msgs_ref[:] * onehot, axis=1, keepdims=not flat2d)
            if flat2d:
                # emit [et//128, 128] tiles: the in-kernel relayout spares
                # the consumer an XLA copy of the pathological [M, 1]
                # column layout (measured 1.9 ms on a 2.4M-slot frontier,
                # scripts/probe_lut_layout.py)
                out_ref[:, :] = col.reshape(et // 128, 128)
            else:
                out_ref[:, :] = col

        # dynamic tail skip (see scatter_pallas._kernel): tiles wholly past
        # the caller's contiguous valid prefix zero-fill instead of paying
        # the sequential row-copy chain
        @pl.when(t * et < nv_ref[0])
        def _():
            live()

        @pl.when(t * et >= nv_ref[0])
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

    return kernel


@partial(
    jax.jit,
    static_argnames=("interpret", "et", "unroll", "elem_dtype", "flat2d",
                     "roll", "mxusel"),
)
def lut_gather(
    lut: jax.Array,  # [N] f32 or int32 lookup table
    idx: jax.Array,  # [M] int32 indices into [0, N)
    interpret: bool = False,
    et: int = 2048,
    unroll: int = 32,
    elem_dtype=jnp.float32,
    flat2d: bool = False,
    roll: bool = False,
    n_valid: jax.Array | None = None,
    mxusel: bool = False,
) -> jax.Array:
    """out[i] = lut[idx[i]] in ``elem_dtype`` (f32 or int32 — int32 is
    exact).  M is padded to a tile multiple internally; indices must be
    in-range (mask upstream).  ``flat2d`` emits [et//128, 128] tiles and
    reshapes back — spares consumers the XLA relayout of the [M, 1]
    column.  ``n_valid``: dynamic contiguous-prefix bound — tiles wholly
    past it zero-fill instead of gathering (outputs there are masked by
    every caller)."""
    n = lut.shape[0]
    m = idx.shape[0]
    assert n <= MAX_LUT_ELEMS, f"LUT of {n} too large for VMEM residency"
    lut2d = jnp.zeros((_round_up(n, 128) // 128, 128), elem_dtype)
    lut2d = lut2d.reshape(-1).at[:n].set(lut.astype(elem_dtype))
    lut2d = lut2d.reshape(-1, 128)
    mp = _round_up(m, et)
    idx_p = jnp.zeros(mp, jnp.int32).at[:m].set(idx.astype(jnp.int32))
    n_tiles = mp // et
    unroll = math.gcd(unroll, et)
    if mxusel:
        if n_valid is None:
            nv = jnp.full((1,), mp, jnp.int32)
        else:
            nv = jnp.minimum(jnp.asarray(n_valid, jnp.int32), mp).reshape(1)
        out = pl.pallas_call(
            _lut_gather_kernel_mxusel(et, unroll),
            out_shape=jax.ShapeDtypeStruct((mp // 128, 128), elem_dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((et,), lambda i, nv: (i,),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((et // 128, 128), lambda i, nv: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # whole LUT
                ],
                out_specs=pl.BlockSpec((et // 128, 128),
                                       lambda i, nv: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((et, 128), elem_dtype)],
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=interpret,
        )(nv, idx_p, idx_p.reshape(mp // 128, 128), lut2d)
        return out.reshape(-1)[:m]
    if roll:
        out = pl.pallas_call(
            _lut_gather_kernel_roll(et, unroll),
            out_shape=jax.ShapeDtypeStruct((mp // 128, 128), elem_dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((et,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole LUT
            ],
            out_specs=pl.BlockSpec((et // 128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((et, 128), elem_dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=interpret,
        )(idx_p, lut2d)
        return out.reshape(-1)[:m]
    kernel = _lut_gather_kernel(et, unroll, flat2d)
    if flat2d:
        out_shape = jax.ShapeDtypeStruct((mp // 128, 128), elem_dtype)
        out_specs = pl.BlockSpec((et // 128, 128), lambda i, nv: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((mp, 1), elem_dtype)
        out_specs = pl.BlockSpec((et, 1), lambda i, nv: (i, 0),
                                 memory_space=pltpu.VMEM)
    if n_valid is None:
        nv = jnp.full((1,), mp, jnp.int32)
    else:
        nv = jnp.minimum(jnp.asarray(n_valid, jnp.int32), mp).reshape(1)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((et,), lambda i, nv: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((et, 1), lambda i, nv: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole LUT
            ],
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((et, 128), elem_dtype)],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nv, idx_p, idx_p[:, None], lut2d)
    if flat2d:
        return out.reshape(-1)[:m]
    return out[:m, 0]
