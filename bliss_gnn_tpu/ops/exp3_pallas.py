"""Pallas streaming scatter-multiply for the EXP3 arm-weight state.

The per-step bandit update multiplies ~10^5 sparse weights of a [L, E]
bf16 state (345M elements at Reddit scale).  XLA's scatter executes the
update at ~30-36 ns/touch sequentially, and inside the fused step it
additionally materializes a full-buffer copy — measured 15.1 ms/step
(trace op fusion.128, scripts/profile_step.py), by far the largest
non-sampling term.  On top of that, keeping the state FLAT (the only
shape XLA scatters in place) forced the sampler's chunked row gathers to
relayout the whole state every call (2.1 ms, slice_bitcast_fusion).

This kernel replaces both: the state lives as the 3-D grid
``[L, R, 128]`` the sampler wants to gather from (sampling reads
``state[l]`` directly — a free row slice), and the update streams the
state through VMEM tile by tile, applying each tile's updates with
in-kernel dynamic row read-modify-writes (probed exact,
scripts/probe_dynwrite.py):

  - updates arrive as (flat_idx, mult); padded/no-op slots carry
    idx = LIMIT (= L*R*128) and sort to the tail, so the kernel never
    visits them;
  - sort by flat_idx -> each state tile's updates are one contiguous run
    [start[t], end[t]) of the sorted stream; start/end ride as scalar-
    prefetch operands and the sorted streams enter as SMEM blocks whose
    block index start[t]//C comes from the prefetch;
  - each tile reads FOUR adjacent C-blocks of the sorted stream (separate
    SMEM specs, indices start[t]//C + 0..3), covering any run of length
    <= 3C = 12288 regardless of alignment.  Longer runs (a single
    128*T-edge window receiving > 12k updates — beyond any sane capacity
    plan; a dst keeps at most fanout edges) have their tail SKIPPED and
    counted in the returned n_overflow, which the step surfaces as the
    ``exp3_apply_overflow`` metric.  An in-graph lax.cond fallback was
    measured and REJECTED: XLA materializes two full-state copies
    (2 x 2.1 ms) for the cond's buffer unification even when the branch
    never executes.  The CPU/test path applies exactly via the XLA
    scatter either way.

Cost at Reddit scale: one r+w stream of the 690 MB state (~1.7 ms at the
819 GB/s stream rate) + ~10 cy per update, vs 15.1 ms for the XLA
scatter — and the sampler's 2.1 ms relayout disappears because storage
IS the grid.  Duplicate indices compose multiplicatively (sequential
in-tile application), as the DP delta all-gather requires.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# state-tile rows per grid step (tile = T*128 elements) and updates-block
# length; a tile's run must fit N_UBLKS-1 blocks (else tail skipped+counted)
TILE_ROWS = 1024
UBLK = 4096
# test hook: run the kernel under the Pallas interpreter off-TPU
INTERPRET = False


N_UBLKS = 4  # adjacent sorted-stream blocks visible per tile


def _apply_kernel(T: int, C: int, n_tiles: int):
    span = T * 128

    def kern(start_ref, end_ref,  # scalar prefetch [n_tiles]
             i0_ref, i1_ref, i2_ref, i3_ref,  # [C] SMEM sorted flat idx
             m0_ref, m1_ref, m2_ref, m3_ref,  # [C] SMEM f32 multipliers
             st_in_ref,  # [T, 128] bf16 (aliased)
             st_out_ref):
        t = pl.program_id(0)
        st_out_ref[...] = st_in_ref[...]

        # single-row dynamic access is unsupported on bf16 refs (16-sublane
        # min tile); RMW an aligned (16, 128) block — one bf16 vreg — with
        # a 2-D (sublane, lane) one-hot select instead
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
        tile0 = t * span
        b0 = (start_ref[t] // C) * C  # abs position of i0_ref[0]

        for j, (idx_ref, mult_ref) in enumerate(
            [(i0_ref, m0_ref), (i1_ref, m1_ref),
             (i2_ref, m2_ref), (i3_ref, m3_ref)]
        ):
            base = b0 + j * C
            lo = jnp.maximum(start_ref[t] - base, 0)
            hi = jnp.minimum(end_ref[t] - base, C)

            def body(i, _, idx_ref=idx_ref, mult_ref=mult_ref):
                li = idx_ref[i] - tile0
                m = mult_ref[i]
                row = li >> 7
                lane = li & 127
                blk = (row >> 4) * 16  # provable 16-row alignment
                sub = row & 15
                vec = st_out_ref[pl.ds(blk, 16), :].astype(jnp.float32)
                sel = (row_iota == sub) & (lane_iota == lane)
                st_out_ref[pl.ds(blk, 16), :] = jnp.where(
                    sel, vec * m, vec
                ).astype(st_out_ref.dtype)
                return 0

            jax.lax.fori_loop(lo, jnp.maximum(hi, lo), body, 0)

    return kern


def exp3_apply_streaming(
    state: jax.Array,  # [L, R, 128] bf16, R % TILE_ROWS == 0
    flat_idx: jax.Array,  # [U] int32 in [0, L*R*128); no-ops at LIMIT
    mult: jax.Array,  # [U] f32 (value irrelevant on no-op slots)
    interpret: bool = False,
    ublk: int = UBLK,
):
    """state[unravel(flat_idx)] *= mult, streamed; returns (state', n_overflow).

    ``flat_idx`` no-op slots MUST carry LIMIT = L*R*128 (they sort to the
    tail and are never applied).  n_overflow counts SKIPPED updates (a
    tile run longer than N_UBLKS-1 C-blocks — see module docstring); the
    step surfaces it as a metric.
    """
    L, R, _ = state.shape
    assert R % TILE_ROWS == 0, "init_exp3_weights pads R to TILE_ROWS"
    n_tiles = (L * R) // TILE_ROWS
    limit = L * R * 128
    U = flat_idx.shape[0]
    C = ublk

    from bliss_gnn_tpu.ops.gather_pallas import maybe_lut_gather

    order = jnp.argsort(flat_idx)
    # permutation takes ride the LUT gather (2.5 vs 6.6 ns/elem XLA —
    # trace fusion.42/43, ~2 ms/step at the Reddit concat size)
    s_idx = maybe_lut_gather(flat_idx, order)
    s_mult = maybe_lut_gather(mult, order).astype(jnp.float32)
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * (TILE_ROWS * 128)
    pos = jnp.searchsorted(s_idx, bounds, side="left").astype(jnp.int32)
    start, end = pos[:-1], pos[1:]
    # clip runs to what N_UBLKS C-blocks can see; the tail is skipped and
    # counted (see module docstring — beyond any sane capacity plan)
    base = (start // C) * C
    end_clip = jnp.minimum(end, base + N_UBLKS * C)
    n_over = jnp.sum(end - end_clip)

    # pad the streams to full C-blocks: a run can start exactly at
    # position U (no sentinel slots), so block index start//C + N_UBLKS - 1
    # can reach U//C + N_UBLKS - 1 — pad unconditionally to N_UBLKS blocks
    # past U//C (ceil-based padding was one block short when U % C == 0)
    u_pad = (U // C + N_UBLKS) * C
    s_idx_p = jnp.full((u_pad,), limit, jnp.int32).at[:U].set(s_idx)
    s_mult_p = jnp.ones((u_pad,), jnp.float32).at[:U].set(s_mult)

    def blk(j):
        return pl.BlockSpec((C,), lambda t, st, en, j=j: (st[t] // C + j,),
                            memory_space=pltpu.SMEM)

    st2 = state.reshape(L * R, 128)
    st2 = pl.pallas_call(
        _apply_kernel(TILE_ROWS, C, n_tiles),
        out_shape=jax.ShapeDtypeStruct((L * R, 128), state.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=(
                [blk(j) for j in range(N_UBLKS)]
                + [blk(j) for j in range(N_UBLKS)]
                + [pl.BlockSpec((TILE_ROWS, 128), lambda t, st, en: (t, 0),
                                memory_space=pltpu.VMEM)]
            ),
            out_specs=pl.BlockSpec(
                (TILE_ROWS, 128), lambda t, st, en: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        # state operand index: 2 prefetch + 2*N_UBLKS streams
        input_output_aliases={2 + 2 * N_UBLKS: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(start, end_clip,
      *[s_idx_p for _ in range(N_UBLKS)],
      *[s_mult_p for _ in range(N_UBLKS)],
      st2)
    out = st2.reshape(L, R, 128)
    return out, n_over
