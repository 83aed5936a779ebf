"""Monotonic-run Pallas compactor — the parked log-structured-payload
kernel (PERF.md "Log-structured payload" study; round-3 verdict #4:
win-or-document).

Problem: compact the live rows of an append arena ``A[M, W]`` into a dense
prefix, preserving order. Live rows are index-sorted by construction (the
arena is append-only), so the permutation is MONOTONE — unlike XLA's
general permute-gather (issue-bound per row; measured 25.8 ms at 1.5M rows
in the round-4 session), the copy can stream: read the arena once
sequentially, place each input block's live rows with an exact one-hot f32
matmul (every output row is 0·x + … + 1·x_src — bit-exact), and emit dense
output blocks through a monotone dynamic output index map.

Mechanics per grid step i (input block of R rows):
  * scalar-prefetched ``out_start[i]`` (prefix sum of live counts at block
    boundaries) gives this block's first output position; the OUTPUT block
    index ``out_start[i] // R`` is non-decreasing and advances by ≤1, so
    Pallas's revisit-accumulate pattern applies.
  * rows whose local destination falls past the current output block land
    in a VMEM carry block; when the output index advances the carry is the
    new block's prefix (destinations can overrun by < R rows, so one carry
    block always suffices).
  * one extra grid step flushes the final carry.
  * the per-row packed position (``new_loc``, the slot→arena indirection
    update) falls out of the same pass as a second int32 output — the
    engine never needs a full-arena cumsum on the host side (TPU 1-D
    cumsum over 1.5M rows measured 3.1 ms; per-block sums + a 12k cumsum
    are ~free).

The TPU tiling constraint (last two block dims divisible by (8, 128))
forbids (1, R) mask blocks, so the live mask and the loc output move in
(8, R) superblocks: step i uses row ``i % 8`` of superblock ``i // 8``,
selected/written with iota masks (no dynamic sublane indexing).

Decision record: scripts/prof_compactor.py + PERF.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LB = 8      # live/loc superblock rows (sublane tiling quantum)


def _out_index(i, s, R, nblk):
    """Output block for grid step i — shared by the kernel and the output
    BlockSpec index map so the flush decision and the resident block always
    agree. Regular steps: the block holding the step's first output row.
    The final flush step: the block holding the LAST output row, clamped to
    never step backwards (all-dead tails) — if the carry is empty this
    equals the previous step's block and the step is a no-op."""
    reg = s[jnp.minimum(i, nblk - 1)] // R
    fin = jnp.maximum(jnp.maximum(s[nblk] - 1, 0) // R, s[nblk - 1] // R)
    return jnp.where(i >= nblk, fin, reg)


def _kernel(out_start_ref, arena_ref, live_ref, out_ref, loc_ref,
            carry_ref, *, R: int, nblk: int):
    i = pl.program_id(0)
    ic = jnp.minimum(i, nblk - 1)              # clamped input step
    os_i = out_start_ref[jnp.minimum(i, nblk)]
    o = _out_index(i, out_start_ref, R, nblk)
    base = o * R

    # select row (ic % _LB) of the live superblock with an iota mask
    sub = ic % _LB
    rows8 = live_ref[:]                                       # [_LB, R]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (_LB, R), 0)
    live_row = jnp.sum(jnp.where(lane8 == sub, rows8, 0), axis=0)
    live_row = jnp.where(i < nblk, live_row, 0)               # [R] int32
    # exclusive prefix count via a strictly-lower-triangular matmul —
    # Mosaic has no cumsum primitive; counts are < R so f32 is exact
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    iotc = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    tri = (iotc < iota).astype(jnp.float32)                  # [out, in]
    excl = jax.lax.dot(
        tri, live_row.astype(jnp.float32)[:, None],
        preferred_element_type=jnp.float32)[:, 0].astype(jnp.int32)
    dst = (os_i - base) + excl                                # [R], < 2R

    rows = arena_ref[:]                                       # [R, W]
    is_live = live_row[None, :] > 0
    sel_cur = (iota == dst[None, :]) & is_live & (dst[None, :] < R)
    sel_nxt = (iota == (dst[None, :] - R)) & is_live & (dst[None, :] >= R)
    f32 = jnp.float32
    # HIGHEST precision: the MXU's default precision bf16-rounds f32
    # inputs (caught by the hardware exactness check) and one-hot
    # placement must move rows bit-exactly — optimizer state rides in
    # these bytes. (Per-operand precision — the selector is 0/1 and
    # bf16-exact, only the rows side needs the multi-pass split — would
    # roughly halve the MXU work, but Mosaic rejects it:
    # "Per-operand dot precision unsupported", round-4 measurement.)
    hi = jax.lax.Precision.HIGHEST
    contrib = jax.lax.dot(sel_cur.astype(f32), rows,
                          preferred_element_type=f32, precision=hi)
    nxt = jax.lax.dot(sel_nxt.astype(f32), rows,
                      preferred_element_type=f32, precision=hi)

    # per-row packed position (global) — dead rows write 0
    loc_row = jnp.where((live_row > 0) & (i < nblk), os_i + excl, 0)
    loc_add = jnp.where(lane8 == sub, loc_row[None, :], 0)

    # first VISIT of a loc superblock initializes it; the extra flush step
    # (i == nblk) clamps to the last superblock and must accumulate (zeros),
    # never re-init — even when nblk % _LB == 0 makes i % _LB == 0 there
    @pl.when((i % _LB == 0) & (i < nblk))
    def _init_loc():
        loc_ref[:] = loc_add

    @pl.when((i % _LB != 0) | (i >= nblk))
    def _acc_loc():
        loc_ref[:] = loc_ref[:] + loc_add

    @pl.when(i == 0)
    def _init():
        out_ref[:] = contrib
        carry_ref[:] = nxt

    @pl.when(i > 0)
    def _step():
        o_prev = _out_index(i - 1, out_start_ref, R, nblk)

        @pl.when(o != o_prev)
        def _new_block():                       # carry is this block's head
            out_ref[:] = carry_ref[:] + contrib
            carry_ref[:] = nxt

        @pl.when(o == o_prev)
        def _same_block():
            out_ref[:] = out_ref[:] + contrib
            carry_ref[:] = carry_ref[:] + nxt


@functools.partial(jax.jit, static_argnames=("block_rows", "out_rows",
                                             "interpret"))
def compact(arena: jnp.ndarray, live: jnp.ndarray, *,
            block_rows: int = 128, out_rows: int | None = None,
            interpret: bool = False):
    """Pack ``arena``'s live rows into a dense prefix, preserving order.

    Returns ``(packed [out_rows, W], new_loc [M] int32)`` where
    ``packed[:n_live]`` are the live rows in arena order and
    ``new_loc[j]`` is live row j's packed position (0 for dead rows —
    callers scatter it only at live slots). ``out_rows`` defaults to M
    (allocation, not traffic)."""
    M, W = arena.shape
    R = block_rows
    if M % R:
        raise ValueError(f"arena rows {M} must divide block_rows {R}")
    if W % 128:
        raise ValueError(f"row width {W} must be a multiple of 128 lanes")
    nblk = M // R
    out_rows = out_rows or M
    if out_rows % R:
        raise ValueError("out_rows must divide block_rows")
    nsup = -(-nblk // _LB)                     # live/loc superblocks

    live_i = live.astype(jnp.int32).reshape(nblk, R)
    counts = live_i.sum(axis=1)
    out_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]).astype(jnp.int32)
    live_pad = jnp.zeros((nsup * _LB, R), jnp.int32).at[:nblk].set(live_i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk + 1,),
        in_specs=[
            pl.BlockSpec((R, W),
                         lambda i, s: (jnp.minimum(i, nblk - 1), 0)),
            pl.BlockSpec((_LB, R),
                         lambda i, s: (jnp.minimum(i, nblk - 1) // _LB, 0)),
        ],
        out_specs=[
            pl.BlockSpec((R, W), lambda i, s: (_out_index(i, s, R, nblk), 0)),
            pl.BlockSpec((_LB, R),
                         lambda i, s: (jnp.minimum(i, nblk - 1) // _LB, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((R, W), jnp.float32)],
    )
    packed, loc = pl.pallas_call(
        functools.partial(_kernel, R=R, nblk=nblk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((out_rows, W), jnp.float32),
                   jax.ShapeDtypeStruct((nsup * _LB, R), jnp.int32)],
        interpret=interpret,
    )(out_start, arena.astype(jnp.float32), live_pad)
    return packed, loc[:nblk].reshape(M)


def compact_reference(arena, live, out_rows=None):
    """XLA permute-gather baseline (measured 25.8 ms / 1.5M rows, round-4
    session) — also the correctness oracle for the kernel."""
    M, W = arena.shape
    out_rows = out_rows or M
    live_i = live.astype(jnp.int32)
    new_loc = jnp.cumsum(live_i) - live_i
    idx = jnp.where(live, new_loc, out_rows)
    packed = jnp.zeros((out_rows, W), arena.dtype).at[idx].set(
        arena, mode="drop")
    return packed, new_loc
