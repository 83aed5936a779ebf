"""Monotonic-run Pallas compactor — the parked log-structured-payload
kernel (PERF.md "Log-structured payload" study; round-3 verdict #4:
win-or-document).

Problem: compact the live rows of an append arena ``A[M, W]`` into a dense
prefix, preserving order. Live rows are index-sorted by construction (the
arena is append-only), so the permutation is MONOTONE — unlike XLA's
general permute-gather (issue-bound, ~28 ns/row = 42 ms at 1.5M rows),
the copy can stream: read the arena once sequentially, place each input
block's live rows with an exact one-hot f32 matmul (every output row is
0·x + … + 1·x_src — bit-exact), and emit dense output blocks through a
monotone dynamic output index map.

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

The kernel returns the packed rows; the caller's slot→arena indirection
update (narrow int32 scatter) is ordinary XLA (measured 0.71 ms/32k —
PERF.md). Decision record: scripts/prof_compactor.py + PERF.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _kernel(out_start_ref, arena_ref, live_ref, out_ref, carry_ref, *,
            R: int, nblk: int):
    i = pl.program_id(0)
    os_i = out_start_ref[jnp.minimum(i, nblk)]
    o = _out_index(i, out_start_ref, R, nblk)
    base = o * R

    live_row = jnp.where(i < nblk, live_ref[0, :], 0)       # [R] int32
    excl = jnp.cumsum(live_row) - live_row
    dst = (os_i - base) + excl                               # [R], < 2R

    rows = arena_ref[:]                                      # [R, W]
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    is_live = live_row[None, :] > 0
    sel_cur = (iota == dst[None, :]) & is_live & (dst[None, :] < R)
    sel_nxt = (iota == (dst[None, :] - R)) & is_live & (dst[None, :] >= R)
    f32 = jnp.float32
    contrib = jax.lax.dot(sel_cur.astype(f32), rows,
                          preferred_element_type=f32)
    nxt = jax.lax.dot(sel_nxt.astype(f32), rows,
                      preferred_element_type=f32)

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
    ``new_loc[j]`` is live row j's packed position (undefined for dead
    rows — callers scatter it only at live slots). ``out_rows`` defaults
    to M (allocation, not traffic)."""
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

    live_i = live.astype(jnp.int32)
    new_loc = jnp.cumsum(live_i) - live_i                    # [M]
    counts = live_i.reshape(nblk, R).sum(axis=1)
    out_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk + 1,),
        in_specs=[
            pl.BlockSpec((R, W),
                         lambda i, s: (jnp.minimum(i, nblk - 1), 0)),
            pl.BlockSpec((1, R),
                         lambda i, s: (jnp.minimum(i, nblk - 1), 0)),
        ],
        out_specs=pl.BlockSpec(
            (R, W), lambda i, s: (_out_index(i, s, R, nblk), 0)),
        scratch_shapes=[pltpu.VMEM((R, W), jnp.float32)],
    )
    packed = pl.pallas_call(
        functools.partial(_kernel, R=R, nblk=nblk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, W), jnp.float32),
        interpret=interpret,
    )(out_start, arena.astype(jnp.float32), live_i.reshape(nblk, R))
    return packed, new_loc


def compact_reference(arena, live, out_rows=None):
    """XLA permute-gather baseline (what the study measured at 42 ms /
    1.5M rows) — also the correctness oracle for the kernel."""
    M, W = arena.shape
    out_rows = out_rows or M
    live_i = live.astype(jnp.int32)
    new_loc = jnp.cumsum(live_i) - live_i
    idx = jnp.where(live, new_loc, out_rows)
    packed = jnp.zeros((out_rows, W), arena.dtype).at[idx].set(
        arena, mode="drop")
    return packed, new_loc
