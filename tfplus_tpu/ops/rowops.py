"""Pallas row gather/scatter kernels — an OPT-IN alternative path (off by
default; XLA is the hot path).

History and honest numbers (see PERF.md "Hard-sync primitive costs"): the
early "at roofline" measurements of these kernels (~820 GB/s gather /
~590 GB/s scatter) were ASYNC ARTIFACTS — `block_until_ready` returns early
on the axon backend. Hard-synced, the Pallas dynamic-index block pipeline
serializes its DMA queue when composed into real programs (~250 ns/row vs
XLA's ~85 ns/row issue-bound scatter), so composed steps are SLOWER with
these kernels than with plain XLA gather/scatter. That is why they are
opt-in (`TFPLUS_TPU_ENABLE_PALLAS_ROWOPS=1`) and why nothing routes here by
default. Kept as (a) the fallback row-op layer every caller goes through
(`gather_rows`/`scatter_rows` dispatch to jnp), (b) a measured study of the
Pallas DMA pipeline for when Mosaic gains deeper buffering.

A fully-fused gather+update+scatter kernel was benchmarked and REJECTED: with
aliased dynamically-indexed outputs the pipeline must serialize against RAW
hazards (11.5 ms). gather → XLA vector math → scatter is the fast shape.

Replaces the per-key copy loops of the reference engine (FindOrInsertLocally
kv_variable.h:287-380 and the optimizer kernels' row loops).

All functions fall back to jnp on non-TPU backends (tests run the Pallas path
in interpreter mode separately).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FORCE_FALLBACK_ENV = "TFPLUS_TPU_DISABLE_PALLAS"


_ENABLE_ENV = "TFPLUS_TPU_ENABLE_PALLAS_ROWOPS"


def _use_pallas() -> bool:
    """Pallas row ops are OPT-IN (set TFPLUS_TPU_ENABLE_PALLAS_ROWOPS=1).

    Hard-sync profiling on TPU v5e showed the Mosaic pipeline serializes
    dynamically-indexed block DMAs when these kernels are composed inside a
    larger program (≈250 ns/row vs XLA gather's ≈8 ns/row); XLA's gather is
    bandwidth-competitive and its scatter matches the manual-DMA issue-rate
    floor (~85 ns/row), so the XLA path wins in real training steps today.
    The kernels remain for standalone/high-level use and future Mosaic
    pipeline improvements.
    """
    if os.environ.get(_FORCE_FALLBACK_ENV):
        return False
    if not os.environ.get(_ENABLE_ENV):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _safe(idx_ref, i):
    return jnp.maximum(idx_ref[i], 0)


# ---------------------------------------------------------------------------
# gather
# ---------------------------------------------------------------------------

def _gather_kernel(idx_ref, v_ref, o_ref):
    o_ref[:] = v_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_pallas(values: jnp.ndarray, idx: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    c, d = values.shape
    n = idx.shape[0]
    v3 = values.reshape(c, 1, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 1, d), lambda i, r: (_safe(r, i), 0, 0))],
        out_specs=pl.BlockSpec((1, 1, d), lambda i, r: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1, d), values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, v3)
    return out.reshape(n, d)


def gather_rows(values: jnp.ndarray, idx: jnp.ndarray, *,
                interpret: bool = False) -> jnp.ndarray:
    """``values[idx]`` for row tables ([C, D] f32/bf16), idx int32[N].
    Negative idx rows return row 0 — mask downstream."""
    if _use_pallas() or interpret:
        return _gather_pallas(values, idx, interpret=interpret)
    return values[jnp.maximum(idx, 0)]


# ---------------------------------------------------------------------------
# scatter (set / accumulate variants)
# ---------------------------------------------------------------------------

def _scatter_set_kernel(idx_ref, rows_ref, vin_ref, vo_ref):
    i = pl.program_id(0)
    valid = idx_ref[i] >= 0
    vo_ref[:] = jnp.where(valid, rows_ref[:], vin_ref[:])


def _scatter_add_kernel(idx_ref, rows_ref, vin_ref, vo_ref):
    i = pl.program_id(0)
    valid = idx_ref[i] >= 0
    vo_ref[:] = jnp.where(valid, vin_ref[:] + rows_ref[:], vin_ref[:])


@functools.partial(jax.jit, static_argnames=("add", "interpret"))
def _scatter_pallas(values, idx, rows, add: bool = False,
                    interpret: bool = False):
    c, d = values.shape
    n = idx.shape[0]
    v3 = values.reshape(c, 1, d)
    r3 = rows.reshape(n, 1, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 1, d), lambda i, r: (i, 0, 0)),
                  pl.BlockSpec((1, 1, d), lambda i, r: (_safe(r, i), 0, 0))],
        out_specs=pl.BlockSpec((1, 1, d), lambda i, r: (_safe(r, i), 0, 0)),
    )
    out = pl.pallas_call(
        _scatter_add_kernel if add else _scatter_set_kernel,
        out_shape=jax.ShapeDtypeStruct((c, 1, d), values.dtype),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(idx, r3, v3)
    return out.reshape(c, d)


def scatter_rows(values: jnp.ndarray, idx: jnp.ndarray, rows: jnp.ndarray, *,
                 add: bool = False, interpret: bool = False) -> jnp.ndarray:
    """Write (or accumulate) ``rows`` into ``values`` at ``idx``; negative idx
    entries are dropped. In-place when XLA can donate the buffer.

    NOTE: duplicate indices are NOT supported in ``add`` mode on the Pallas
    path (grid steps revisit the block non-deterministically) — callers
    dedup first, which the engine contract already requires.
    """
    if _use_pallas() or interpret:
        return _scatter_pallas(values, idx, rows.astype(values.dtype),
                               add=add, interpret=interpret)
    drop = jnp.where(idx >= 0, idx, values.shape[0])
    # No pre-sort: at the wide-payload layout the argsort + row re-gather
    # costs MORE than it saves (4.09 vs 3.28 ms at 32k x 256 f32, v5e).
    # unique_indices holds by the engine's dedup contract (and a `set` with
    # duplicate indices is last-write-nondeterministic either way).
    rows = rows.astype(values.dtype)
    if add:
        return values.at[drop].add(rows, mode="drop", unique_indices=True)
    return values.at[drop].set(rows, mode="drop", unique_indices=True)
