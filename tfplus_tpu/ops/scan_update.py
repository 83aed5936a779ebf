"""Scan-update — streaming sparse-optimizer application kernel.

Replaces the random gather/scatter optimizer path with ONE sequential pass
over the table: the payload (embedding + slot columns, kv/table.py) and
metadata stream through VMEM in chunks at HBM bandwidth (~590 GB/s measured
on v5e; PERF.md), and each chunk's touched rows are gathered/updated/
scattered **via one-hot matmuls on the MXU** — no per-row scalar loops, no
issue-rate-bound random writes (XLA/DMA random row writes bottom out at
~85 ns/row; a 32k-row scatter costs 2.7 ms while this pass streams half a
GB in the same time).

Algorithm per chunk i of CHUNK rows:
    onehot[r, q] = (sorted_slots[qs_i + q] == base_i + r)     # built by iota
    wide_q  = onehotᵀ @ payload_chunk     (MXU gather: var + slot state)
    new_var_q, new_state_q, blacklist_q = rule.update(...)    # VPU, vectorized
    payload_chunk = payload_chunk·(1−hit) + onehot @ new_wide (MXU scatter)
    meta_chunk: freq += onehot @ counts (saturating), day/touch/blacklist bits

Queries are pre-sorted by slot in XLA so each chunk's queries are one
contiguous span [qstart[i], qstart[i+1]); spans are processed in
MAXQ-wide waves (later waves predicated off unless a chunk is query-dense).

Chosen statically when the touched fraction is high (N ≥ C/32): traffic
∝ capacity, so huge sparse tables keep the scatter path. The rule's jnp
row-update math runs unchanged inside the kernel.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import packing

CHUNK = 512          # table rows per grid step (capped to capacity)
MAXQ = 128           # queries applied per wave (CHUNK // MAXQ waves max)
_MAX_GRADS_BYTES = 64 << 20


# ---------------------------------------------------------------------------
# Calibration-gated auto-routing (PERF.md: the remote compiler shows up to
# 5x run-to-run schedule variance for this kernel, so a static model can't
# be trusted — the gate opens only after MEASURING both paths on the real
# device for this table shape and seeing a robust win).
# ---------------------------------------------------------------------------

_CALIB_CACHE: dict = {}
_WIN_RATIO = 0.8     # scan must beat scatter by >=20% (variance hysteresis)


def _cache_key(capacity: int, width: int, dim: int, n: int) -> tuple:
    import math
    nb = 1 << max(int(math.ceil(math.log2(max(n, 1)))), 0)   # bucket n
    return (capacity, width, dim, nb)


def routed(table, n: int, rule) -> bool:
    """Auto-routing decision for ``opt.apply(use_scan=None)``: True only
    when a prior :func:`calibrate` run for this table shape measured the
    scan kernel robustly faster. Never True off-TPU, for unsuitable
    shapes, for rules needing an extra input, or for non-f32 tables."""
    import jax
    if jax.default_backend() != "tpu":
        return False
    if table.payload.dtype != jnp.float32:
        return False
    if getattr(rule, "needs_extra", False):
        return False
    dim = table.config.dim
    w = table.payload.shape[1]
    if not suitable(table.capacity, n, dim, (w - dim) // dim, False):
        return False
    return _CALIB_CACHE.get(_cache_key(table.capacity, w, dim, n), False)


def calibrate(table, n: int, rule, *, lr=0.01, reps: int = 5) -> dict:
    """Measure scatter-apply vs scan-apply for this table shape on the
    CURRENT device and cache the routing decision (call once outside jit —
    e.g. at table-creation or from bench.py). Returns the measurements.

    Median of ``reps`` hard-synced runs each; scan wins only below
    ``_WIN_RATIO``x the scatter time (remote-compile variance hysteresis,
    PERF.md scan-update section).
    """
    import statistics
    import time
    import jax
    from ..optim.base import SparseOptimizer

    dim = table.config.dim
    w = table.payload.shape[1]
    key = _cache_key(table.capacity, w, dim, n)
    opt = SparseOptimizer(rule) if not isinstance(rule, SparseOptimizer) \
        else rule
    slot_idx = jnp.arange(n, dtype=jnp.int32) % table.capacity
    grads = jnp.ones((n, dim), jnp.float32) * 1e-3

    def _time(fn):
        out = fn(table, slot_idx, grads)          # compile
        jax.device_get(jax.tree_util.tree_leaves(out)[0])[:1]
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(table, slot_idx, grads)
            # hard sync: device_get of real data (block_until_ready can
            # return early on the tunnel backend — CLAUDE.md trap #2)
            jax.device_get(out.payload[0, :1])
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    scatter_fn = jax.jit(lambda t, s, g: opt.apply(t, s, g, lr=lr, step=1,
                                                   use_scan=False))
    scan_fn = jax.jit(lambda t, s, g: opt.apply(t, s, g, lr=lr, step=1,
                                                use_scan=True))
    t_scatter = _time(scatter_fn)
    t_scan = _time(scan_fn)
    win = t_scan < _WIN_RATIO * t_scatter
    _CALIB_CACHE[key] = bool(win)
    return {"scatter_s": t_scatter, "scan_s": t_scan, "use_scan": bool(win),
            "key": key}


def suitable(capacity: int, n: int, dim: int, slot_width: int,
             has_extra: bool) -> bool:
    """Static routing decision: scan wins when the batch touches a
    meaningful fraction of the table and grads fit in VMEM."""
    if has_extra:
        return False
    if n * dim * 4 > _MAX_GRADS_BYTES:
        return False
    if capacity < CHUNK or capacity % CHUNK:
        return False
    # scan traffic ≈ 2*C*(1+k)*D*4 bytes @ ~590GB/s; scatter ≈ N*(0.02+rowbytes*3e-4) µs
    scan_ms = 2 * capacity * (1 + slot_width) * dim * 4 / 590e6
    row_bytes = dim * 4
    scatter_ms = n * (0.02 + 3.0e-4 * row_bytes * (1 + slot_width)) / 1e3 \
        + n * 8e-6  # gathers
    return scan_ms < scatter_ms


def _kernel(qstart_ref,                 # SMEM int32[G+1]
            scalars_ref,                # SMEM f32[8]: lr, step, day, thr
            slots_ref,                  # VMEM int32[1, N] sorted slots
            counts_ref,                 # VMEM f32[1, N] per-slot counts
            grads_ref,                  # VMEM f32[N, D] sorted grads
            p_ref, meta_ref,            # blocks: (CHUNK, W), (1,1,CHUNK) u32
            po_ref, mo_ref,
            *, rule, dim, slot_width, chunk, num_waves):
    i = pl.program_id(0)
    base = i * chunk
    q0 = qstart_ref[i]
    q1 = qstart_ref[i + 1]
    lr = scalars_ref[0]
    step = scalars_ref[1].astype(jnp.int32)
    day = scalars_ref[2].astype(jnp.int32).astype(jnp.uint32)
    thr = scalars_ref[3]

    po_ref[...] = p_ref[...]
    mo_ref[0, 0] = meta_ref[0, 0]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, MAXQ), 0) + base

    # wave windows are 128-aligned (vector loads at dynamic lane offsets
    # must be multiples of 128); lanes outside [q0, q1) are masked off
    a0 = (q0 // MAXQ) * MAXQ

    def wave(w):
        qs = pl.multiple_of(a0 + w * MAXQ, MAXQ)

        @pl.when(qs < q1)
        def _():
            qidx = qs + jax.lax.broadcasted_iota(jnp.int32, (1, MAXQ), 1)
            active = (qidx >= q0) & (qidx < q1)
            # slots for this wave (inactive lanes -> -1, matches nothing)
            wslots = jnp.where(active, slots_ref[0:1, pl.ds(qs, MAXQ)], -1)
            wcounts = jnp.where(active, counts_ref[0:1, pl.ds(qs, MAXQ)], 0.0)
            onehot = (row_ids == wslots).astype(jnp.float32)   # [CHUNK, MAXQ]
            hit = jnp.sum(onehot, axis=1, keepdims=True)        # [CHUNK, 1]

            meta_now = mo_ref[0, 0]
            freq_f = (meta_now & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)

            # gather full payload rows + per-row meta via MXU
            wide_q = jax.lax.dot_general(
                onehot, po_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [MAXQ, W]
            freq_q = jax.lax.dot_general(
                onehot, freq_f[:, None], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, 0]       # [MAXQ]
            black_f = ((meta_now >> 29) & jnp.uint32(1)).astype(jnp.int32).astype(jnp.float32)
            black_qf = jax.lax.dot_general(
                onehot, black_f[:, None], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [MAXQ, 1]
            var_q = wide_q[:, :dim] * (1.0 - black_qf)
            if slot_width:
                state_q = wide_q[:, dim:]
            else:
                state_q = jnp.zeros((MAXQ, 0), jnp.float32)

            wgrads = grads_ref[pl.ds(qs, MAXQ)]
            new_var, new_state, bl = rule.update(var_q, state_q, wgrads,
                                                 lr=lr, step=step)
            # frequency filter: freq < enter_threshold rows keep old values
            # (all masks kept as f32 — Mosaic can't widen bool minor dims)
            skip_f = jnp.where((freq_q < thr) & (thr > 0.0), 1.0, 0.0)[:, None]
            new_var = var_q * skip_f + new_var * (1.0 - skip_f)
            if slot_width:
                new_state = state_q * skip_f + new_state * (1.0 - skip_f)
                new_wide = jnp.concatenate([new_var, new_state], axis=1)
            else:
                new_wide = new_var
            if bl is None:
                bl_f = jnp.zeros((MAXQ, 1), jnp.float32)
            else:
                bl_f = jnp.where(bl, 1.0, 0.0)[:, None] * (1.0 - skip_f)

            valid_f = jnp.where(active, 1.0, 0.0).reshape(MAXQ, 1)
            sel = (hit > 0).astype(jnp.float32)                 # [CHUNK, 1]
            po_ref[...] = po_ref[...] * (1.0 - sel) + jax.lax.dot(
                onehot, new_wide * valid_f,
                preferred_element_type=jnp.float32)

            # --- metadata: freq += counts (saturated), day refresh, touch,
            #     blacklist bit from the rule -----------------------------
            add = jax.lax.dot(onehot, wcounts.reshape(MAXQ, 1),
                              preferred_element_type=jnp.float32)[:, 0]
            freq_new = jnp.minimum(freq_f + add, 65535.0)
            bl_dense = jax.lax.dot(onehot, bl_f,
                                   preferred_element_type=jnp.float32)[:, 0] > 0.5
            selr = sel[:, 0] > 0
            day_keep = (meta_now >> 16) & jnp.uint32(0x1FFF)
            flags_keep = meta_now >> 29
            day_new = jnp.where(selr, day & jnp.uint32(0x1FFF), day_keep)
            # flags: bit29 blacklist, bit30 touch_train, bit31 touch_pred
            flags_new = jnp.where(
                selr,
                (jnp.where(bl_dense, jnp.uint32(1), jnp.uint32(0))
                 | jnp.uint32(6)),                    # touch both lists
                flags_keep)
            mo_ref[0, 0] = (freq_new.astype(jnp.int32).astype(jnp.uint32)
                            | (day_new << 16) | (flags_new << 29))

    for w in range(num_waves):
        wave(w)


def scan_apply(payload, meta, slot_idx, grads, counts, rule, *, dim,
               lr, step, day, enter_threshold: int,
               interpret: bool = False):
    """Streaming optimizer application over the table payload
    (``[C, W]``: embedding columns then ONE slot segment — multi-slot
    layouts are not supported here). ``slot_idx`` int32[N] (−1 skip),
    ``grads`` [N, D]; ``meta`` is the packed word (utils/packing.py).

    Returns (payload, meta).
    """
    if payload.dtype != jnp.float32:
        # the payload out_shape is aliased to the input (in-place update),
        # so the kernel cannot change its dtype; the in-kernel math is f32
        raise ValueError(
            f"scan_apply supports float32 payloads only, got {payload.dtype}"
            " — use the gather/scatter path for bf16 tables")
    c, w_cols = payload.shape
    n = slot_idx.shape[0]
    slot_width = (w_cols - dim) // dim
    chunk = min(CHUNK, c)
    g = c // chunk

    clean = jnp.where(slot_idx >= 0, slot_idx, c)
    order = jnp.argsort(clean)
    sorted_slots = clean[order]
    grads_sorted = grads[order].astype(jnp.float32)
    counts_sorted = (jnp.ones((n,), jnp.float32) if counts is None
                     else counts[order].astype(jnp.float32))
    qstart = jnp.searchsorted(sorted_slots,
                              jnp.arange(0, c + 1, chunk, dtype=jnp.int32)
                              ).astype(jnp.int32)
    # pad so in-kernel dynamic slices of width MAXQ never run off the end
    pad = MAXQ
    sorted_slots = jnp.concatenate(
        [sorted_slots, jnp.full((pad,), c, jnp.int32)])
    grads_sorted = jnp.concatenate(
        [grads_sorted, jnp.zeros((pad, dim), jnp.float32)])
    counts_sorted = jnp.concatenate(
        [counts_sorted, jnp.zeros((pad,), jnp.float32)])
    n_pad = n + pad

    word = meta.reshape(g, 1, chunk)
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(step, jnp.float32),
        jnp.asarray(day, jnp.float32),
        jnp.asarray(enter_threshold, jnp.float32),
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)])

    kernel = functools.partial(_kernel, rule=rule, dim=dim,
                               slot_width=slot_width, chunk=chunk,
                               num_waves=max(chunk // MAXQ, 1) + 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),            # slots [1,N]
            pl.BlockSpec(memory_space=pltpu.VMEM),            # counts [1,N]
            pl.BlockSpec(memory_space=pltpu.VMEM),            # grads [N,D]
            pl.BlockSpec((chunk, w_cols), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((chunk, w_cols), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, *_: (i, 0, 0)),
        ],
        )
    po, vm = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c, w_cols), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, chunk), jnp.uint32),
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(qstart, scalars, sorted_slots.reshape(1, n_pad),
      counts_sorted.reshape(1, n_pad), grads_sorted,
      payload, word)

    return po, vm.reshape(c)
