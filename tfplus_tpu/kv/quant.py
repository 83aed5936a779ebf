"""Int8 row-quantized serving tables — 4× less HBM per vocabulary.

Beyond reference parity (the reference serves float/half at best,
kernels/kv_variable_ops.cc type constraints): an inference-only KvTable
whose payload is symmetric per-row int8 (scale = max|row|/127). Lookups
gather int8 rows and dequantize on the VPU while the table holds 4× the
rows per chip.

The per-row dequant scale lives in the planar header's FREE pad lanes
(48-63 — one 32-bit word per slot), so the probe's bucket gather delivers
it together with keys+meta and the lookup issues exactly as many gathers
as the f32 path (probe + one int8 row gather). The earlier design kept a
separate f32[C] scale array whose narrow per-row gather doubled the
issue cost (54.2M vs 104.0M ids/s — BENCH_r02.json); with the in-header
scale plus miss/blacklist zeroing folded into the scale (one [N] where
instead of a second [N, D] pass) the measured cost is **0.92× the f32
throughput** (round-4 paired-alternation medians with honest RTT-dwarfing
windows: ~43M int8 vs ~47M f32 ids/s, v5e, BENCH_LOCAL.json) — the
residual gap is the int8→f32 convert+scale pass over the gathered rows,
which the f32 path does not pay; int8 additionally holds 4× rows/chip.

Training stays full-precision (optimizer state needs it; the engine's
payload fusion shares one dtype) — quantize AFTER training:

    qt = quant.quantize_table(table)         # or from a serving export
    rows = quant.lookup_or_zeros(qt, ids)    # dequantized f32

The header (keys + packed meta) is shared with KvTable, so `find`,
blacklist-reads-as-zero, and shard routing behave identically.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import hashing
from . import table as kvt


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantKvTable:
    # planar header [C//16, 64]: lanes 0-47 identical to KvTable (keys +
    # packed meta); lanes 48-63 hold the per-row f32 dequant scale
    # (bitcast int32) of the bucket's 16 slots
    header: jnp.ndarray
    payload: jnp.ndarray         # int8[C, D]
    config: kvt.KvConfig = dataclasses.field(metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.header.shape[0] * hashing.BUCKET_SIZE

    @property
    def dim(self) -> int:
        return self.config.dim

    @property
    def scale(self) -> jnp.ndarray:
        """Per-row dequant scale f32[C] — a VIEW materialised from the
        header pad lanes (offline/reconstruction paths only; the lookup hot
        path reads the scale from the probe gather instead)."""
        return jax.lax.bitcast_convert_type(
            kvt._get_all_pad(self.header), jnp.float32)

    @property
    def nbytes(self) -> int:
        return int(self.payload.nbytes + self.header.nbytes)


def quantize_rows(rows: jnp.ndarray):
    """Symmetric per-row int8: ``(q, scale)`` with q = round(v/scale)."""
    absmax = jnp.max(jnp.abs(rows.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(rows.astype(jnp.float32) / scale[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_table(table: kvt.KvTable) -> QuantKvTable:
    """Quantize a trained table for serving (drops optimizer slots — the
    config's slot_layout is cleared so config and payload stay consistent
    for any later reconstruction, e.g. serving delta refresh). The per-row
    scale is written into the header's pad lanes so lookups need no second
    gather."""
    values = table.payload[:, :table.config.dim]
    q, scale = quantize_rows(values)
    cfg = dataclasses.replace(table.config, slot_layout=())
    header = kvt._set_all_pad(
        table.header, jax.lax.bitcast_convert_type(scale, jnp.int32))
    return QuantKvTable(header=header, payload=q, config=cfg)


def lookup_or_zeros(table: QuantKvTable, q: jnp.ndarray,
                    valid: Optional[jnp.ndarray] = None,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Inference gather with on-the-fly dequantization; unknown /
    blacklisted keys read as zeros (same contract as kv.lookup_or_zeros).

    Issue-count parity with the f32 path: the probe's bucket gather brings
    the in-header scale along (``find(want_pad=True)``), so the lookup is
    probe + ONE int8 row gather — no per-row scale gather."""
    # reuse the KvTable probe — it only touches the (shared) header
    view = kvt.KvTable(header=table.header, payload=table.payload,
                       init_pool=table.payload[:1],
                       deleted_keys=jnp.zeros((1, 2), jnp.int32),
                       deleted_count=jnp.zeros((), jnp.int32),
                       deleted_overflow=jnp.zeros((), bool),
                       deleted_seen_train=jnp.zeros((), jnp.int32),
                       deleted_seen_pred=jnp.zeros((), jnp.int32),
                       config=table.config)
    fr = kvt.find(view, q, valid, want_pad=True)
    ok = fr.found & ((fr.meta & kvt.FLAG_BLACKLIST) == 0)
    safe = jnp.where(ok, fr.slot, 0)
    rows_q = jnp.take(table.payload, safe, axis=0)
    scale = jax.lax.bitcast_convert_type(fr.pad, jnp.float32)
    # fold the miss/blacklist zeroing into the per-row scale ([N] work)
    # instead of a second [N, D] where over the dequantized rows
    scale = jnp.where(ok, scale, 0.0)
    return rows_q.astype(dtype) * scale[:, None].astype(dtype)


def max_quant_error(table: kvt.KvTable) -> float:
    """Worst-case absolute dequantization error over live rows (host-side
    diagnostic): ≤ max|row|/254 per element by construction."""
    qt = quantize_table(table)
    occ = kvt.occupied_mask(table)
    deq = qt.payload.astype(jnp.float32) * qt.scale[:, None]
    err = jnp.max(jnp.where(occ[:, None],
                            jnp.abs(deq - table.payload[:, :table.dim]
                                    .astype(jnp.float32)), 0.0))
    return float(jax.device_get(err))
