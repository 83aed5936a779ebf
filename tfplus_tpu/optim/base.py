"""SparseOptimizer — applies a row-update rule to a KvTable's touched rows.

TPU-native replacement for the reference's per-key locked optimizer kernels
(training_ops.cc: per key → write-lock → FindOrInsertUnsafe var+slot → Eigen
row math → CoverUpdate/MarkBlacklist, sharded at cost 5000). Here the batch of
unique touched rows is processed as one fused gather → rule-update → scatter
region: deterministic (ids are deduped and gradients segment-summed upstream)
and entirely on-device.

Semantics preserved:
  * frequency filter — rows with freq < enter_threshold are skipped
    (training_ops.cc:1262-1264, kv_variable.h:910-912),
  * group-lasso blacklist — below-threshold rows zeroed + flagged; flagged
    rows that re-emerge above threshold are un-flagged (reference CoverUpdate
    vs MarkBlacklist branch),
  * slot co-location — one concatenated slot array per optimizer per table
    (slot_creator + num_concat_opt_vars, variable_scope.py:1027-1093),
  * delta-list marking for incremental checkpoint (MarkAsDeltaListElements).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kv import table as kvt
from ..ops import rowops
from ..utils import packing
from .rules import Rule


@dataclasses.dataclass(frozen=True)
class SparseOptimizer:
    """Binds a :class:`Rule` to a slot name; stateless (all state lives in the
    table's slot dict, so checkpoints carry optimizer state for free)."""
    rule: Rule
    slot_name: str = "opt_state"

    def init(self, table: kvt.KvTable) -> kvt.KvTable:
        """Ensure the table has this optimizer's slot array (call once,
        outside jit — it changes the pytree structure)."""
        if self.rule.slot_width == 0:
            return table
        return kvt.ensure_slots(table, {self.slot_name: self.rule.slot_width})

    def apply(self, table: kvt.KvTable, slot_idx: jnp.ndarray,
              grads: jnp.ndarray, *, lr, step,
              extra: Optional[jnp.ndarray] = None,
              mark_delta: bool = True,
              payload_rows: Optional[jnp.ndarray] = None,
              meta_rows: Optional[jnp.ndarray] = None) -> kvt.KvTable:
        """Update rows at ``slot_idx`` (from ``LookupResult.slot``; -1 entries
        are skipped) with per-unique-row ``grads``.

        ``step`` is the 1-indexed global step (drives bias-correction powers);
        ``lr`` may be a python float or traced scalar. The update is one
        fused XLA gather → rule → scatter region; a streaming full-table
        Pallas alternative was built, measured, and deleted — it never beat
        this path on hardware (PERF.md scan-update post-mortem).

        ``payload_rows``/``meta_rows``: pass ``LookupResult.payload_rows`` /
        ``.meta_rows`` from the SAME step's lookup to skip both gathers here
        (valid because only metadata changed between lookup and apply).
        """
        n = slot_idx.shape[0]
        cap = table.capacity
        dim = table.config.dim
        k = self.rule.slot_width
        if k > 0 and self.slot_name not in table.config.slot_columns():
            raise ValueError(
                f"slot '{self.slot_name}' missing — call optimizer.init(table) first")
        ok = slot_idx >= 0
        safe = jnp.where(ok, slot_idx, 0)

        # ONE metadata gather serves the freq filter, the blacklist read and
        # the flag-bit update below (merged word, utils/packing.py). Gather
        # meta lanes straight from the FLAT header — `table.meta[safe]`
        # would materialise the whole [C] meta plane (reshape+slice) before
        # the gather, ~0.5 ms/step at 1M rows (PERF.md apply-overhead item)
        if meta_rows is None:
            flat = table.header.reshape(-1)
            meta_g = jax.lax.bitcast_convert_type(
                flat[kvt._hpos_meta(safe)], jnp.uint32)
        else:
            meta_g = meta_rows

        # frequency filter (should_filter in the reference kernels)
        thr = table.config.enter_threshold
        if thr > 0:
            ok = ok & (packing.get_freq(meta_g) >= np.uint32(thr))

        gidx = jnp.where(ok, slot_idx, -1)
        # ONE wide gather (or none, if the lookup's rows were passed in)
        # covers the variable AND its slot state
        wide = (rowops.gather_rows(table.payload, gidx)
                if payload_rows is None else payload_rows)
        var = wide[:, :dim]
        # blacklisted rows read as zeros for the update math too (the
        # reference's table_manager zero-buffer reads)
        was_black = (meta_g & kvt.FLAG_BLACKLIST) != 0
        var = jnp.where(was_black[:, None], jnp.zeros_like(var), var)

        if k > 0:
            s, w = table.config.slot_columns()[self.slot_name]
            state = wide[:, s:s + w]
        else:
            state = jnp.zeros((n, 0), dtype=var.dtype)

        # Update math runs in f32 regardless of the storage dtype: half
        # payloads (fp16/bf16) upcast for the rule and round ONCE at the
        # store below — per-op half rounding loses v's small-increment
        # accumulation entirely (bf16 has 7 mantissa bits; (1-b2)·g² terms
        # fall below v's half-ulp within a few steps). Costs nothing on
        # TPU: the VPU computes in f32 anyway.
        new_var, new_state, black = self.rule.update(
            var.astype(jnp.float32), state.astype(jnp.float32),
            grads.astype(jnp.float32), lr=lr, step=step, extra=extra)

        idx = jnp.where(ok, slot_idx, cap)  # OOB rows dropped
        # ONE wide scatter writes variable + slot state together (random row
        # writes are issue-bound per row — this halves the scatter cost).
        # Build the row by CONCAT, not dynamic-update-slices: two .at[].set
        # calls materialise full-width [N, W] intermediates in HBM, measured
        # +0.6 ms/step at 32k x 256 f32 on v5e (scripts/prof_apply.py).
        pieces = [new_var.astype(wide.dtype)]
        if k > 0:
            if s > dim:
                pieces.append(wide[:, dim:s])
            pieces.append(new_state.astype(wide.dtype))
            if s + w < wide.shape[1]:
                pieces.append(wide[:, s + w:])
        elif wide.shape[1] > dim:
            pieces.append(wide[:, dim:])
        new_wide = pieces[0] if len(pieces) == 1 else \
            jnp.concatenate(pieces, axis=1)
        payload = rowops.scatter_rows(table.payload, gidx, new_wide)

        new_meta = meta_g
        if mark_delta:
            new_meta = new_meta | kvt.FLAG_TOUCH_BOTH
        if black is not None:
            new_meta = jnp.where(black,
                                 new_meta | kvt.FLAG_BLACKLIST,
                                 new_meta & ~kvt.FLAG_BLACKLIST)
        else:
            new_meta = new_meta & ~kvt.FLAG_BLACKLIST
        header = kvt._set_meta_at(table.header, idx, new_meta)

        return dataclasses.replace(table, payload=payload, header=header)
