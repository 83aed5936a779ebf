"""KvTable — HBM-resident dynamically-growing key→row embedding table.

TPU-native re-design of the reference KvVariable engine
(``/root/reference/tfplus/kv_variable/kernels/kv_variable.h:88-1015`` and
``hybrid_embedding/table_manager.h``): the host-DRAM concurrent hash map with
per-key locks becomes a **slotted open-addressing table in HBM** —
fixed-capacity arrays ``keys[C, 2]``, ``payload[C, W]`` (embedding columns
followed by co-located optimizer slot segments) and ``meta[C]`` (ONE packed
word per row: freq | day | blacklist/delta bits, utils/packing.py) — probed
by double hashing. Random row writes are issue-bound per (row, op) on TPU,
so the layout minimises the NUMBER of gather/scatter ops per step, not
bytes: one wide payload op and one meta op.
Everything is a pure function over a :class:`KvTable` pytree: lookups that
insert return a *new* table (thread it through your step function and donate
the buffers so XLA updates in place).

Capacity is static under ``jit``; growth happens between steps host-side
(:func:`grow`) — dynamic growth without dynamic shapes. Deletions write
tombstones so probe chains stay intact (:func:`compact` rebuilds).

Semantics kept from the reference:
  * new-row init = mean of two pseudo-random rows of a fixed init pool
    (kv_variable.h:889-898),
  * saturating uint16 frequency + day-resolution timestamp per row
    (embedding_value.h:189-234, utility.h:57-70),
  * frequency filter: rows with freq < ``enter_threshold`` exist but are
    skipped by optimizers (training_ops.cc:1262-1264),
  * group-lasso blacklist: flagged rows read as zeros and can re-activate
    (table_manager.h:335-372),
  * train/prediction delta-list bits for incremental checkpoint
    (kv_variable.h:870-871).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import hashing
from ..ops import rowops
from ..utils import packing

# flag bits live in the top 3 bits of the packed meta word (packing.py) so
# the hot path pays ONE metadata gather+scatter per step
FLAG_BLACKLIST = packing.FLAG_BLACKLIST
FLAG_TOUCH_TRAIN = packing.FLAG_TOUCH_TRAIN   # train deltalist membership
FLAG_TOUCH_PRED = packing.FLAG_TOUCH_PRED     # prediction deltalist membership
FLAG_TOUCH_BOTH = packing.FLAG_TOUCH_BOTH

# 32 probes keeps the per-key miss probability below ~1e-5 at the 0.7 grow
# threshold (0.7^32); overflow beyond that triggers a host-mediated grow().
DEFAULT_MAX_PROBES = 32
# Reference default: a [10000, dim] random pool sampled per new key
# (variable_scope.py:229-231 forces shape [10000]+dim); same default here so
# init-row distributions match out of the box (round-1 used 1024).
DEFAULT_INIT_POOL_ROWS = 10000
GROW_LOAD_FACTOR = 0.7
DELETED_LOG_CAPACITY = 4096       # per-table deletion log for delta ckpts


@dataclasses.dataclass(frozen=True)
class KvConfig:
    """Static per-table options (reference: op attrs + KvOptions,
    ops/kv_variable_ops.cc:37-201, kv_variable_options.py).

    ``slot_layout``: ordered ``(slot_name, width_multiplier)`` pairs — the
    optimizer slot segments that live in the payload columns after the
    embedding columns (AdamV4's ``m|v|linear`` concat slot is the reference
    precedent, training_ops.cc:7156-7162; co-locating them in the SAME
    physical array halves the per-step scatter count, PERF.md).
    """
    dim: int
    enter_threshold: int = 0          # frequency filter (0 = off)
    max_probes: int = DEFAULT_MAX_PROBES
    value_dtype: Any = jnp.float32
    name: str = "kv_table"
    slot_layout: tuple = ()           # ((name, k), ...): k*dim columns each
    #: keep deletions visible to BOTH delta streams (train + pred) — the
    #: reference's support_prediction_delta_ (kv_variable.h:871, copied
    #: train->pred on export, dynamic_save.hpp:186-191). Off by default:
    #: a single-stream user's ring then clears on every delta export.
    support_prediction_delta: bool = False

    def __post_init__(self):
        object.__setattr__(self, "value_dtype", jnp.dtype(self.value_dtype))
        # Probing covers exactly the two candidate buckets (2 × 16 slots) that
        # find() scans; a probe round beyond 2·BUCKET_SIZE would write keys
        # into lanes of a THIRD bucket where no lookup ever looks (lost rows).
        limit = 2 * hashing.BUCKET_SIZE
        if not (1 <= self.max_probes <= limit):
            raise ValueError(
                f"max_probes must be in [1, {limit}] (two-choice bucketized "
                f"probing scans 2x{hashing.BUCKET_SIZE} slots), got "
                f"{self.max_probes}")

    @property
    def payload_width(self) -> int:
        return self.dim * (1 + sum(k for _, k in self.slot_layout))

    def slot_columns(self) -> Dict[str, tuple]:
        """name -> (start_col, num_cols) within the payload."""
        out, col = {}, self.dim
        for name, k in self.slot_layout:
            out[name] = (col, k * self.dim)
            col += k * self.dim
        return out


def _meta_i32(m: jnp.ndarray) -> jnp.ndarray:
    """uint32 packed meta → bit-identical int32 (header lane storage)."""
    return jax.lax.bitcast_convert_type(m, jnp.int32)


def _meta_u32(m: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(m, jnp.uint32)


# planar header flat-position helpers: slot idx -> positions of its lanes
# in header.reshape(-1). Buckets are 64-lane rows (16 slots x 4 fields).
def _hpos_lo(idx):
    return (idx >> 4) * 64 + (idx & 15)


def _hpos_hi(idx):
    return (idx >> 4) * 64 + 16 + (idx & 15)


def _hpos_meta(idx):
    return (idx >> 4) * 64 + 32 + (idx & 15)


def _set_meta_at(header: jnp.ndarray, idx: jnp.ndarray,
                 meta: jnp.ndarray) -> jnp.ndarray:
    """Scatter packed meta words at slot indices ``idx`` (entries == capacity
    are dropped; callers use the capacity sentinel, never negatives)."""
    flat = header.reshape(-1)
    flat = flat.at[_hpos_meta(idx)].set(_meta_i32(meta), mode="drop")
    return flat.reshape(header.shape)


def _set_all_meta(header: jnp.ndarray, meta: jnp.ndarray) -> jnp.ndarray:
    """Replace the whole meta plane (meta is uint32[C])."""
    g = header.shape[0]
    v = header.reshape(g, 4, -1)
    v = v.at[:, 2, :].set(_meta_i32(meta).reshape(g, -1))
    return v.reshape(header.shape)


def _set_all_pad(header: jnp.ndarray, words: jnp.ndarray) -> jnp.ndarray:
    """Replace the whole pad plane (lanes 48-63; ``words`` is int32[C]).
    The pad lanes are free per-slot 32-bit storage riding the SAME bucket
    gather as keys+meta — the int8 serving table keeps its per-row dequant
    scale here (quant.py), eliminating its second per-row gather."""
    g = header.shape[0]
    v = header.reshape(g, 4, -1)
    v = v.at[:, 3, :].set(words.reshape(g, -1))
    return v.reshape(header.shape)


def _get_all_pad(header: jnp.ndarray) -> jnp.ndarray:
    """Whole pad plane as int32[C] (view-style read)."""
    g = header.shape[0]
    return header.reshape(g, 4, -1)[:, 3, :].reshape(-1)


def _empty_header(num_buckets: int) -> jnp.ndarray:
    """All-empty planar header: key lanes = EMPTY sentinel, meta/pad = 0."""
    row = jnp.concatenate([
        jnp.full((32,), hashing.EMPTY_LO, jnp.int32),   # lo & hi lanes (-1)
        jnp.zeros((32,), jnp.int32),                    # meta + pad lanes
    ])
    return jnp.broadcast_to(row, (num_buckets, 64)).copy()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KvTable:
    # Bucket-PLANAR control array: one 64-lane row per 16-slot bucket —
    # lanes 0-15 = key_lo of the bucket's slots, 16-31 = key_hi,
    # 32-47 = packed meta (bitcast uint32), 48-63 = pad. Keys and meta
    # share the array so ONE 256 B bucket gather feeds the whole probe
    # (keys AND candidate meta); the planar lane grouping makes field
    # extraction free lane slices. Measured (32k ids, 1M rows, v5e):
    # planar find 0.35 ms vs 0.68 for split keys[C,2]+meta[C] (the meta
    # gather) vs 0.92 for an interleaved [C,4] header (minor-dim-4 gathers
    # and reshapes are Mosaic-hostile). See PERF.md.
    header: jnp.ndarray                # int32[C // 16, 64]
    # ONE physical array per table: embedding columns [:, :D] followed by
    # optimizer slot segments (config.slot_layout). Random row writes are
    # issue-bound per (row, op) on TPU (~85 ns/row regardless of width,
    # PERF.md), so one wide scatter beats separate values+slot scatters 2x.
    payload: jnp.ndarray               # vdtype[C, D + Σk·D]
    init_pool: jnp.ndarray             # vdtype[P, D]
    # deletion log for delta checkpoints (reference: DeltaExport delete lists,
    # dynamic_save.hpp:197-450). Fixed ring; overflow forces need_full_import.
    deleted_keys: jnp.ndarray          # int32[DELBUF, 2]
    deleted_count: jnp.ndarray         # int32 scalar
    deleted_overflow: jnp.ndarray      # bool scalar
    # per-stream consumption watermarks into the ring (entries
    # [seen_x : count] are pending for stream x). Only meaningful with
    # config.support_prediction_delta; kept in the pytree unconditionally
    # so the tree structure does not depend on a config flag.
    deleted_seen_train: jnp.ndarray    # int32 scalar
    deleted_seen_pred: jnp.ndarray     # int32 scalar
    config: KvConfig = dataclasses.field(metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.header.shape[0] * _B

    @property
    def dim(self) -> int:
        return self.config.dim

    # keys/meta VIEWS of the planar header (materialise a [C, ...] copy).
    # Fine for whole-array reads (export, stats, eviction sweeps); hot
    # paths read meta from the probe gather instead, and mutations write
    # header lanes directly.
    @property
    def keys(self) -> jnp.ndarray:
        v = self.header.reshape(-1, 4, _B)
        return jnp.stack([v[:, 0, :].reshape(-1), v[:, 1, :].reshape(-1)],
                         axis=-1)

    @property
    def meta(self) -> jnp.ndarray:
        v = self.header.reshape(-1, 4, _B)
        return _meta_u32(v[:, 2, :].reshape(-1))

    # Convenience VIEWS (column slices of the payload). Fine host-side and
    # for whole-array reads; do NOT gather/scatter through them in jitted
    # hot paths — slice-then-gather materialises the slice (PERF.md).
    @property
    def values(self) -> jnp.ndarray:
        return self.payload[..., :self.config.dim]

    @property
    def slots(self) -> Dict[str, jnp.ndarray]:
        return {name: self.payload[..., s:s + w]
                for name, (s, w) in self.config.slot_columns().items()}


class FindResult(NamedTuple):
    slot: jnp.ndarray         # int32[N]; -1 if not found
    found: jnp.ndarray        # bool[N]
    insert_slot: jnp.ndarray  # int32[N]; first free candidate (-1 if chain full)
    meta: jnp.ndarray         # uint32[N] packed meta of the found slot (0 if none)
    # — comes free from the probe's bucket gather (header co-location)
    # raw pad-lane word of the found slot (find(want_pad=True) only) —
    # lanes 48-63 are free 32-bit storage per slot; the int8 serving table
    # keeps its per-row dequant scale there so NO second gather is needed
    pad: Optional[jnp.ndarray] = None


class LookupResult(NamedTuple):
    rows: jnp.ndarray      # vdtype[N, D] (zeros for invalid / blacklisted)
    slot: jnp.ndarray      # int32[N]; -1 invalid/overflow — feed back to apply_grads
    table: "KvTable"
    overflow: jnp.ndarray  # bool scalar: some id could not be placed → grow()
    # full gathered payload rows [N, W] (values + slot columns, raw — no
    # blacklist zeroing). Optimizer.apply reuses them to skip its gather.
    payload_rows: Optional[jnp.ndarray] = None
    # per-query packed meta AFTER this lookup's freq/day/touch update —
    # lets the optimizer skip its metadata gather too
    meta_rows: Optional[jnp.ndarray] = None


def create(dim: int,
           capacity: int = 1 << 14,
           *,
           initializer=None,
           init_pool_rows: int = DEFAULT_INIT_POOL_ROWS,
           enter_threshold: int = 0,
           max_probes: int = DEFAULT_MAX_PROBES,
           value_dtype=jnp.float32,
           name: str = "kv_table",
           support_prediction_delta: bool = False,
           seed: int = 0) -> KvTable:
    """Create an empty table.

    ``initializer``: callable ``(key, shape) -> array`` for the init pool, or a
    concrete ``[P, dim]`` array. Defaults to truncated-normal(0.01·) matching
    typical embedding init.
    """
    if capacity & (capacity - 1):
        raise ValueError(f"capacity must be a power of two, got {capacity}")
    if capacity < 2 * hashing.BUCKET_SIZE:
        raise ValueError(f"capacity must be >= {2 * hashing.BUCKET_SIZE}")
    cfg = KvConfig(dim=dim, enter_threshold=enter_threshold,
                   max_probes=max_probes, value_dtype=value_dtype, name=name,
                   support_prediction_delta=support_prediction_delta)
    if initializer is None:
        key = jax.random.PRNGKey(seed)
        pool = (jax.random.truncated_normal(key, -2.0, 2.0,
                                            (init_pool_rows, dim)) * 0.05)
        pool = pool.astype(value_dtype)
    elif callable(initializer):
        pool = initializer(jax.random.PRNGKey(seed), (init_pool_rows, dim))
        pool = jnp.asarray(pool, dtype=value_dtype)
    else:
        pool = jnp.asarray(initializer, dtype=value_dtype)
        if pool.ndim != 2 or pool.shape[1] != dim:
            raise ValueError(f"init pool must be [P, {dim}], got {pool.shape}")
    empty_row = jnp.array([hashing.EMPTY_LO, hashing.EMPTY_HI], dtype=jnp.int32)
    return KvTable(
        header=_empty_header(capacity // _B),
        payload=jnp.zeros((capacity, dim), dtype=value_dtype),
        init_pool=pool,
        deleted_keys=jnp.broadcast_to(empty_row, (DELETED_LOG_CAPACITY, 2)).copy(),
        deleted_count=jnp.zeros((), jnp.int32),
        deleted_overflow=jnp.zeros((), bool),
        deleted_seen_train=jnp.zeros((), jnp.int32),
        deleted_seen_pred=jnp.zeros((), jnp.int32),
        config=cfg,
    )


# ---------------------------------------------------------------------------
# probing
# ---------------------------------------------------------------------------

_B = hashing.BUCKET_SIZE


def _bucket_scan(g: jnp.ndarray, q: jnp.ndarray, valid: jnp.ndarray,
                 want_pad: bool = False):
    """Scan ONE gathered planar bucket ``g`` [N, 64] for a key match and the
    first free lane. Field extraction is free lane slicing (planar layout);
    everything else is VPU compares + min-reduces — no further gathers.

    Returns ``(mj, fj, meta, pad)``: first matching lane, first free lane
    (both == _B when none), the matched slot's packed meta (0 when none; at
    most one lane matches, so a masked sum extracts it), and — only when
    ``want_pad`` — the matched slot's raw pad-lane word (same extraction,
    used by the int8 serving table for its in-header dequant scale)."""
    lo = g[:, :_B]
    hi = g[:, _B:2 * _B]
    match = (lo == q[:, :1]) & (hi == q[:, 1:2]) & valid[:, None]
    free = ((lo == hashing.EMPTY_LO) | (lo == hashing.TOMB_LO)) \
        & (hi == hashing.EMPTY_HI)
    big = jnp.int32(_B)
    j = jnp.arange(_B, dtype=jnp.int32)[None, :]
    mj = jnp.min(jnp.where(match, j, big), axis=1)
    fj = jnp.min(jnp.where(free, j, big), axis=1)
    meta = jnp.sum(jnp.where(match, _meta_u32(g[:, 2 * _B:3 * _B]),
                             jnp.uint32(0)), axis=1, dtype=jnp.uint32)
    pad = None
    if want_pad:
        pad = jnp.sum(jnp.where(match, g[:, 3 * _B:4 * _B], jnp.int32(0)),
                      axis=1, dtype=jnp.int32)
    return mj, fj, meta, pad


def find(table: KvTable, q: jnp.ndarray,
         valid: Optional[jnp.ndarray] = None, *,
         want_pad: bool = False) -> FindResult:
    """Probe both candidate buckets of each query key.

    Mirrors TableManager find semantics (table_manager.h:167-190) without
    locks. Bucketized two-choice hashing scans all 32 candidates, so
    deletions need no chain repair (tombstones == empties here). Two
    256 B planar bucket gathers feed the whole probe, keys AND meta
    (AND the pad word when ``want_pad`` — no extra gather either way).
    """
    n = q.shape[0]
    if valid is None:
        valid = ~hashing.is_reserved_id(q)
    else:
        valid = valid & ~hashing.is_reserved_id(q)

    b1, b2 = hashing.bucket_choices(q, table.capacity)
    g1 = table.header[b1]                  # [N, 64]
    g2 = table.header[b2]
    mj1, fj1, meta1, pad1 = _bucket_scan(g1, q, valid, want_pad)
    mj2, fj2, meta2, pad2 = _bucket_scan(g2, q, valid, want_pad)

    big = jnp.int32(_B)
    f1 = mj1 < big
    f2 = mj2 < big
    found = f1 | f2
    slot = jnp.where(f1, b1 * _B + mj1,
                     jnp.where(f2, b2 * _B + mj2, -1))
    meta = jnp.where(f1, meta1, meta2)
    pad = jnp.where(f1, pad1, pad2) if want_pad else None
    hf1 = fj1 < big
    hf2 = fj2 < big
    has_free = (hf1 | hf2) & valid
    ins_pos = jnp.where(hf1, b1 * _B + fj1, b2 * _B + fj2)
    ins = jnp.where(has_free, ins_pos, -1)
    return FindResult(slot=slot, found=found, insert_slot=ins, meta=meta,
                      pad=pad)


def _claim_insert(header: jnp.ndarray, q: jnp.ndarray, need: jnp.ndarray,
                  max_probes: int):
    """Deterministic parallel insert of **unique** keys.

    ``max_probes`` rounds; in round *j* every still-unplaced key attempts its
    *j*-th probe candidate; collisions on a free slot are resolved
    lowest-index-wins via a scatter-min claim array. Replaces the reference's
    read-lock→upgrade-to-writer protocol (table_manager.h:172-189) with a
    deterministic data-parallel schedule.

    Returns ``(new_header, placed int32[N] (-1 = overflow))``. Claimed rows
    get meta 0 (free slots hold meta 0 by invariant, so this is a no-op
    semantically; callers stamp real meta afterwards).
    """
    n = q.shape[0]
    cap = header.shape[0] * _B
    # rounds beyond 2·_B would index lanes outside the two candidate buckets
    # (unfindable slots); KvConfig validates, this clamp is defense-in-depth
    max_probes = min(max_probes, 2 * _B)
    iota = jnp.arange(n, dtype=jnp.int32)
    b1, b2 = hashing.bucket_choices(q, cap)
    q_lo = q[:, 0]
    q_hi = q[:, 1]

    def pos_at(j):
        in_b1 = j < _B
        base = jnp.where(in_b1, b1, b2)
        lane = jnp.where(in_b1, j, j - _B)
        return base * _B + lane

    def read_key(flat, pos):
        return jnp.stack([flat[_hpos_lo(pos)], flat[_hpos_hi(pos)]], axis=-1)

    def round_body(state):
        j, flat, placed = state
        active = need & (placed < 0)
        pos = pos_at(j)
        cur = read_key(flat, pos)
        attempt = active & hashing.is_free(cur)
        claim = jnp.full((cap,), n, dtype=jnp.int32)
        claim = claim.at[pos].min(jnp.where(attempt, iota, n), mode="drop")
        won = attempt & (claim[pos] == iota)
        scatter_idx = jnp.where(won, pos, cap)   # cap = OOB → dropped
        flat = flat.at[_hpos_lo(scatter_idx)].set(q_lo, mode="drop")
        flat = flat.at[_hpos_hi(scatter_idx)].set(q_hi, mode="drop")
        # duplicate safety: instances of the same key probe in lockstep, so
        # a claim loser whose slot now holds ITS key was raced by its own
        # twin — adopt that slot instead of claiming a second one
        dup_hit = active & hashing.keys_equal(read_key(flat, pos), q)
        placed = jnp.where(won | dup_hit, pos, placed)
        return j + 1, flat, placed

    def round_cond(state):
        j, _, placed = state
        # early exit: almost always 1-2 rounds resolve all claims
        return (j < max_probes) & jnp.any(need & (placed < 0))

    def run(state):
        return jax.lax.while_loop(round_cond, round_body, state)

    def skip(state):
        return state

    init = (jnp.zeros((), jnp.int32), header.reshape(-1),
            jnp.full((n,), -1, jnp.int32))
    # skip all insert work when the batch has no misses (the steady state)
    _, flat, placed = jax.lax.cond(jnp.any(need), run, skip, init)
    return flat.reshape(header.shape), placed


# ---------------------------------------------------------------------------
# lookups
# ---------------------------------------------------------------------------

def _gather_payload(table: KvTable, slot: jnp.ndarray,
                    ok: jnp.ndarray) -> jnp.ndarray:
    """Gather FULL payload rows [N, W]. Wide gathers cost the same as narrow
    ones on TPU (issue-bound per row, PERF.md) and the optimizer reuses the
    slot columns, saving its own gathers."""
    return rowops.gather_rows(table.payload, jnp.where(ok, slot, -1))


def _rows_view(table: KvTable, payload_rows: jnp.ndarray, ok: jnp.ndarray,
               meta_rows: jnp.ndarray) -> jnp.ndarray:
    """Embedding columns of gathered payload rows, with blacklisted /
    invalid rows read as zeros (table_manager.h:226-231)."""
    rows = payload_rows[:, :table.config.dim]
    black = (meta_rows & FLAG_BLACKLIST) != 0
    ok = ok & ~black
    return jnp.where(ok[:, None], rows, jnp.zeros_like(rows))


def _gather_rows(table: KvTable, slot: jnp.ndarray, ok: jnp.ndarray,
                 meta_rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    safe = jnp.where(ok, slot, 0)
    if meta_rows is None:
        meta_rows = table.meta[safe]
    return _rows_view(table, _gather_payload(table, slot, ok), ok, meta_rows)


def _init_rows_for(table: KvTable, q: jnp.ndarray) -> jnp.ndarray:
    pool = table.init_pool
    r1, r2 = hashing.init_row_indices(q, pool.shape[0])
    half = jnp.asarray(0.5, dtype=pool.dtype)
    return (pool[r1] + pool[r2]) * half


def lookup_or_insert(table: KvTable,
                     q: jnp.ndarray,
                     counts: Optional[jnp.ndarray] = None,
                     *,
                     valid: Optional[jnp.ndarray] = None,
                     day: int | jnp.ndarray = 0,
                     mark_delta: bool = True,
                     defer_meta: bool = False) -> LookupResult:
    """Training-path gather: find each key, insert misses with init-pool rows.

    Parity: KvVariableGatherOrInsert(WithCounts) (kernels/kv_variable_ops.cc:
    498-631) + FindOrInsertLocally (kv_variable.h:287-380). Dedup ``q``
    first (:func:`tfplus_tpu.kv.unique.unique_with_counts`) for exact
    frequency accounting and deterministic updates; placement itself is
    duplicate-safe. ``counts`` is the per-key multiplicity.
    """
    n = q.shape[0]
    if valid is None:
        valid = ~hashing.is_reserved_id(q)
    else:
        valid = valid & ~hashing.is_reserved_id(q)
    if counts is None:
        counts = jnp.ones((n,), dtype=jnp.int32)

    fr = find(table, q, valid)
    need = valid & ~fr.found
    new_header, placed_new = _claim_insert(table.header, q, need,
                                           table.config.max_probes)
    placed = jnp.where(fr.found, fr.slot, placed_new)
    ok = valid & (placed >= 0)
    overflow = jnp.any(need & (placed_new < 0))

    # --- write new rows -----------------------------------------------------
    # The init-row scatter is gated on any-miss: a 32k-row scatter costs
    # ~2 ms on v5e even when every index is dropped (issue-bound per row),
    # and the steady state has no misses. New rows get init-pool embedding
    # columns and ZERO slot columns (fresh optimizer state).
    newly = need & (placed_new >= 0)
    init_idx = jnp.where(newly, placed_new, -1)
    w = table.payload.shape[1]
    dim = table.config.dim

    def _write_new(p):
        init = _init_rows_for(table, q)
        if w != dim:
            init = jnp.concatenate(
                [init, jnp.zeros((n, w - dim), init.dtype)], axis=1)
        return rowops.scatter_rows(p, init_idx, init)

    payload = jax.lax.cond(jnp.any(newly), _write_new, lambda p: p,
                           table.payload)

    # --- metadata: freq count, day stamp, delta-touch bits and (preserved)
    # blacklist bit. The OLD meta came free with the probe gather (fr.meta;
    # 0 for new rows by the free-slot invariant) — no separate gather.
    day = jnp.asarray(day, dtype=jnp.uint32)
    touch = FLAG_TOUCH_BOTH if mark_delta else jnp.uint32(0)
    upd_meta = packing.saturating_add_freq(fr.meta, counts, day) \
        | jnp.where(newly, FLAG_TOUCH_BOTH, touch)
    # defer_meta: the train step promises an optimizer.apply over the SAME
    # slots in the same jit, passing this result's meta_rows — apply's meta
    # scatter then carries the freq/day/touch update too, saving one 32k-row
    # scatter per step. Only valid without a frequency filter (a filtered
    # row's freq update would otherwise be dropped by apply).
    if defer_meta and table.config.enter_threshold == 0:
        header = new_header
    else:
        header = _set_meta_at(new_header,
                              jnp.where(ok, placed, table.capacity), upd_meta)

    new_table = dataclasses.replace(table, header=header, payload=payload)
    prow = _gather_payload(new_table, placed, ok)
    rows = _rows_view(new_table, prow, ok, upd_meta)
    return LookupResult(rows=rows, slot=jnp.where(ok, placed, -1),
                        table=new_table, overflow=overflow,
                        payload_rows=prow, meta_rows=upd_meta)


def lookup_or_zeros(table: KvTable, q: jnp.ndarray,
                    valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Inference-path gather: unknown / blacklisted keys read as zeros.

    Parity: KvVariableGatherOrZeros (kernels/kv_variable_ops.cc:348-429); used
    when ``IS_TRAINING`` is false (kv_variable_ops.py:1057-1113).
    """
    fr = find(table, q, valid)
    return _gather_rows(table, fr.slot, fr.found, fr.meta)


def lookup_with_init(table: KvTable, q: jnp.ndarray,
                     valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gather with init-pool fallback for misses, **without inserting**
    (parity: KvVariableGather with use_init_value,
    kernels/kv_variable_ops.cc:633-701)."""
    fr = find(table, q, valid)
    rows = _gather_rows(table, fr.slot, fr.found, fr.meta)
    if valid is None:
        valid = ~hashing.is_reserved_id(q)
    miss = valid & ~fr.found
    return jnp.where(miss[:, None], _init_rows_for(table, q), rows)


# ---------------------------------------------------------------------------
# mutation
# ---------------------------------------------------------------------------

def insert(table: KvTable, q: jnp.ndarray, rows: jnp.ndarray,
           *, valid: Optional[jnp.ndarray] = None,
           day: int | jnp.ndarray = 0,
           blacklist: Optional[jnp.ndarray] = None,
           freq: Optional[jnp.ndarray] = None) -> KvTable:
    """Unconditional upsert of ``q → rows`` (parity: KvVariableInsert,
    kernels/kv_variable_ops.cc:703-747; InsertOrUpdate kv_variable.h:423-485).
    Dedup ``q`` for deterministic last-write semantics (placement is
    duplicate-safe)."""
    n = q.shape[0]
    if valid is None:
        valid = ~hashing.is_reserved_id(q)
    else:
        valid = valid & ~hashing.is_reserved_id(q)
    fr = find(table, q, valid)
    need = valid & ~fr.found
    new_header, placed_new = _claim_insert(table.header, q, need,
                                           table.config.max_probes)
    placed = jnp.where(fr.found, fr.slot, placed_new)
    ok = valid & (placed >= 0)
    idx = jnp.where(ok, placed, table.capacity)

    # upsert keeps existing slot columns (the reference's InsertOrUpdate
    # leaves the separate slot variables untouched); new rows get zeros
    dim = table.config.dim
    w = table.payload.shape[1]
    gidx = jnp.where(ok, placed, -1)
    if w != dim:
        cur = rowops.gather_rows(table.payload, gidx)
        slot_cols = jnp.where((fr.found & ok)[:, None], cur[:, dim:],
                              jnp.zeros((n, w - dim), cur.dtype))
        wide = jnp.concatenate(
            [rows.astype(table.payload.dtype), slot_cols], axis=1)
    else:
        wide = rows.astype(table.payload.dtype)
    payload = rowops.scatter_rows(table.payload, gidx, wide)
    day = jnp.broadcast_to(jnp.asarray(day, dtype=jnp.uint32), (n,))
    if freq is None:
        # the reference's InsertOrUpdate writes the VALUE only
        # (kv_variable.h:458-464): existing rows keep their frequency and
        # last-touch day — resetting them would re-filter a hot row under
        # enter_threshold and make it instantly TTL-evictable
        freq = jnp.where(fr.found, packing.get_freq(fr.meta),
                         jnp.uint32(1))
        day = jnp.where(fr.found, packing.get_day(fr.meta), day)
    fl = jnp.broadcast_to(FLAG_TOUCH_BOTH, (n,)).astype(jnp.uint32)
    if blacklist is not None:
        fl = fl | jnp.where(blacklist, FLAG_BLACKLIST, jnp.uint32(0))
    header = _set_meta_at(new_header, idx, packing.pack(freq, day, fl))
    return dataclasses.replace(table, header=header, payload=payload)


def insert_raw(table: KvTable, q: jnp.ndarray, payload_rows: jnp.ndarray,
               meta: jnp.ndarray, *,
               valid: Optional[jnp.ndarray] = None) -> KvTable:
    """Upsert FULL payload rows (embedding + slot columns) with exact packed
    meta words — the storage-tier promotion / restore primitive. Unlike
    :func:`insert` this writes the whole row verbatim (values, optimizer
    slots, freq/day/flag bits), mirroring the reference's tier moves where a
    row migrates between StorageTables with its EmbeddingValue intact
    (hybrid_embedding/storage_table.h:41-71, table_manager.h:210-237).
    ``q`` must be deduplicated."""
    if valid is None:
        valid = ~hashing.is_reserved_id(q)
    else:
        valid = valid & ~hashing.is_reserved_id(q)
    fr = find(table, q, valid)
    need = valid & ~fr.found
    new_header, placed_new = _claim_insert(table.header, q, need,
                                           table.config.max_probes)
    placed = jnp.where(fr.found, fr.slot, placed_new)
    ok = valid & (placed >= 0)
    payload = rowops.scatter_rows(table.payload, jnp.where(ok, placed, -1),
                                  payload_rows.astype(table.payload.dtype))
    header = _set_meta_at(new_header, jnp.where(ok, placed, table.capacity),
                          meta.astype(jnp.uint32))
    return dataclasses.replace(table, header=header, payload=payload)


_SCATTER_OPS = ("update", "add", "sub", "mul", "div", "min", "max")


def scatter(table: KvTable, q: jnp.ndarray, updates: jnp.ndarray, op: str,
            *, valid: Optional[jnp.ndarray] = None,
            day: int | jnp.ndarray = 0) -> KvTable:
    """Elementwise scatter family over rows (parity: KvVariableScatter{Add,
    Sub,Mul,Div,Min,Max,Update} ops/kv_variable_ops.cc:520-574; cwise functors
    kernels/kv_variable_cwise_op.h; dispatch kv_variable.h:616-734).

    Missing keys are inserted with init-pool rows first (reference
    ScatterUpdate inserts on miss), then the op applies. ``q`` deduplicated.
    """
    if op not in _SCATTER_OPS:
        raise ValueError(f"op must be one of {_SCATTER_OPS}")
    res = lookup_or_insert(table, q, valid=valid, day=day)
    t = res.table
    ok = res.slot >= 0
    safe = jnp.where(ok, res.slot, 0)
    dim = t.config.dim
    cur_wide = res.payload_rows
    cur = cur_wide[:, :dim]
    u = updates.astype(cur.dtype)
    if op == "update":
        out = u
    elif op == "add":
        out = cur + u
    elif op == "sub":
        out = cur - u
    elif op == "mul":
        out = cur * u
    elif op == "div":
        out = cur / u
    elif op == "min":
        out = jnp.minimum(cur, u)
    else:
        out = jnp.maximum(cur, u)
    idx = jnp.where(ok, res.slot, t.capacity)
    wide = jnp.concatenate([out, cur_wide[:, dim:]], axis=1)
    payload = rowops.scatter_rows(t.payload, jnp.where(ok, res.slot, -1), wide)
    # writing a row clears its blacklist bit (re-activation)
    header = _set_meta_at(t.header, idx,
                          (res.meta_rows | FLAG_TOUCH_BOTH) & ~FLAG_BLACKLIST)
    return dataclasses.replace(t, payload=payload, header=header)


def _log_deletes(table: KvTable, q: jnp.ndarray,
                 mask: jnp.ndarray) -> KvTable:
    """Append deleted keys to the table's deletion log (for delta export)."""
    rb = table.deleted_keys.shape[0]
    pos = table.deleted_count + jnp.cumsum(mask.astype(jnp.int32)) - 1
    idx = jnp.where(mask & (pos < rb), pos, rb)  # OOB dropped
    dk = table.deleted_keys.at[idx].set(q, mode="drop")
    total = table.deleted_count + jnp.sum(mask.astype(jnp.int32))
    overflow = table.deleted_overflow | (total > rb)
    return dataclasses.replace(table, deleted_keys=dk,
                               deleted_count=jnp.minimum(total, rb),
                               deleted_overflow=overflow)


def delete(table: KvTable, q: jnp.ndarray,
           valid: Optional[jnp.ndarray] = None) -> tuple[KvTable, jnp.ndarray]:
    """Remove keys; returns ``(table, deleted_mask)``.

    Parity: KvVariableDelete (ops/kv_variable_ops.cc:681, kv_variable.h
    Delete). Slots become tombstones so other probe chains stay valid;
    :func:`compact` reclaims them.
    """
    fr = find(table, q, valid)
    deleted = fr.found
    idx = jnp.where(deleted, fr.slot, table.capacity)
    n = q.shape[0]
    # tombstone key + zero meta: three lane scatters into the planar header
    flat = table.header.reshape(-1)
    flat = flat.at[_hpos_lo(idx)].set(hashing.TOMB_LO, mode="drop")
    flat = flat.at[_hpos_hi(idx)].set(hashing.TOMB_HI, mode="drop")
    flat = flat.at[_hpos_meta(idx)].set(0, mode="drop")
    header = flat.reshape(table.header.shape)
    zero_rows = jnp.zeros((n, table.payload.shape[1]), table.payload.dtype)
    payload = table.payload.at[idx].set(zero_rows, mode="drop")
    out = dataclasses.replace(table, header=header, payload=payload)
    return _log_deletes(out, q, deleted), deleted


def delete_with_timestamp(table: KvTable, threshold_days: int,
                          day: int | jnp.ndarray) -> tuple[KvTable, jnp.ndarray]:
    """Evict rows untouched for > ``threshold_days`` (parity:
    DeleteWithTimestamp, kv_variable.h:756-789). Returns ``(table,
    evicted_mask[C])`` — extract evicted keys host-side for delta checkpoints.
    """
    occ = occupied_mask(table)
    # 13-bit day ring: wraparound-safe age, thresholds < 4096 days
    age = packing.day_age(day, packing.get_day(table.meta))
    evict = occ & (age > threshold_days)
    # whole-array planar sweep: per-field replacement where evicted
    g = table.header.shape[0]
    v = table.header.reshape(g, 4, _B)
    ev = evict.reshape(g, 1, _B)
    repl = jnp.array([hashing.TOMB_LO, hashing.TOMB_HI, 0, 0],
                     dtype=jnp.int32).reshape(1, 4, 1)
    header = jnp.where(ev, repl, v).reshape(table.header.shape)
    payload = jnp.where(evict[:, None], jnp.zeros((), table.payload.dtype),
                        table.payload)
    out = dataclasses.replace(table, header=header, payload=payload)
    # log evicted keys (pre-tombstone identities) for delta export
    return _log_deletes(out, table.keys, evict), evict


# ---------------------------------------------------------------------------
# introspection (parity: Size/StorageSize/Frequency/GetCount/GetTimeStamp ops)
# ---------------------------------------------------------------------------

def occupied_mask(table: KvTable) -> jnp.ndarray:
    return ~hashing.is_free(table.keys)


def size(table: KvTable) -> jnp.ndarray:
    """Number of live rows (ops/kv_variable_ops.cc:229-244)."""
    return jnp.sum(occupied_mask(table).astype(jnp.int32))


def sum_freq(table: KvTable) -> int:
    """Σ frequency over live rows (kv_variable.h:139-175). Host-side exact
    64-bit sum: without x64 a single int32 device reduction silently
    overflows past 2³¹ total frequency, so the device produces per-segment
    partial sums (each bounded by 2¹⁵ rows × 2¹⁶ max freq < 2³¹) and the
    host combines them in Python ints."""
    occ = occupied_mask(table)
    f = jnp.where(occ, packing.get_freq(table.meta), jnp.uint32(0))
    seg = 1 << 15
    c = f.shape[0]
    if c % seg:
        f = jnp.pad(f, (0, (-c) % seg))
    parts = jnp.sum(f.astype(jnp.int32).reshape(-1, seg), axis=1)
    return int(np.asarray(jax.device_get(parts), np.int64).sum())


def get_count(table: KvTable, q: jnp.ndarray) -> jnp.ndarray:
    """Per-key visit frequency (parity: KvVariableGetCount)."""
    fr = find(table, q)
    return jnp.where(fr.found, packing.get_freq(fr.meta),
                     jnp.uint32(0)).astype(jnp.int32)


def get_timestamp(table: KvTable, q: jnp.ndarray) -> jnp.ndarray:
    """Per-key last-update day (parity: KvVariableGetTimeStamp)."""
    fr = find(table, q)
    return jnp.where(fr.found, packing.get_day(fr.meta),
                     jnp.uint32(0)).astype(jnp.int32)


def stats(table: KvTable) -> dict:
    """Observability snapshot (reference: Size/StorageSize/Frequency ops +
    VLOG kernel timing, SURVEY.md §5.5/§5.1). Host-side; cheap reductions."""
    occ = occupied_mask(table)
    black = (table.meta & FLAG_BLACKLIST) != 0
    touched = (table.meta & FLAG_TOUCH_TRAIN) != 0
    n = int(jax.device_get(jnp.sum(occ.astype(jnp.int32))))
    return {
        "name": table.config.name,
        "size": n,
        "capacity": table.capacity,
        "load_factor": n / table.capacity,
        "sum_freq": sum_freq(table),
        "blacklisted": int(jax.device_get(jnp.sum((occ & black).astype(jnp.int32)))),
        "delta_pending": int(jax.device_get(jnp.sum((occ & touched).astype(jnp.int32)))),
        "deleted_log": int(jax.device_get(table.deleted_count)),
        "bytes": int(table.payload.nbytes + table.header.nbytes),
    }


def load_factor(table: KvTable) -> float:
    return float(jax.device_get(size(table))) / table.capacity


def needs_grow(table: KvTable, incoming: int = 0,
               threshold: float = GROW_LOAD_FACTOR) -> bool:
    """Host-side check: will ``incoming`` more rows push past the load factor?"""
    cur = int(jax.device_get(size(table)))
    return (cur + incoming) > threshold * table.capacity


# ---------------------------------------------------------------------------
# optimizer slot registry (reference: slot_creator hook variable_scope.py:1027-1093)
# ---------------------------------------------------------------------------

def ensure_slots(table: KvTable, slot_specs: Dict[str, int]) -> KvTable:
    """Make sure slot segments exist in the payload: ``name -> width
    multiplier k`` appends ``k*dim`` zero columns (AdamV4's single
    ``m_v_linear`` 3×dim concat slot is the precedent —
    training_ops.cc:7156-7162). Call outside jit (payload width is static)."""
    layout = list(table.config.slot_layout)
    have = {name for name, _ in layout}
    extra = 0
    for name, k in slot_specs.items():
        if name not in have:
            layout.append((name, k))
            extra += k * table.dim
    if not extra:
        return table
    pad_shape = table.payload.shape[:-1] + (extra,)
    payload = jnp.concatenate(
        [table.payload, jnp.zeros(pad_shape, table.payload.dtype)], axis=-1)
    cfg = dataclasses.replace(table.config, slot_layout=tuple(layout))
    return dataclasses.replace(table, payload=payload, config=cfg)


def get_slot(table: KvTable, name: str) -> jnp.ndarray:
    """Whole slot segment [C, k*dim] (view — see ``KvTable.slots``)."""
    s, w = table.config.slot_columns()[name]
    return table.payload[..., s:s + w]


def set_slot_rows(table: KvTable, name: str, idx: jnp.ndarray,
                  rows: jnp.ndarray) -> KvTable:
    """Overwrite ``rows`` of one slot segment at row indices ``idx``
    (out-of-range indices dropped). Checkpoint-restore helper — NOT a hot
    path (it gathers+rewrites full payload rows)."""
    s, w = table.config.slot_columns()[name]
    cap = table.capacity
    ok = (idx >= 0) & (idx < cap)
    gidx = jnp.where(ok, idx, -1)
    cur = rowops.gather_rows(table.payload, gidx)
    cur = cur.at[:, s:s + w].set(rows.astype(cur.dtype))
    payload = rowops.scatter_rows(table.payload, gidx, cur)
    return dataclasses.replace(table, payload=payload)


# ---------------------------------------------------------------------------
# growth / rehash
# ---------------------------------------------------------------------------

def _rehash_core(table: KvTable, new_capacity: int):
    """Traceable rehash: returns ``(new_table, lost)`` where ``lost`` is the
    int32 count of live rows that failed placement at the new capacity
    (pathological bucket-pair collisions). Callable inside jit / vmap /
    shard_map — the sharded growth path runs this per-device so no shard
    ever moves through host memory."""
    occ = occupied_mask(table)
    new_header = _empty_header(new_capacity // _B)
    # Re-inserting C keys needs enough probe rounds even at momentary clustering.
    new_header, placed = _claim_insert(new_header, table.keys, occ,
                                       max(table.config.max_probes, 32))
    idx = jnp.where(occ & (placed >= 0), placed, new_capacity)
    w = table.payload.shape[1]
    new_payload = jnp.zeros((new_capacity, w), table.payload.dtype).at[idx].set(
        table.payload, mode="drop")
    new_header = _set_meta_at(new_header, idx, table.meta)
    lost = jnp.sum(occ & (placed < 0), dtype=jnp.int32)
    return dataclasses.replace(table, header=new_header,
                               payload=new_payload), lost


@partial(jax.jit, static_argnums=(1,))
def _rehash(table: KvTable, new_capacity: int) -> KvTable:
    return _rehash_core(table, new_capacity)[0]


def _rehash_double_core(table: KvTable, new_capacity: int):
    """Traceable DOUBLING rehash as a bucket-split permutation.

    At 2× capacity the bucket count ``g`` doubles and both bucket hashes
    are masked ``hash & (2g-1)``, so a resident row's new bucket is its
    old bucket plus (hash-bit ? g : 0) — computable arithmetically, no
    claim rounds. Every new bucket receives a SUBSET of exactly one old
    bucket's ≤16 rows (guaranteed fit — the destination lane is a
    per-source-bucket 16-wide exclusive cumsum, no global sort), except
    the rare ``b2 == b1 → +1`` adjustment edge, whose spill rows fall
    back to one claim-insert pass. Cost: elementwise hashing + one
    payload scatter vs the generic rehash's multi-round O(C) claim loop
    (PERF.md growth table).

    Returns ``(new_table, lost)`` like :func:`_rehash_core`.
    """
    cap = table.capacity
    assert new_capacity == 2 * cap
    occ = occupied_mask(table)                       # [C]
    keys = table.keys                                # [C, 2]
    g_old = cap // _B
    g_new = new_capacity // _B
    b1o, b2o = hashing.bucket_choices(keys, cap)
    b1n, b2n = hashing.bucket_choices(keys, new_capacity)
    slot_bucket = (jnp.arange(cap, dtype=jnp.int32) // _B)
    via1 = slot_bucket == b1o
    via2 = (~via1) & (slot_bucket == b2o)
    target = jnp.where(via1, b1n, jnp.where(via2, b2n, -1))
    # a split row's target is its own bucket or its high half — ranking is
    # LOCAL to the 16-lane source bucket (per-half exclusive cumsum), so no
    # global sort is needed (an 8M argsort also wedged the remote XLA
    # compiler for 30+ min; the cumsum compiles instantly)
    in_split = occ & ((target == slot_bucket)
                      | (target == slot_bucket + g_old))
    beta = target == (slot_bucket + g_old)           # high-half bit
    ind0 = (in_split & ~beta).reshape(g_old, _B).astype(jnp.int32)
    ind1 = (in_split & beta).reshape(g_old, _B).astype(jnp.int32)
    r0 = jnp.cumsum(ind0, axis=1) - ind0             # exclusive rank ≤ 15
    r1 = jnp.cumsum(ind1, axis=1) - ind1
    lane = jnp.where(beta, r1.reshape(-1), r0.reshape(-1))
    placed = jnp.where(in_split, target * _B + lane, -1)

    dst = jnp.where(occ & (placed >= 0), placed, new_capacity)
    new_header = _empty_header(g_new)
    flat = new_header.reshape(-1)
    flat = flat.at[_hpos_lo(dst)].set(keys[:, 0], mode="drop")
    flat = flat.at[_hpos_hi(dst)].set(keys[:, 1], mode="drop")
    new_header = flat.reshape(new_header.shape)
    w = table.payload.shape[1]
    new_payload = jnp.zeros((new_capacity, w), table.payload.dtype) \
        .at[dst].set(table.payload, mode="drop")
    new_header = _set_meta_at(new_header, dst, table.meta)
    out = dataclasses.replace(table, header=new_header, payload=new_payload)

    # adjustment-edge spill: rows whose subset overflowed a new bucket (or
    # fell outside both computed choices). Vanishingly rare — cond-gated so
    # the common case pays nothing; claim-insert handles the stragglers and
    # the payload rows ride the same dst scatter on the retry.
    spill = occ & (placed < 0)

    def place_spill(args):
        out, = args
        hdr, placed2 = _claim_insert(out.header, keys, spill,
                                     max(table.config.max_probes, 32))
        dst2 = jnp.where(spill & (placed2 >= 0), placed2, new_capacity)
        payload2 = out.payload.at[dst2].set(table.payload, mode="drop")
        hdr = _set_meta_at(hdr, dst2, table.meta)
        lost = jnp.sum(spill & (placed2 < 0), dtype=jnp.int32)
        return dataclasses.replace(out, header=hdr, payload=payload2), lost

    def no_spill(args):
        out, = args
        return out, jnp.zeros((), jnp.int32)

    return jax.lax.cond(jnp.any(spill), place_spill, no_spill, (out,))


@partial(jax.jit, static_argnums=(1,))
def _rehash_double(table: KvTable, new_capacity: int) -> KvTable:
    return _rehash_double_core(table, new_capacity)[0]


def _rehash_core_fast(table: KvTable, target: int):
    """Traceable best-path rehash to ``target``: chains doubling
    permutations for growth (capacities are static, so the chain unrolls
    at trace time), generic claim rehash for same-size rebuilds
    (compaction). Same ``(table, lost)`` contract as :func:`_rehash_core`;
    placement stays a pure function of (keys, layout, capacity), so the
    2D col-rank lockstep guarantee carries over."""
    if target == table.capacity:
        return _rehash_core(table, target)
    t = table
    lost = jnp.zeros((), jnp.int32)
    while t.capacity < target:
        t, l = _rehash_double_core(t, t.capacity * 2)
        lost = lost + l
    return t, lost


@partial(jax.jit, static_argnums=(1,))
def _rehash_fast(table: KvTable, new_capacity: int) -> KvTable:
    return _rehash_core_fast(table, new_capacity)[0]


def _rehash_verified(table: KvTable, new_capacity: int) -> KvTable:
    """_rehash, but NEVER lose rows: a pathological bucket-pair collision can
    overflow even at the new size (placed = -1 rows vanish silently in the
    raw rehash). Verify the live count and double the capacity until every
    row lands — rebuilds always start from the ORIGINAL table."""
    before = int(jax.device_get(size(table)))
    cap = new_capacity
    for _ in range(5):
        out = _rehash_fast(table, cap)
        if int(jax.device_get(size(out))) == before:
            return out
        cap *= 2
    raise RuntimeError(
        f"rehash lost rows even at {cap // 2}x capacity ({before} live)")


def grow(table: KvTable, new_capacity: Optional[int] = None) -> KvTable:
    """Host-mediated growth between steps: re-allocate at 2× (or given)
    capacity and rehash every live row. Replaces the reference's lock-guarded
    incremental map growth with an infrequent bulk rebuild."""
    new_capacity = new_capacity or table.capacity * 2
    if new_capacity & (new_capacity - 1):
        raise ValueError("new_capacity must be a power of two")
    if new_capacity < table.capacity:
        raise ValueError("cannot shrink below current capacity")
    return _rehash_verified(table, new_capacity)


def grow_to_fit(table: KvTable, incoming: int = 0,
                threshold: float = GROW_LOAD_FACTOR) -> KvTable:
    """Grow by as many doublings as needed so that current rows + ``incoming``
    sit under the load-factor threshold (one doubling can be too little when
    a batch brings more new keys than the current capacity). No-op when the
    table already fits."""
    cur = int(jax.device_get(size(table)))
    cap = table.capacity
    while (cur + incoming) > threshold * cap:
        cap *= 2
    if cap == table.capacity:
        return table
    return _rehash_verified(table, cap)


def compact(table: KvTable) -> KvTable:
    """Rebuild at the same capacity to clear tombstones after heavy deletion
    (grows instead if the rebuild cannot place every row)."""
    return _rehash_verified(table, table.capacity)


def _consume_deletes(table: KvTable, deltalist: str) -> KvTable:
    """Advance ``deltalist``'s watermark past the current deletion log.

    Without ``config.support_prediction_delta`` (the common single-stream
    case, matching the reference with support_prediction_delta_ off) the
    ring simply resets. With it, entries stay until BOTH streams have
    exported them (the reference copies train_deltalist_ into
    prediction_deltalist_ on train export, dynamic_save.hpp:186-191);
    fully-consumed entries compact away, and the overflow flag — which
    poisons every stream's delta until seen — clears only once no stream
    still has pending entries."""
    empty_row = jnp.array([hashing.EMPTY_LO, hashing.EMPTY_HI], jnp.int32)
    if not table.config.support_prediction_delta:
        return dataclasses.replace(
            table,
            deleted_keys=jnp.broadcast_to(empty_row,
                                          table.deleted_keys.shape).copy(),
            deleted_count=jnp.zeros((), jnp.int32),
            deleted_overflow=jnp.zeros((), bool),
            deleted_seen_train=jnp.zeros((), jnp.int32),
            deleted_seen_pred=jnp.zeros((), jnp.int32))
    count = table.deleted_count
    seen_t = count if deltalist == "train" else table.deleted_seen_train
    seen_p = count if deltalist == "pred" else table.deleted_seen_pred
    keep_from = jnp.minimum(seen_t, seen_p)
    rb = table.deleted_keys.shape[0]
    live = jnp.arange(rb)[:, None] < (count - keep_from)
    dk = jnp.where(live, jnp.roll(table.deleted_keys, -keep_from, axis=0),
                   empty_row)
    return dataclasses.replace(
        table, deleted_keys=dk, deleted_count=count - keep_from,
        deleted_overflow=table.deleted_overflow & ((count - keep_from) > 0),
        deleted_seen_train=seen_t - keep_from,
        deleted_seen_pred=seen_p - keep_from)


def pending_delete_span(table: KvTable, deltalist: str = "train"):
    """(start, count) of the ring entries pending for this stream."""
    start = (table.deleted_seen_train if deltalist == "train"
             else table.deleted_seen_pred)
    return start, table.deleted_count


def clear_deltalist(table: KvTable, deltalist: str = "train") -> KvTable:
    """Reset the delta-touch bits and consume the deletion log for this
    stream (device-side; the reference's deltalist swap on export,
    dynamic_save.hpp:180-193). The streaming saver uses this instead of
    materialising the table host-side."""
    bit = FLAG_TOUCH_TRAIN if deltalist == "train" else FLAG_TOUCH_PRED
    new_meta = table.meta & ~bit
    out = dataclasses.replace(
        table, header=_set_all_meta(table.header, new_meta))
    return _consume_deletes(out, deltalist)


# ---------------------------------------------------------------------------
# host-side export / import (feeds tfplus_tpu.checkpoint)
# ---------------------------------------------------------------------------

def export_arrays(table: KvTable, *, enable_cutoff: bool = False,
                  cutoff_value: float = 1e-20,
                  delta: bool = False,
                  deltalist: str = "train",
                  clear_deltalist: Optional[bool] = None,
                  as_of_unix_day: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Materialise the table's logical checkpoint tensors on host.

    Produces the same logical tensors as the reference export
    (dynamic_save.hpp:26-195; tensor naming kv_variable_ops.py:1458-1459):
    ``keys`` (uint64), ``values`` (f32[n, D]), ``init_table``, ``blacklist``
    (uint64 keys), ``freq_keys``/``freq_values`` (uint16). ``delta=True``
    restricts rows to the touched deltalist and clears it afterwards —
    the caller gets the cleared table via the ``"table"`` entry.

    ``enable_cutoff`` drops rows with max|v| < cutoff (kv_variable
    interface :54-55).
    """
    host = jax.device_get((table.keys, table.payload[:, :table.config.dim],
                           table.meta, table.init_pool))
    keys, values, meta, pool = (np.asarray(x) for x in host)
    occ = ~((keys[:, 0] == hashing.EMPTY_LO) & (keys[:, 1] == hashing.EMPTY_HI)) \
        & ~((keys[:, 0] == hashing.TOMB_LO) & (keys[:, 1] == hashing.TOMB_HI))
    sel = occ
    if delta:
        bit = int(FLAG_TOUCH_TRAIN if deltalist == "train" else FLAG_TOUCH_PRED)
        sel = sel & ((meta & bit) != 0)
    black = (meta & int(FLAG_BLACKLIST)) != 0
    if enable_cutoff:
        keep = np.abs(values).max(axis=1) >= cutoff_value
        sel = sel & (keep | black)   # blacklist rows survive cutoff as keys
    out_keys = hashing.decode_ids_np(keys[sel])
    # on-disk "meta" is the REFERENCE word (freq | day<<16,
    # embedding_value.h:229-234); flag bits are carried by the blacklist
    # tensor like the reference export does. The in-table day is a 13-bit
    # ring (unix_day mod 8192); the full unix day is reconstructed as
    # today − ring_age, exact for any row touched within the last 8192
    # days (~22 y) — assuming rows are stamped with packing.current_day()
    # ring days (docs/checkpointing.md). ``as_of_unix_day`` pins "today"
    # for deterministic tests.
    ref_meta = packing.reference_word_np(meta, as_of_unix_day)
    out = {
        "keys": out_keys,
        "values": values[sel].astype(np.float32),
        "init_table": pool.astype(np.float32),
        "blacklist": hashing.decode_ids_np(keys[occ & black]),
        "freq_keys": out_keys,
        "freq_values": (meta[sel] & packing.FREQ_MASK).astype(np.uint16),
        "meta": ref_meta[sel],
    }
    if delta:
        # this stream's pending deletion-log span → delete_keys; overflow
        # forces a full import on restore
        start_t, dcount_t = pending_delete_span(table, deltalist)
        dk, dstart, dcount, doverflow = jax.device_get(
            (table.deleted_keys, start_t, dcount_t, table.deleted_overflow))
        out["delete_keys"] = hashing.decode_ids_np(
            np.asarray(dk)[int(dstart):int(dcount)])
        out["need_full_import"] = bool(doverflow)
    if clear_deltalist is None:
        clear_deltalist = delta
    if clear_deltalist:
        # reference: deltalist swap on export (dynamic_save.hpp:180-193);
        # a full export also resets the baseline for subsequent deltas
        clear_bit = int(FLAG_TOUCH_TRAIN if deltalist == "train"
                        else FLAG_TOUCH_PRED)
        new_meta = jnp.asarray(meta & np.uint32(~clear_bit & 0xFFFFFFFF),
                               dtype=jnp.uint32)
        out["table"] = _consume_deletes(
            dataclasses.replace(table,
                                header=_set_all_meta(table.header, new_meta)),
            deltalist)
    return out


def import_arrays(table: KvTable, data: Dict[str, np.ndarray], *,
                  clear: bool = True, delete_keys: Optional[np.ndarray] = None,
                  day: Optional[int] = None) -> KvTable:
    """Load exported tensors back (parity: ImportValues / DeltaImport,
    dynamic_restore.hpp:29-262). ``clear=False`` gives delta/merge upsert
    semantics. Grows the table as needed before inserting."""
    n = int(np.asarray(data["keys"]).shape[0])
    if clear:
        fresh = create(table.dim, table.capacity,
                       initializer=np.asarray(data.get("init_table",
                                                       jax.device_get(table.init_pool))),
                       enter_threshold=table.config.enter_threshold,
                       max_probes=table.config.max_probes,
                       value_dtype=table.config.value_dtype,
                       name=table.config.name)
        fresh = ensure_slots(fresh, dict(table.config.slot_layout))
        table = fresh
    cap = table.capacity
    cur = 0 if clear else int(jax.device_get(size(table)))
    while (cur + n) > GROW_LOAD_FACTOR * cap:
        cap *= 2
    if cap != table.capacity:
        table = grow(table, cap)

    # deletes FIRST, then upserts: the deletion log is append-only, so a key
    # deleted and then RE-INSERTED between exports appears in BOTH lists —
    # the upsert must win (delete-after-upsert killed the live row; caught by
    # tests/test_fuzz_table.py's lineage fuzz)
    if delete_keys is not None and np.asarray(delete_keys).size:
        qd = hashing.encode_ids_np_to_device(np.asarray(delete_keys))
        table, _ = delete(table, qd)

    if n:
        q = hashing.encode_ids_np_to_device(np.asarray(data["keys"]))
        vals = jnp.asarray(np.asarray(data["values"]),
                           dtype=table.payload.dtype)
        freq = np.zeros((n,), np.uint32)
        if "meta" in data:
            meta_in = np.asarray(data["meta"], dtype=np.uint32)
            freq = meta_in & packing.FREQ_MASK
            days = meta_in >> 16
        elif "freq_values" in data and len(np.asarray(data["freq_values"])) == n:
            freq = np.asarray(data["freq_values"]).astype(np.uint32)
            days = np.full((n,), day if day is not None else packing.current_day(),
                           np.uint32)
        else:
            days = np.full((n,), day if day is not None else packing.current_day(),
                           np.uint32)
        black_np = np.zeros((n,), bool)
        bl = np.asarray(data.get("blacklist", np.zeros((0,), np.uint64)))
        if bl.size:
            black_np = np.isin(np.asarray(data["keys"]).astype(np.uint64),
                               bl.astype(np.uint64))
        # insert with meta; emulate per-row day by packing meta directly
        table = insert(table, q, vals, freq=jnp.asarray(freq),
                       blacklist=jnp.asarray(black_np), day=0)
        # bucket overflow can silently drop placements even under the load
        # threshold (both candidate buckets full). A user-facing insert may
        # drop by contract, but a checkpoint RESTORE must never lose rows —
        # grow (which disperses the colliding buckets) and re-insert; the
        # insert is idempotent (values/freq/flags are SET, not accumulated).
        fr = find(table, q)
        for _ in range(4):
            if not bool(jax.device_get(jnp.any(~fr.found))):
                break
            table = grow(table)
            table = insert(table, q, vals, freq=jnp.asarray(freq),
                           blacklist=jnp.asarray(black_np), day=0)
            fr = find(table, q)
        else:
            missing = int(jax.device_get(jnp.sum(~fr.found)))
            raise RuntimeError(
                f"import could not place {missing} rows after 4 grows")
        # overwrite meta with exact packed values (restores per-row day,
        # keeps the just-set touch/blacklist flag bits)
        idx = jnp.where(fr.found, fr.slot, table.capacity)
        fl = (packing.FLAG_TOUCH_BOTH
              | np.where(black_np, packing.FLAG_BLACKLIST, np.uint32(0)))
        packed = jnp.asarray(((days.astype(np.uint32) & packing.DAY_MASK) << 16)
                             | (freq & packing.FREQ_MASK) | fl,
                             dtype=jnp.uint32)
        header = _set_meta_at(table.header, idx, packed)
        table = dataclasses.replace(table, header=header)
    return table
