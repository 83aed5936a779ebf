"""Embedding lookup ops over KvTables — forward path + gradient plumbing.

Parity with the reference's python layer (``tfplus/kv_variable/python/ops/
embedding_ops.py``): ``embedding_lookup`` (:242-276), ``embedding_lookup_sparse``
(:279-441, combiners sum/mean/sqrtn with optional weights),
``safe_embedding_lookup_sparse`` (:444-628, invalid-id pruning + empty-row
defaults), ``embedding_lookup_unique`` (:644-697), and the
dedup-before-lookup frequency accounting (:365-372).

TPU-native design: the reference's dynamic_partition → per-PS colocated
gather → dynamic_stitch becomes *dedup → single fused gather-or-insert →
inverse-index take*; ragged SparseTensor input becomes a fixed-size COO
``(ids[N], segment_ids[N], valid[N])`` triple (pad to N) so every shape is
static under jit. The multi-shard all-to-all path lives in
:mod:`tfplus_tpu.parallel.sharded_table`.

Training pattern (insert-on-lookup must mutate table state, and gradients
must flow to unique rows):

    look, table = lookup_unique(table, ids, train=True)
    def loss_fn(dense_params, rows):
        emb = combine(rows, look, combiner="mean")   # differentiable
        ...
    (dL/drows) = jax.grad(loss_fn, argnums=1)(params, look.rows)
    table = opt.apply(table, look.slot, dL_drows, ...)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kv import hashing, table as kvt, unique as kvu


def _canon_ids(ids) -> jnp.ndarray:
    """rank-1 input = raw ids (encode); rank-2 ``[N, 2]`` int32 = already
    encoded (passthrough); host int64/uint64 arrays = raw (split words)."""
    if isinstance(ids, np.ndarray) and ids.dtype in (np.int64, np.uint64):
        return hashing.encode_ids(ids)
    arr = jnp.asarray(ids)
    if arr.ndim == 1:
        return hashing.encode_ids_raw(arr)
    if arr.ndim == 2 and arr.shape[-1] == 2 and arr.dtype == jnp.int32:
        return arr
    raise ValueError(f"ids must be rank-1 raw or [N,2] encoded, got {arr.shape}")


class Lookup(NamedTuple):
    """Result of a deduplicated table lookup (static shapes, N = input size)."""
    rows: jnp.ndarray         # [N, D] unique rows (pads/blacklist = zeros)
    slot: jnp.ndarray         # int32[N] physical slots (-1 pad) — for optimizer
    inverse: jnp.ndarray      # int32[N] input position -> unique row index
    counts: jnp.ndarray       # int32[N] multiplicity per unique row
    valid: jnp.ndarray        # bool[N] validity of each *input* position
    num_unique: jnp.ndarray   # int32 scalar
    # raw payload/meta rows from the lookup (train mode) — pass to
    # SparseOptimizer.apply to skip its gathers (kv/table.py LookupResult)
    payload_rows: Optional[jnp.ndarray] = None
    meta_rows: Optional[jnp.ndarray] = None


def lookup_unique(table: kvt.KvTable, ids, *, train: bool = True,
                  valid: Optional[jnp.ndarray] = None,
                  day: int | jnp.ndarray = 0,
                  defer_meta: bool = False):
    """Dedup ids then gather (inserting on miss when training).

    Mirrors ``KvVariable.sparse_read`` routing on IS_TRAINING
    (kv_variable_ops.py:1057-1113) + ``unique_with_counts`` pre-pass.
    Returns ``(Lookup, new_table)``; eval mode never mutates.
    """
    q = _canon_ids(ids)
    n = q.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    u = kvu.unique_with_counts(q, valid)
    uvalid = ~hashing.is_empty(u.unique_keys)
    if train:
        res = kvt.lookup_or_insert(table, u.unique_keys, counts=u.counts,
                                   valid=uvalid, day=day,
                                   defer_meta=defer_meta)
        rows, slot, new_table = res.rows, res.slot, res.table
        prow, mrow = res.payload_rows, res.meta_rows
    else:
        fr = kvt.find(table, u.unique_keys, uvalid)
        # pass fr.meta: the meta_rows=None fallback would materialise the
        # whole [C] meta plane before its gather (optim/base.py note)
        rows = kvt._gather_rows(table, fr.slot, fr.found, fr.meta)
        slot = jnp.where(fr.found, fr.slot, -1)
        new_table = table
        prow = mrow = None
    return (Lookup(rows=rows, slot=slot, inverse=u.inverse, counts=u.counts,
                   valid=valid, num_unique=u.num_unique,
                   payload_rows=prow, meta_rows=mrow), new_table)


def gather(look: Lookup, rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Expand unique rows back to input order: ``out[i] = rows[inverse[i]]``
    (zeros at invalid positions). Pass ``rows`` explicitly inside a
    differentiated function so gradients flow to them."""
    rows = look.rows if rows is None else rows
    out = rows[look.inverse]
    return jnp.where(look.valid[:, None], out, jnp.zeros_like(out))


def embedding_lookup(table: kvt.KvTable, ids, *, train: bool = True,
                     valid: Optional[jnp.ndarray] = None,
                     day: int | jnp.ndarray = 0):
    """Dense lookup: ``ids`` of any shape → ``[..., D]`` (embedding_ops.py:242).

    Returns ``(embeddings, Lookup, new_table)`` — keep the Lookup to route
    gradients via :func:`grads_to_unique` / the optimizer.
    """
    # RAW ids of any shape — NEVER pre-encoded [N,2] keys: unlike the
    # rank-sensitive _canon_ids APIs, this function treats a 2-D input as
    # a 2-D BATCH of raw ids (a [B,2] raw batch is legitimate), so encoded
    # keys passed here would be re-encoded into garbage. Use lookup_unique
    # for encoded keys.
    ids_arr = hashing.encode_ids_raw(ids)
    batch_shape = ids_arr.shape[:-1]
    flat = ids_arr.reshape(-1, 2)
    if valid is not None:
        valid = valid.reshape(-1)
    look, new_table = lookup_unique(table, flat, train=train, valid=valid, day=day)
    emb = gather(look).reshape(*batch_shape, table.dim)
    return emb, look, new_table


_COMBINERS = ("sum", "mean", "sqrtn")


def combine(look: Lookup, segment_ids: jnp.ndarray, num_segments: int,
            rows: Optional[jnp.ndarray] = None,
            weights: Optional[jnp.ndarray] = None,
            combiner: str = "mean") -> jnp.ndarray:
    """Segment-combine looked-up rows into ``[num_segments, D]``.

    COO equivalent of ``embedding_lookup_sparse`` combiners
    (embedding_ops.py:408-440): sum / mean / sqrtn, weighted variants keep
    reference semantics (mean = Σwx/Σw, sqrtn = Σwx/√Σw²).
    Differentiable wrt ``rows`` (and ``weights``).
    """
    rows = look.rows if rows is None else rows
    x = rows[look.inverse]                      # [N, D] in input order
    return combine_rows(x, segment_ids, num_segments, valid=look.valid,
                        weights=weights, combiner=combiner)


def combine_rows(x: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int, *,
                 valid: Optional[jnp.ndarray] = None,
                 weights: Optional[jnp.ndarray] = None,
                 combiner: str = "mean") -> jnp.ndarray:
    """Combiner core over PER-POSITION rows ``x [N, D]`` (already in input
    order — e.g. ``parallel.sharded_lookup``'s batch rows). Same semantics
    as :func:`combine`; differentiable wrt ``x`` (and ``weights``)."""
    if combiner not in _COMBINERS:
        raise ValueError(f"combiner must be one of {_COMBINERS}")
    n = x.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    w = jnp.ones((n,), dtype=x.dtype) if weights is None else weights.astype(x.dtype)
    w = jnp.where(valid, w, 0.0)
    seg = jnp.where(valid, segment_ids, num_segments)  # pads dropped
    wx = x * w[:, None]
    num = jax.ops.segment_sum(wx, seg, num_segments=num_segments + 1)[:-1]
    if combiner == "sum":
        return num
    if combiner == "mean":
        den = jax.ops.segment_sum(w, seg, num_segments=num_segments + 1)[:-1]
    else:  # sqrtn
        den = jnp.sqrt(
            jax.ops.segment_sum(w * w, seg, num_segments=num_segments + 1)[:-1])
    return num / jnp.maximum(den, 1e-12)[:, None]


def embedding_lookup_sparse(table: kvt.KvTable, ids, segment_ids,
                            num_segments: int, *,
                            weights: Optional[jnp.ndarray] = None,
                            valid: Optional[jnp.ndarray] = None,
                            combiner: str = "mean", train: bool = True,
                            day: int | jnp.ndarray = 0):
    """COO sparse lookup + combine (embedding_ops.py:279-441).

    ``ids[N]`` with ``segment_ids[N]`` (row of each id, ascending not
    required) and ``valid[N]`` padding mask → ``[num_segments, D]``.
    Returns ``(combined, Lookup, new_table)``.
    """
    look, new_table = lookup_unique(table, ids, train=train, valid=valid, day=day)
    out = combine(look, jnp.asarray(segment_ids, jnp.int32), num_segments,
                  weights=weights, combiner=combiner)
    return out, look, new_table


def safe_embedding_lookup_sparse(table: kvt.KvTable, ids, segment_ids,
                                 num_segments: int, *,
                                 weights: Optional[jnp.ndarray] = None,
                                 valid: Optional[jnp.ndarray] = None,
                                 combiner: str = "mean", train: bool = True,
                                 default_id: Optional[int] = None,
                                 prune_negative: bool = True,
                                 day: int | jnp.ndarray = 0):
    """Safe variant (embedding_ops.py:444-628): prunes invalid ids and
    non-positive weights; empty rows get the ``default_id`` embedding (or
    zeros). ``ids`` may be raw int32/int64-encoded; negative ids are invalid.
    """
    q = _canon_ids(ids)
    n = q.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    # prune negative ids (the reference prunes invalid sparse entries
    # before lookup; TF ids are int64 with negative = padding). The sign
    # lives in the encoded HIGH word — which collides with the top bit of
    # uint64 string fingerprints (hashing.py spans the full 64-bit space),
    # so pruning auto-disables for raw uint64 inputs and can be turned off
    # explicitly (prune_negative=False) when passing pre-encoded
    # fingerprint keys.
    if prune_negative and not (isinstance(ids, np.ndarray)
                               and ids.dtype == np.uint64):
        valid = valid & (q[:, 1] >= 0)
    if weights is not None:
        valid = valid & (weights > 0)
    seg = jnp.asarray(segment_ids, jnp.int32)
    out, look, new_table = embedding_lookup_sparse(
        table, q, seg, num_segments, weights=weights, valid=valid,
        combiner=combiner, train=train, day=day)
    # rows with no surviving entries → default embedding
    present = jax.ops.segment_sum(valid.astype(jnp.int32),
                                  jnp.where(valid, seg, num_segments),
                                  num_segments=num_segments + 1)[:-1]
    empty = present == 0
    if default_id is not None:
        dq = hashing.encode_ids_np_to_device(np.array([default_id], np.int64))
        drow = kvt.lookup_or_zeros(new_table, dq)[0]
        out = jnp.where(empty[:, None], drow[None, :], out)
    else:
        out = jnp.where(empty[:, None], jnp.zeros_like(out), out)
    return out, look, new_table


def grads_to_unique(look: Lookup, grad_per_position: jnp.ndarray) -> jnp.ndarray:
    """Segment-sum per-input-position gradients onto unique rows — the
    deterministic replacement for the reference's IndexedSlices-with-raw-ids
    gradient (kv_variable_ops.py:1829-1856 + racy scatter-add)."""
    g = jnp.where(look.valid[:, None], grad_per_position,
                  jnp.zeros_like(grad_per_position))
    n = look.inverse.shape[0]
    return jax.ops.segment_sum(g, look.inverse, num_segments=n)


def partitioned_lookup(shards, ids, *, train: bool = True,
                       day: int | jnp.ndarray = 0):
    """Dense lookup over a PartitionedVariable-style shard list — the
    reference's single-process partitioned path (embedding_ops.py's
    dynamic_partition/stitch around per-partition gathers, routing by
    ``key % num_shards``; variable_scope partitioner). For mesh-distributed
    shards use ``parallel.sharded_lookup`` instead.

    ``shards``: list of KvTable (e.g. from ``get_kv_variable(num_shards=N)``)
    or a single table. Returns ``(rows [..., D], shards)``.
    """
    if isinstance(shards, kvt.KvTable):
        rows, _, t = embedding_lookup(shards, ids, train=train, day=day)
        return rows, t
    n_shards = len(shards)
    ids_arr = hashing.encode_ids_raw(ids)
    batch_shape = ids_arr.shape[:-1]
    flat = ids_arr.reshape(-1, 2)
    owner = hashing.shard_of(flat, n_shards)
    dim = shards[0].config.dim
    out = jnp.zeros((flat.shape[0], dim), shards[0].payload.dtype)
    new_shards = []
    for s, t in enumerate(shards):
        mine = owner == s
        # static shapes: every shard processes the full batch with a
        # validity mask (non-owned positions contribute nothing)
        look, t = lookup_unique(t, flat, train=train, valid=mine, day=day)
        out = jnp.where(mine[:, None], gather(look), out)
        new_shards.append(t)
    return out.reshape(*batch_shape, dim), new_shards
