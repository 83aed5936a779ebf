"""Mesh-sharded serving: shard-parallel ``lookup_or_zeros`` (f32 AND int8
row-quantized) under ``shard_map``, plus per-shard online delta refresh.

The reference's serving story is per-PS-shard checkpoint addressing — a
ranking service loads each ``name/part_i`` shard next to its consumers
(common/ranking_utils.py:100-146). The TPU-native equivalent places one
table shard per mesh device (the same ``key % S`` routing the trainer
uses) and answers batch queries with the trainer's all-to-all exchange,
inference-only: no counts, no insertion, read-only tables — so a
vocabulary too large for one chip's HBM serves from the whole mesh, and
int8 quantization stacks another 4x rows/chip on top.

Round-3 verdict #5; round-4 addition.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..kv import hashing, table as kvt, unique as kvu
from ..kv import quant as kvq
from . import sharded_table as st
from .mesh import TABLE_AXIS, table_sharding


def _lookup_fn(table):
    """Owner-side read for one received key block: f32 or int8 table."""
    if isinstance(table, kvq.QuantKvTable):
        return kvq.lookup_or_zeros
    return kvt.lookup_or_zeros


def sharded_serving_lookup(table_local, ids, *, axis_name: str = TABLE_AXIS,
                           bucket_capacity: Optional[int] = None,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-device body (call inside ``shard_map``): inference lookup over a
    row-sharded KvTable OR QuantKvTable (leading axis 1). Unknown /
    blacklisted keys read zeros; tables are never mutated.

    Returns ``(rows [B_l, D], route_overflow bool, needed_bucket_capacity
    int32)`` — the last two are replicated (pmax'd) so the host can raise
    the static bucket knob and re-issue the query batch; a serving query
    must never silently lose an id either (round-3 verdict #3 discipline).
    """
    table = jax.tree_util.tree_map(lambda x: x[0], table_local)
    S = jax.lax.psum(1, axis_name)
    q = (ids if (ids.ndim == 2 and ids.shape[-1] == 2)
         else hashing.encode_ids_raw(ids))
    bl = q.shape[0]
    valid = jnp.ones((bl,), bool)
    cap = bucket_capacity or max(16, -(-bl * 2 // S))

    u = kvu.unique_with_counts(q, valid)
    uvalid = ~hashing.is_empty(u.unique_keys)
    owner = hashing.shard_of(u.unique_keys, S)
    dest, send_keys, overflow, max_dest = st._bucket(
        u.unique_keys, owner, uvalid, S, cap)
    route_overflow = jax.lax.pmax(overflow.astype(jnp.int32), axis_name) > 0
    needed = jax.lax.pmax(max_dest, axis_name)

    recv_keys = jax.lax.all_to_all(
        send_keys.reshape(S, cap, 2), axis_name, 0, 0, tiled=False
    ).reshape(S * cap, 2)
    # read-only and duplicate-safe: no owner-side dedup needed; padding
    # slots hold EMPTY sentinels which read as zeros by contract
    own_rows = _lookup_fn(table)(table, recv_keys)

    back = jax.lax.all_to_all(
        own_rows.reshape(S, cap, -1), axis_name, 0, 0, tiled=False
    ).reshape(S * cap, -1)
    pad_row = jnp.zeros((1, back.shape[-1]), back.dtype)
    back = jnp.concatenate([back, pad_row], axis=0)   # slot S*cap = dropped
    rows = back[dest][u.inverse]
    return rows, route_overflow, needed


def make_serving_lookup(stacked, mesh, *, axis_name: str = TABLE_AXIS,
                        bucket_capacity: Optional[int] = None):
    """Host convenience: jitted ``fn(ids[B]) -> rows[B, D]`` over a stacked
    mesh-placed sharded serving table (f32 KvTable or int8 QuantKvTable).
    ``B`` must divide the mesh size. Raises at query time if the exchange
    bucket would drop an id — re-issue with a larger ``bucket_capacity``."""
    from jax import shard_map
    tspec = jax.tree_util.tree_map(lambda _: P(axis_name), stacked)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(tspec, P(axis_name)),
                       out_specs=(P(axis_name), P(), P()), check_vma=False)
    def run(tab, ids):
        return sharded_serving_lookup(tab, ids, axis_name=axis_name,
                                      bucket_capacity=bucket_capacity)

    def lookup(ids):
        rows, ovf, needed = run(stacked, ids)
        if bool(jax.device_get(ovf)):
            raise RuntimeError(
                f"serving exchange bucket overflow — re-issue with "
                f"bucket_capacity >= {int(jax.device_get(needed))}")
        return rows

    return lookup


def _uniform_capacity(rows: int, load_factor: float) -> int:
    cap = 64
    while cap * load_factor < max(rows, 1):
        cap *= 2
    return cap


def stack_shards(shards: list, mesh=None, *, axis_name: str = TABLE_AXIS):
    """Stack per-shard tables (all one capacity) into the leading-axis
    layout and place them on the mesh (shard i -> mesh position i)."""
    caps = {s.capacity for s in shards}
    if len(caps) != 1:
        target = max(caps)
        if any(isinstance(s, kvq.QuantKvTable) for s in shards):
            raise ValueError(
                "quantized shards must share one capacity — re-load with "
                "uniform templates (quantize AFTER sizing)")
        shards = [kvt.grow(s, target) if s.capacity < target else s
                  for s in shards]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *shards)
    if mesh is not None:
        stacked = jax.device_put(stacked, table_sharding(mesh, axis_name))
    return stacked


def load_for_serving_sharded(directory: str, mesh, *,
                             quantize: bool = False,
                             load_factor: float = 0.5,
                             axis_name: str = TABLE_AXIS):
    """Load an ``export_for_serving`` directory onto a device mesh: each
    table becomes a stacked row-sharded (``key % S``) serving table, one
    shard per mesh device — the restore is elastic (saver repartition), so
    the export's shard count need not match the mesh. ``quantize=True``
    stores int8 rows (4x rows/chip on top of the mesh fan-out).

    Returns ``(tables, metadata)`` with tables ready for
    :func:`make_serving_lookup`."""
    from ..checkpoint import bundle, saver
    from ..serving import RankingMetadata

    S = int(np.prod(mesh.devices.shape))
    join = (lambda a, b: a.rstrip("/") + "/" + b)
    metadata = RankingMetadata.load(
        join(directory, "rank_service_embedding.json"))
    reader = bundle.BundleReader(join(directory, "serving"))
    tables = {}
    for col in metadata._columns:
        dim = col["embedding_dim"]
        names = [k[:-len("-keys")] for k in col["embedding_var_keys"]]
        var = names[0].split("/part_")[0]
        total = sum(reader.shape(n + "-keys")[0] for n in names)
        cap = _uniform_capacity(-(-total // S), load_factor)
        tmpl = {var: [kvt.create(dim, cap) for _ in range(S)]}
        restored = saver.restore(reader, tmpl)[0][var]
        if quantize:
            caps = {s.capacity for s in restored}
            if len(caps) != 1:                    # grow BEFORE quantizing
                target = max(caps)
                restored = [kvt.grow(s, target) if s.capacity < target
                            else s for s in restored]
            restored = [kvq.quantize_table(s) for s in restored]
        tables[var] = stack_shards(list(restored), mesh,
                                   axis_name=axis_name)
    return tables, metadata


def refresh_sharded_from_delta(tables: dict, delta_prefix: str, mesh, *,
                               quantize: bool = False,
                               axis_name: str = TABLE_AXIS) -> dict:
    """Apply a DELTA checkpoint to mesh-sharded serving tables PER SHARD —
    online model refresh without a full reload (the reference's delta
    lineage exists exactly for cheap frequent snapshots). The delta's shard
    count must equal the mesh size (the natural deployment: trainer and
    serving mesh share ``key % S``; a topology change takes a full reload).
    Each shard's upsert runs host-side on its slice and the refreshed
    shard is re-placed on the mesh.

    ``quantize`` must match how the tables were loaded; quantized shards
    dequantize, upsert, re-quantize (same contract as
    ``serving.refresh_from_delta``)."""
    from .. import serving as _serving

    S = int(np.prod(mesh.devices.shape))
    out = {}
    for name, stacked in tables.items():
        host = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), stacked)
        shards = [jax.tree_util.tree_map(lambda x: jnp.asarray(x[i]), host)
                  for i in range(S)]
        refreshed = _serving.refresh_from_delta(
            {name: shards}, delta_prefix, quantize=quantize)[name]
        out[name] = stack_shards(list(refreshed), mesh, axis_name=axis_name)
    return out
