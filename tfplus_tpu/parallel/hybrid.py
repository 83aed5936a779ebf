"""Host storage tier composed with MESH-sharded tables — per-shard
spill/prefetch between steps, so a vocabulary that outgrows the mesh's
aggregate HBM budget keeps training (round-3 verdict #6).

Reference analogue: TableManager owning an EV map plus StorageTables
(hybrid_embedding/table_manager.h:45-72, storage_table.h:23-25 — the OSS
drop ships the MEM tier only; this composes the same tier idea with the
all-to-all sharded layout the reference never had).

Protocol per step, mirroring the single-device ``kv.storage.HybridTable``:

    hybrid.prefetch(batch_ids)     # promote spilled rows to their owner
                                   # shards BEFORE the step (a missed
                                   # spilled id would re-insert as fresh)
    tables, ... = jstep(hybrid.table, ...)
    hybrid.table = tables          # reassign the threaded pytree
    hybrid.maybe_spill(day=day)    # demote cold rows per shard to budget

Scope: single-controller meshes (every shard addressable from this
process). Under ``jax.distributed`` each process would attach tiers to its
OWN addressable shards and run the identical host-side mechanics on its
slice — the sweep below is written per-shard for exactly that reason, but
the multi-process wiring is not implemented (PARITY.md N7 scope note).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kv import hashing, storage as kvs, table as kvt
from .mesh import TABLE_AXIS, table_sharding


class ShardedHybridTable:
    """Two-tier wrapper around a stacked mesh-placed sharded KvTable: one
    :class:`~tfplus_tpu.kv.storage.HostStorageTier` per shard, spill and
    prefetch routed by the same ``key % S`` the exchange uses."""

    def __init__(self, stacked: kvt.KvTable, mesh=None, *,
                 max_live_per_shard: Optional[int] = None,
                 min_freq: Optional[int] = None,
                 older_than_days: Optional[int] = None,
                 axis_name: str = TABLE_AXIS):
        self.table = stacked
        self.mesh = mesh
        self.axis_name = axis_name
        self.num_shards = stacked.header.shape[0]
        w = stacked.payload.shape[-1]
        self.tiers: List[kvs.HostStorageTier] = [
            kvs.HostStorageTier(stacked.config.dim, w,
                                np.dtype(stacked.config.value_dtype))
            for _ in range(self.num_shards)]
        self.max_live_per_shard = max_live_per_shard
        self.min_freq = min_freq
        self.older_than_days = older_than_days

    # -- internals ---------------------------------------------------------

    def _host_shards(self) -> List[kvt.KvTable]:
        host = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), self.table)
        return [jax.tree_util.tree_map(lambda x: jnp.asarray(x[i]), host)
                for i in range(self.num_shards)]

    def _replace(self, shards: List[kvt.KvTable]) -> None:
        caps = {s.capacity for s in shards}
        if len(caps) != 1:          # a prefetch grew one shard: keep uniform
            target = max(caps)
            shards = [kvt.grow(s, target) if s.capacity < target else s
                      for s in shards]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *shards)
        if self.mesh is not None:
            stacked = jax.device_put(
                stacked, table_sharding(self.mesh, self.axis_name))
        self.table = stacked

    # -- protocol ----------------------------------------------------------

    def prefetch(self, ids) -> int:
        """Promote any spilled rows of ``ids`` back into their owner shards
        (values + optimizer slots + freq/day intact). Call BEFORE the step."""
        ids = np.asarray(ids)
        if ids.ndim >= 1 and ids.shape[-1] == 2 and ids.dtype == np.int32:
            u64 = hashing.decode_ids_np(ids.reshape(-1, 2))
        else:
            u64 = ids.astype(np.uint64).reshape(-1)
        u64 = np.unique(u64)
        owner = (u64 % np.uint64(self.num_shards)).astype(np.int64)
        if all(t.size == 0 for t in self.tiers):
            return 0
        shards, total, touched = None, 0, False
        for i in range(self.num_shards):
            mine = u64[owner == i]
            if mine.size == 0 or self.tiers[i].size == 0:
                continue
            if shards is None:
                shards = self._host_shards()
            shards[i], n = kvs.prefetch(shards[i], self.tiers[i], mine)
            total += n
            touched = touched or n > 0
        if touched:
            self._replace(shards)
        return total

    def maybe_spill(self, day: Optional[int] = None) -> int:
        """Demote cold rows of every shard to its host tier until each
        shard's live count fits ``max_live_per_shard`` (plus the freq/age
        policies). Call AFTER the step."""
        shards = self._host_shards()
        total = 0
        for i in range(self.num_shards):
            shards[i], n = kvs.spill(
                shards[i], self.tiers[i],
                max_live=self.max_live_per_shard,
                min_freq=self.min_freq,
                older_than_days=self.older_than_days, day=day)
            total += n
        if total:
            self._replace(shards)
        return total

    @property
    def logical_size(self) -> int:
        sizes = jax.device_get(jax.jit(jax.vmap(kvt.size))(
            jax.tree_util.tree_map(
                lambda x: np.asarray(jax.device_get(x)), self.table)))
        return int(np.sum(sizes)) + sum(t.size for t in self.tiers)

    def stats(self) -> dict:
        host = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), self.table)
        dev_sizes = [int(jax.device_get(kvt.size(jax.tree_util.tree_map(
            lambda x: jnp.asarray(x[i]), host))))
            for i in range(self.num_shards)]
        return {
            "device_rows_per_shard": dev_sizes,
            "tier_rows_per_shard": [t.size for t in self.tiers],
            "logical_size": sum(dev_sizes) + sum(t.size
                                                 for t in self.tiers),
        }
