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

Multi-process (``jax.distributed``): every process attaches tiers ONLY to
its addressable shards and runs the identical per-shard mechanics on its
slice; the global stacked array is reassembled from each process's local
shards (``jax.make_array_from_single_device_arrays``), and post-promotion
capacities are agreed collectively so shard_map shapes stay uniform —
same discipline as the device-side growth path.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kv import hashing, storage as kvs, table as kvt
from .mesh import TABLE_AXIS, table_sharding


def _addressable_indices(stacked: kvt.KvTable) -> List[int]:
    """Global shard indices this process can read/write (leading axis)."""
    return sorted(s.index[0].start or 0
                  for s in stacked.header.addressable_shards)


class ShardedHybridTable:
    """Two-tier wrapper around a stacked mesh-placed sharded KvTable: one
    :class:`~tfplus_tpu.kv.storage.HostStorageTier` per ADDRESSABLE shard,
    spill and prefetch routed by the same ``key % S`` the exchange uses.
    Works single-controller and under ``jax.distributed`` (each process
    sweeps only its own shards)."""

    def __init__(self, stacked: kvt.KvTable, mesh=None, *,
                 max_live_per_shard: Optional[int] = None,
                 min_freq: Optional[int] = None,
                 older_than_days: Optional[int] = None,
                 axis_name: str = TABLE_AXIS):
        self.table = stacked
        self.mesh = mesh
        self.axis_name = axis_name
        self.num_shards = stacked.header.shape[0]
        self.multiprocess = jax.process_count() > 1
        if self.multiprocess and mesh is None:
            raise ValueError("multi-process hybrid needs the mesh")
        self.local_indices = (_addressable_indices(stacked)
                              if self.multiprocess
                              else list(range(self.num_shards)))
        w = stacked.payload.shape[-1]
        self.tiers: Dict[int, kvs.HostStorageTier] = {
            g: kvs.HostStorageTier(stacked.config.dim, w,
                                   np.dtype(stacked.config.value_dtype))
            for g in self.local_indices}
        self.max_live_per_shard = max_live_per_shard
        self.min_freq = min_freq
        self.older_than_days = older_than_days

    # -- internals ---------------------------------------------------------

    def _host_shards(self) -> Dict[int, kvt.KvTable]:
        """This process's shards as host-local tables {global_index: t}."""
        if not self.multiprocess:
            host = jax.tree_util.tree_map(
                lambda x: np.asarray(jax.device_get(x)), self.table)
            return {i: jax.tree_util.tree_map(lambda x: jnp.asarray(x[i]),
                                              host)
                    for i in range(self.num_shards)}

        def get(x, g):
            for s in x.addressable_shards:
                if (s.index[0].start or 0) == g:
                    return jnp.asarray(np.asarray(s.data)[0])
            raise AssertionError(f"shard {g} not addressable here")

        return {g: jax.tree_util.tree_map(lambda x: get(x, g), self.table)
                for g in self.local_indices}

    def _agree_capacity(self, shards: Dict[int, kvt.KvTable]) -> int:
        """Collectively agree on ONE per-shard capacity (promotion growth
        may have raised some shards; shard_map shapes must stay uniform)."""
        local_max = max(s.capacity for s in shards.values())
        if not self.multiprocess:
            return local_max
        from jax.experimental import multihost_utils
        caps = multihost_utils.process_allgather(
            np.asarray([local_max], np.int64))
        return int(np.max(caps))

    def _replace(self, shards: Dict[int, kvt.KvTable]) -> None:
        target = self._agree_capacity(shards)
        shards = {g: (kvt.grow(s, target) if s.capacity < target else s)
                  for g, s in shards.items()}
        if not self.multiprocess:
            ordered = [shards[i] for i in range(self.num_shards)]
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                             *ordered)
            if self.mesh is not None:
                stacked = jax.device_put(
                    stacked, table_sharding(self.mesh, self.axis_name))
            self.table = stacked
            return
        # multi-process: assemble the global array from this process's
        # local shards (every process contributes its own slice)
        sharding = table_sharding(self.mesh, self.axis_name)
        devs = list(self.mesh.devices.reshape(-1))
        host = {g: jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), s)
            for g, s in shards.items()}
        flat0, treedef = jax.tree_util.tree_flatten(host[self.local_indices[0]])

        def assemble(leaf_idx):
            arrays = [jax.device_put(
                jax.tree_util.tree_flatten(host[g])[0][leaf_idx][None],
                devs[g]) for g in self.local_indices]
            shape = (self.num_shards,) + flat0[leaf_idx].shape
            return jax.make_array_from_single_device_arrays(
                shape, sharding, arrays)

        leaves = [assemble(k) for k in range(len(flat0))]
        self.table = jax.tree_util.tree_unflatten(treedef, leaves)

    # -- protocol ----------------------------------------------------------

    def prefetch(self, ids) -> int:
        """Promote any spilled rows of ``ids`` back into their owner shards
        (values + optimizer slots + freq/day intact). Call BEFORE the step.
        Multi-process: every process calls this with the SAME global batch
        (collective — the reassembly needs all processes)."""
        ids = np.asarray(ids)
        if ids.ndim >= 1 and ids.shape[-1] == 2 and ids.dtype == np.int32:
            u64 = hashing.decode_ids_np(ids.reshape(-1, 2))
        else:
            u64 = ids.astype(np.uint64).reshape(-1)
        u64 = np.unique(u64)
        owner = (u64 % np.uint64(self.num_shards)).astype(np.int64)
        any_local = any(t.size for t in self.tiers.values())
        if not self.multiprocess and not any_local:
            return 0
        shards, total = None, 0
        for g in self.local_indices:
            mine = u64[owner == g]
            if mine.size == 0 or self.tiers[g].size == 0:
                continue
            if shards is None:
                shards = self._host_shards()
            shards[g], n = kvs.prefetch(shards[g], self.tiers[g], mine)
            total += n
        if self.multiprocess:
            # collective: every process must decide identically whether the
            # global table is reassembled this call (promote counts differ
            # per process, so agree on the union)
            from jax.experimental import multihost_utils
            totals = multihost_utils.process_allgather(
                np.asarray([total], np.int64))
            if int(np.sum(totals)) == 0:
                return 0
            if shards is None:
                shards = self._host_shards()
            self._replace(shards)
            return total
        if total:
            self._replace(shards)
        return total

    def maybe_spill(self, day: Optional[int] = None) -> int:
        """Demote cold rows of every local shard to its host tier until
        each shard's live count fits ``max_live_per_shard`` (plus the
        freq/age policies). Call AFTER the step. Multi-process: collective
        (all processes participate in the reassembly)."""
        shards = self._host_shards()
        total = 0
        for g in self.local_indices:
            shards[g], n = kvs.spill(
                shards[g], self.tiers[g],
                max_live=self.max_live_per_shard,
                min_freq=self.min_freq,
                older_than_days=self.older_than_days, day=day)
            total += n
        if self.multiprocess:
            from jax.experimental import multihost_utils
            totals = multihost_utils.process_allgather(
                np.asarray([total], np.int64))
            if int(np.sum(totals)) == 0:
                return 0
            self._replace(shards)
            return total
        if total:
            self._replace(shards)
        return total

    @property
    def logical_size(self) -> int:
        """Device + tier rows over THIS process's shards (multi-process:
        sum across processes for the global count)."""
        shards = self._host_shards()
        dev = sum(int(jax.device_get(kvt.size(s))) for s in shards.values())
        return dev + sum(t.size for t in self.tiers.values())

    def stats(self) -> dict:
        shards = self._host_shards()
        dev_sizes = {g: int(jax.device_get(kvt.size(s)))
                     for g, s in shards.items()}
        return {
            "device_rows_per_shard": [dev_sizes[g]
                                      for g in self.local_indices],
            "tier_rows_per_shard": [self.tiers[g].size
                                    for g in self.local_indices],
            "local_shard_indices": list(self.local_indices),
            "logical_size": sum(dev_sizes.values())
            + sum(t.size for t in self.tiers.values()),
        }
