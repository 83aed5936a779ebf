"""Mesh helpers for sharded-embedding training.

The reference scales out with async PS/worker data parallelism + mod-hashed
table sharding over parameter servers (SURVEY.md §2.4). The TPU-native
replacement is a device mesh: tables row-sharded over the ``table`` axis,
batches sharded over the same devices, synchronous all-to-all exchange over
ICI compiled by XLA (§5.8).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TABLE_AXIS = "mp"


def make_mesh(num_devices: int | None = None, axis_name: str = TABLE_AXIS) -> Mesh:
    """1-D mesh over all (or the first N) devices. Batch AND tables are both
    sharded over this axis — the DLRM-style layout where every device owns
    1/N of each table and 1/N of the global batch."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def table_sharding(mesh: Mesh, axis_name: str = TABLE_AXIS) -> NamedSharding:
    """Sharding for ShardedKvTable arrays (leading shard axis)."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize JAX's multi-host runtime for a real pod slice.

    Thin wrapper over ``jax.distributed.initialize`` (which itself reads the
    TPU metadata / env on Cloud TPU). Returns True if a multi-process
    runtime came up, False for the single-process fallback. Call ONCE before
    any other JAX API; after it, ``jax.devices()`` spans the slice and the
    mesh builders here shard over all of it.
    """
    import jax
    if jax.process_count() > 1:
        return True
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_count() > 1
    except Exception:
        # single host (or no coordinator reachable): local devices only
        return False
