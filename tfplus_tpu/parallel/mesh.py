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
