"""Multi-table packing — several logical embedding tables in one physical
KvTable.

Equivalent of the reference's MultiLevelHashMap (hashmap.h:776-1004: logical
table id packed into the high bits of the 64-bit key, KEY_LENGTH=52-bit
payload; enabled by INNER_MULTI_LEVEL_MAP, with append_kv_variable_for_
multi_hash / ExportForMultiHash on top). Packing is a SEMANTICS feature —
one shared physical table with per-logical-table tag/untag and split export
(MultiLevelHashMap parity), and less per-table padding waste. It is NOT a
throughput feature on TPU: measured on real v5e the packed step runs at
0.61-0.73x the per-table step (PERF.md "Multi-table packing"), because XLA
already overlaps N small per-table passes while one fused pass serializes
against the rest of the model. Use per-table steps for speed.

Key layout here: high 12 bits = logical table id, low 52 bits = feature id
(same 52-bit payload budget as the reference).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import hashing, table as kvt

TABLE_BITS = 12
PAYLOAD_BITS = 52
MAX_LOGICAL_TABLES = 1 << TABLE_BITS
_PAYLOAD_MASK = np.uint64((1 << PAYLOAD_BITS) - 1)


def tag_ids(ids: np.ndarray | jnp.ndarray, logical_id: int):
    """Pack a logical-table id into the key's high bits."""
    if not 0 <= logical_id < MAX_LOGICAL_TABLES:
        raise ValueError(f"logical_id out of range: {logical_id}")
    if isinstance(ids, np.ndarray):
        u = ids.astype(np.uint64) & _PAYLOAD_MASK
        return (u | (np.uint64(logical_id) << np.uint64(PAYLOAD_BITS))).astype(np.uint64)
    # device path: encoded [N, 2] int32 keys — tag the high word
    enc = hashing.encode_ids_raw(ids) if ids.ndim == 1 else ids
    hi = enc[..., 1].astype(jnp.uint32)
    hi = (hi & jnp.uint32((1 << (PAYLOAD_BITS - 32)) - 1)) | \
        jnp.uint32(logical_id << (PAYLOAD_BITS - 32))
    return jnp.stack([enc[..., 0], hi.astype(jnp.int32)], axis=-1)


def untag_ids_np(keys: np.ndarray):
    """Split exported uint64 keys back into (logical_id, feature_id)."""
    u = keys.astype(np.uint64)
    return ((u >> np.uint64(PAYLOAD_BITS)).astype(np.int32),
            (u & _PAYLOAD_MASK).astype(np.uint64))


class MultiTable:
    """N logical embedding tables (same dim) over one physical KvTable.

    Mirrors the reference's multi-hash creator (variable_scope.py:67-103):
    register logical tables by name, look up with per-table id tagging.
    """

    def __init__(self, dim: int, capacity: int = 1 << 16, **kv_kwargs):
        self.table = kvt.create(dim, capacity, **kv_kwargs)
        self._names: List[str] = []

    def register(self, name: str) -> int:
        if name in self._names:
            return self._names.index(name)
        if len(self._names) >= MAX_LOGICAL_TABLES:
            raise ValueError("too many logical tables")
        self._names.append(name)
        return len(self._names) - 1

    def logical_id(self, name: str) -> int:
        return self._names.index(name)

    def tag(self, name: str, ids):
        return tag_ids(ids, self.logical_id(name))

    def export_split(self) -> Dict[str, dict]:
        """Per-logical-table export (parity: KvVariableExportForMultiHash,
        kernels/kv_variable_ops.cc:1019-1050)."""
        ex = kvt.export_arrays(self.table)
        tids, fids = untag_ids_np(ex["keys"])
        out = {}
        for i, name in enumerate(self._names):
            sel = tids == i
            out[name] = {
                "keys": fids[sel],
                "values": ex["values"][sel],
                "freq_values": ex["freq_values"][sel],
            }
        return out
