"""Elastic repartition-on-restore: load a checkpoint written with M table
shards into N shards.

Reference behaviour (common/util.py:306-401 CheckpointParser.generate_
dynamic_restore_group; RestoreMode NORMAL/MERGE/REPARTITION/REPARTITION_MERGE,
kv_variable_interface.h:37-42): keys are routed to shards by
``key % num_shards`` with **no renumbering** (embedding_ops.py:121-127), so
restore across a shard-count change is a re-mod of the keyed rows. Because
our optimizer slots live inside the table, slot state repartitions with the
rows automatically — the reference's MERGE mode for concat-slot optimizers
reduces to the same path.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..kv import table as kvt
from . import bundle, saver as _saver


def plan(ckpt_shards: int, want_shards: int) -> str:
    """Mirror the reference's restore-mode decision (constants.py:17-22)."""
    if ckpt_shards == want_shards:
        return "NORMAL"
    if want_shards == 1:
        return "MERGE"
    return "REPARTITION"


def _collect(reader: bundle.BundleReader, name: str, n_ckpt: int,
             suffix: str) -> np.ndarray:
    parts = []
    for i in range(n_ckpt):
        key = _saver.shard_name(name, i, n_ckpt) + suffix
        if key in reader:
            parts.append(reader.lookup(key))
    if not parts:
        return np.zeros((0,), np.uint64)
    return np.concatenate(parts, axis=0)


def restore_repartitioned(reader: bundle.BundleReader, name: str,
                          templates: Sequence[kvt.KvTable], n_ckpt: int,
                          *, delta: bool = False) -> List[kvt.KvTable]:
    """Read all M checkpoint shards of ``name`` and redistribute rows into
    ``len(templates)`` shards by ``key % N`` (string keys were fingerprinted
    at ingestion, matching utility.h:96-112 ModKeyImpl)."""
    n_want = len(templates)
    keys = _collect(reader, name, n_ckpt, "-keys").astype(np.uint64)
    values = _collect(reader, name, n_ckpt, "-values")
    meta = _collect(reader, name, n_ckpt, "-meta")
    blacklist = _collect(reader, name, n_ckpt, "-blacklist").astype(np.uint64)
    delete_keys = _collect(reader, name, n_ckpt, "-delete_keys").astype(np.uint64)
    # init pool comes from shard 0 (all shards share the distribution)
    it_key = _saver.shard_name(name, 0, n_ckpt) + "-init_table"
    init_table = reader.lookup(it_key) if it_key in reader else None

    slot_suffixes = sorted({
        k.split("-slot-", 1)[1] for k in reader.keys()
        if k.startswith(name) and "-slot-" in k
    })
    slot_rows = {s: _collect(reader, name, n_ckpt, f"-slot-{s}")
                 for s in slot_suffixes}

    assign = (keys % np.uint64(n_want)).astype(np.int64)
    out: List[kvt.KvTable] = []
    for i, template in enumerate(templates):
        sel = assign == i
        data: Dict[str, np.ndarray] = {
            "keys": keys[sel],
            "values": values[sel] if values.size else values.reshape(0, template.dim),
        }
        if meta.size:
            data["meta"] = meta[sel]
        if blacklist.size:
            data["blacklist"] = blacklist
        if init_table is not None:
            data["init_table"] = init_table
        dk = delete_keys[(delete_keys % np.uint64(n_want)).astype(np.int64) == i] \
            if delete_keys.size else None
        t = kvt.import_arrays(template, data, clear=not delta, delete_keys=dk)
        # redistribute optimizer slot rows
        if slot_suffixes and data["keys"].size:
            import jax.numpy as jnp
            from ..kv import hashing
            q = hashing.encode_ids_np_to_device(data["keys"])
            fr = kvt.find(t, q)
            idx = jnp.where(fr.found, fr.slot, -1)
            for s in slot_suffixes:
                rows = slot_rows[s][sel]
                k = rows.shape[1] // t.dim
                if s not in t.config.slot_columns():
                    t = kvt.ensure_slots(t, {s: k})
                t = kvt.set_slot_rows(t, s, idx, jnp.asarray(rows))
        out.append(t)
    return out
