"""Checkpoint save/restore for KvTables + dense state.

Reproduces the reference's logical checkpoint contract (SURVEY.md §5.4):
per table-shard tensors named ``<var>-keys``, ``-values``, ``-init_table``,
``-blacklist``, ``-freq_keys``, ``-freq_values`` (+ ``-need_full_import``,
``-delete_keys`` in delta mode) — naming from kv_variable_ops.py:1458-1459 —
with ``first_n`` selecting how many are written/read
(2 = kv only, 3 = inference, 4 = +blacklist, 6 = train, 8 = delta;
kv_variable_ops.py:1438-1466, dynamic_save.hpp first_n semantics). Sharded
tables use the reference's ``name/part_i`` naming (variable_scope.py:383-430)
and are re-shardable on restore because routing is ``key % num_shards``
(repartition.py).

Frequencies are saved as the full packed uint32 freq|day word (the SaveV3
``freq_use_uint32`` attr is the reference precedent, ops/kv_variable_ops.cc:
708-733) plus the legacy uint16 view for parity.

Dense (non-KV) state is any pytree of arrays saved under ``dense/<path>``.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Union

import jax
import numpy as np

from ..kv import table as kvt
from ..kv import hashing
from . import bundle

# saver modes (set_tfplus_saver_mode: 0 = prediction/inference, 1 = training)
FIRST_N_KV = 2
FIRST_N_INFERENCE = 3
FIRST_N_BLACKLIST = 4
FIRST_N_TRAIN = 6
FIRST_N_DELTA = 8

_SUFFIXES = ("-keys", "-values", "-init_table", "-blacklist",
             "-freq_keys", "-freq_values", "-need_full_import", "-delete_keys")

TableOrShards = Union[kvt.KvTable, Sequence[kvt.KvTable]]


def _shards(t: TableOrShards) -> List[kvt.KvTable]:
    return list(t) if isinstance(t, (list, tuple)) else [t]


def shard_name(name: str, i: int, n: int) -> str:
    return name if n == 1 else f"{name}/part_{i}"


def save_table(writer: bundle.BundleWriter, name: str, table: kvt.KvTable, *,
               first_n: int = FIRST_N_TRAIN, delta: bool = False,
               enable_cutoff: bool = False, cutoff_value: float = 1e-20,
               delete_keys: Optional[np.ndarray] = None,
               save_slots: bool = True) -> kvt.KvTable:
    """Write one table (shard) and return it (delta export clears the
    deltalist bits, so callers must keep the returned table)."""
    ex = kvt.export_arrays(table, enable_cutoff=enable_cutoff,
                           cutoff_value=cutoff_value, delta=delta,
                           clear_deltalist=delta or first_n >= FIRST_N_TRAIN)
    writer.add(name + "-keys", ex["keys"])
    writer.add(name + "-values", ex["values"])
    if first_n >= FIRST_N_INFERENCE:
        writer.add(name + "-init_table", ex["init_table"])
    if first_n >= FIRST_N_BLACKLIST:
        writer.add(name + "-blacklist", ex["blacklist"])
    if first_n >= FIRST_N_TRAIN:
        writer.add(name + "-freq_keys", ex["freq_keys"])
        writer.add(name + "-freq_values", ex["freq_values"])
        writer.add(name + "-meta", ex["meta"])   # packed uint32 freq|day
    if first_n >= FIRST_N_DELTA or delta:
        need_full = ex.get("need_full_import", not delta)
        writer.add(name + "-need_full_import",
                   np.array([1 if need_full else 0], np.int8))
        dk = delete_keys if delete_keys is not None else \
            ex.get("delete_keys", np.zeros((0,), np.uint64))
        writer.add(name + "-delete_keys", np.asarray(dk, np.uint64))
    if save_slots and first_n >= FIRST_N_TRAIN and table.slots:
        # optimizer slot rows for the same exported keys (train resume)
        sel_q = hashing.encode_ids_np_to_device(ex["keys"])
        fr = kvt.find(table, sel_q)
        safe = np.asarray(jax.device_get(
            jax.numpy.where(fr.found, fr.slot, 0)))
        for sname, arr in table.slots.items():
            host = np.asarray(jax.device_get(arr))
            writer.add(f"{name}-slot-{sname}", host[safe])
    return ex.get("table", table)


def restore_table(reader: bundle.BundleReader, name: str,
                  template: kvt.KvTable, *, delta: bool = False) -> kvt.KvTable:
    """Load one table (shard) into a fresh copy of ``template``."""
    data = {
        "keys": reader.lookup(name + "-keys"),
        "values": reader.lookup(name + "-values"),
    }
    if name + "-init_table" in reader:
        data["init_table"] = reader.lookup(name + "-init_table")
    if name + "-blacklist" in reader:
        data["blacklist"] = reader.lookup(name + "-blacklist")
    if name + "-meta" in reader:
        data["meta"] = reader.lookup(name + "-meta")
    elif name + "-freq_values" in reader:
        data["freq_values"] = reader.lookup(name + "-freq_values")
    delete_keys = (reader.lookup(name + "-delete_keys")
                   if name + "-delete_keys" in reader else None)
    table = kvt.import_arrays(template, data, clear=not delta,
                              delete_keys=delete_keys)
    # restore optimizer slot rows
    slot_names = [k[len(name) + 6:] for k in reader.keys()
                  if k.startswith(name + "-slot-")]
    if slot_names and data["keys"].size:
        q = hashing.encode_ids_np_to_device(data["keys"])
        fr = kvt.find(table, q)
        import jax.numpy as jnp
        idx = jnp.where(fr.found, fr.slot, -1)
        for sname in slot_names:
            rows = np.asarray(reader.lookup(f"{name}-slot-{sname}"))
            k = rows.shape[1] // table.dim
            if sname not in table.config.slot_columns():
                table = kvt.ensure_slots(table, {sname: k})
            table = kvt.set_slot_rows(table, sname, idx, jnp.asarray(rows))
    return table


def _save_into(w, tables: Dict[str, TableOrShards],
               dense: Optional[dict], *, first_n: int, delta: bool,
               enable_cutoff: bool, cutoff_value: float
               ) -> Dict[str, TableOrShards]:
    """Write every tensor through ``w.add`` (a BundleWriter or collector)."""
    out: Dict[str, TableOrShards] = {}
    for name, t in tables.items():
        shards = _shards(t)
        ns = len(shards)
        new_shards = [
            save_table(w, shard_name(name, i, ns), s, first_n=first_n,
                       delta=delta, enable_cutoff=enable_cutoff,
                       cutoff_value=cutoff_value)
            for i, s in enumerate(shards)
        ]
        w.add(name + "-num_shards", np.array([ns], np.int32))
        out[name] = (new_shards if isinstance(t, (list, tuple))
                     else new_shards[0])
    if dense is not None:
        flat, _ = jax.tree_util.tree_flatten_with_path(dense)
        for path, leaf in flat:
            key = "dense/" + "/".join(_path_str(p) for p in path)
            w.add(key, np.asarray(jax.device_get(leaf)))
    return out


def save(prefix: str, tables: Dict[str, TableOrShards],
         dense: Optional[dict] = None, *, first_n: int = FIRST_N_TRAIN,
         delta: bool = False, num_file_shards: int = 1,
         enable_cutoff: bool = False,
         cutoff_value: float = 1e-20) -> Dict[str, TableOrShards]:
    """Save all tables (+ optional dense pytree) under ``prefix``.

    Returns the (possibly deltalist-cleared) tables, same structure as input.
    """
    with bundle.BundleWriter(prefix, num_file_shards) as w:
        return _save_into(w, tables, dense, first_n=first_n, delta=delta,
                          enable_cutoff=enable_cutoff,
                          cutoff_value=cutoff_value)


class _Collector:
    """Buffers (name, host array) pairs for a deferred bundle write."""

    def __init__(self):
        self.items: List[tuple] = []

    def add(self, name: str, array: np.ndarray):
        self.items.append((name, np.asarray(jax.device_get(array))))


class AsyncSave:
    """Handle for a background checkpoint write (``save_async``)."""

    def __init__(self, thread, box):
        self._thread = thread
        self._box = box

    def done(self) -> bool:
        return not self._thread.is_alive()

    def result(self, timeout: Optional[float] = None):
        """Block until the write finishes; re-raises writer errors."""
        self._thread.join(timeout)
        if self._thread.is_alive():
            raise TimeoutError("checkpoint write still running")
        if self._box.get("exc") is not None:
            raise self._box["exc"]
        return self._box.get("value")


def save_async(prefix: str, tables: Dict[str, TableOrShards],
               dense: Optional[dict] = None, *, first_n: int = FIRST_N_TRAIN,
               delta: bool = False, num_file_shards: int = 1,
               enable_cutoff: bool = False, cutoff_value: float = 1e-20
               ) -> tuple:
    """Non-blocking save: exports + device→host transfers happen NOW (so the
    returned tables carry the cleared delta bits and training may proceed,
    donating its buffers), while the disk write — the slow part for multi-GB
    tables — runs in a background thread. The index publish stays atomic, so
    a crash mid-write never leaves a readable half checkpoint.

    Returns ``(tables, AsyncSave)``; call ``.result()`` before relying on the
    checkpoint (e.g. before GC'ing its predecessor).
    """
    import threading
    col = _Collector()
    out = _save_into(col, tables, dense, first_n=first_n, delta=delta,
                     enable_cutoff=enable_cutoff, cutoff_value=cutoff_value)
    box: dict = {"exc": None, "value": None}

    def _write():
        try:
            with bundle.BundleWriter(prefix, num_file_shards) as w:
                for name, arr in col.items:
                    w.add(name, arr)
            box["value"] = prefix
        except BaseException as e:   # surfaced via .result()
            box["exc"] = e

    th = threading.Thread(target=_write, name=f"ckpt-write:{prefix}",
                          daemon=True)
    th.start()
    return out, AsyncSave(th, box)


def _path_str(p) -> str:
    s = str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
    return re.sub(r"[^\w.\-]", "_", s)


def restore(prefix: str, tables: Dict[str, TableOrShards],
            dense: Optional[dict] = None, *, delta: bool = False):
    """Restore tables saved by :func:`save` into templates shaped like
    ``tables`` — including elastic repartition when the checkpoint shard
    count differs from the requested one (see repartition.py).

    Returns ``(tables, dense)``.
    """
    from . import repartition
    from ..utils.progress import ProgressBar, MIN_ROWS_FOR_BAR
    reader = (prefix if hasattr(prefix, "lookup")     # any reader-like
              else bundle.BundleReader(prefix))
    out: Dict[str, TableOrShards] = {}
    for name, t in tables.items():
        want = _shards(t)
        n_want = len(want)
        n_ckpt = int(reader.lookup(name + "-num_shards")[0]) \
            if name + "-num_shards" in reader else 1
        # progress for big restores (reference: utils/progress_bar.{h,cc},
        # drawn during long restores)
        ckpt_rows = sum(
            reader.num_elements(shard_name(name, i, n_ckpt) + "-keys") or 0
            for i in range(n_ckpt)) if hasattr(reader, "num_elements") else 0
        bar = ProgressBar(f"restore {name}", total=max(n_want, 1),
                          enabled=None if ckpt_rows >= MIN_ROWS_FOR_BAR
                          else False)
        if n_ckpt == n_want:
            shards = []
            for i in range(n_want):
                shards.append(restore_table(
                    reader, shard_name(name, i, n_want), want[i],
                    delta=delta))
                bar.update(1)
        else:
            shards = repartition.restore_repartitioned(
                reader, name, want, n_ckpt, delta=delta)
            bar.update(n_want)
        bar.done()
        out[name] = shards if isinstance(t, (list, tuple)) else shards[0]
    new_dense = None
    if dense is not None:
        flat, treedef = jax.tree_util.tree_flatten_with_path(dense)
        leaves = []
        for path, leaf in flat:
            key = "dense/" + "/".join(_path_str(p) for p in path)
            arr = reader.lookup(key)
            import jax.numpy as jnp
            leaves.append(jnp.asarray(arr, dtype=leaf.dtype).reshape(leaf.shape))
        new_dense = jax.tree_util.tree_unflatten(treedef, leaves)
    return out, new_dense


# ---------------------------------------------------------------------------
# Multi-host (multi-process) checkpointing — coordinator-free: every process
# writes its OWN bundle with globally-numbered table shards; restore reads
# the union. SURVEY.md §5.3 "multi-slice checkpointing" realised without any
# cross-host communication (only a shared filesystem).
# ---------------------------------------------------------------------------

def _proc_prefix(prefix: str, process_id: int, num_processes: int) -> str:
    return f"{prefix}-proc{process_id:05d}-of-{num_processes:05d}"


class UnionReader:
    """Reader-like union over every process's bundle of a multihost save."""

    def __init__(self, prefix: str):
        import glob
        idx = sorted(glob.glob(prefix + "-proc*-of-*" +
                               ".index.json"))
        if not idx:
            raise FileNotFoundError(f"no multihost bundles under {prefix}")
        self._readers = [bundle.BundleReader(fn[:-len(".index.json")])
                         for fn in idx]
        self._where = {}
        for r in self._readers:
            for k in r.keys():
                self._where.setdefault(k, r)

    def keys(self) -> List[str]:
        return list(self._where)

    def __contains__(self, name: str) -> bool:
        return name in self._where

    def shape(self, name: str):
        return self._where[name].shape(name)

    def dtype(self, name: str):
        return self._where[name].dtype(name)

    def num_elements(self, name: str) -> int:
        return self._where[name].num_elements(name)

    def lookup(self, name: str, verify: bool = True) -> np.ndarray:
        return self._where[name].lookup(name, verify=verify)

    def lookup_slice(self, name: str, start_row: int, num_rows: int):
        return self._where[name].lookup_slice(name, start_row, num_rows)


def save_multihost(prefix: str, tables: Dict[str, TableOrShards],
                   dense: Optional[dict] = None, *, process_id: int,
                   num_processes: int, **kw) -> Dict[str, TableOrShards]:
    """Per-process save: ``tables[name]`` holds this process's CONSECUTIVE
    local shards; global part index = ``process_id * len(local) + i`` (the
    uniform shards-per-process layout ``create_sharded`` + mesh sharding
    produce). Dense state is written by process 0 only. Call on every
    process (no ordering requirement); restore with
    ``restore(UnionReader(prefix), ...)`` or :func:`restore_multihost`."""
    p = _proc_prefix(prefix, process_id, num_processes)
    out: Dict[str, TableOrShards] = {}
    with bundle.BundleWriter(p) as w:
        for name, t in tables.items():
            shards = _shards(t)
            n_local = len(shards)
            n_total = n_local * num_processes
            new = []
            for i, s in enumerate(shards):
                g = process_id * n_local + i
                new.append(save_table(w, shard_name(name, g, n_total), s,
                                      **kw))
            out[name] = new if isinstance(t, (list, tuple)) else new[0]
            if process_id == 0:
                w.add(name + "-num_shards", np.array([n_total], np.int32))
        if dense is not None and process_id == 0:
            flat, _ = jax.tree_util.tree_flatten_with_path(dense)
            for path, leaf in flat:
                key = "dense/" + "/".join(_path_str(p) for p in path)
                w.add(key, np.asarray(jax.device_get(leaf)))
    return out


def restore_multihost(prefix: str, tables: Dict[str, TableOrShards],
                      dense: Optional[dict] = None, *, delta: bool = False):
    """Restore a :func:`save_multihost` checkpoint — any process count, any
    target shard count (elastic re-mod applies as usual)."""
    return restore(UnionReader(prefix), tables, dense, delta=delta)
