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
from ..utils import packing
from . import bundle

# Streaming budget: values/slots move device→host→disk in bounded chunks so
# tables larger than host RAM can be saved/restored (the reference streams
# exports straight into the bundle writer, dynamic_save.hpp:302-310, and
# restores partially, tensor_bundle.cc:597-607). The control plane (keys +
# packed meta, 12 B/row vs ≥4·dim B/row payload) is materialised whole.
DEFAULT_CHUNK_BYTES = 256 << 20


def _chunk_rows(row_bytes: int, chunk_rows: Optional[int]) -> int:
    if chunk_rows:
        return int(chunk_rows)
    return max(1024, DEFAULT_CHUNK_BYTES // max(int(row_bytes), 1))

# saver modes (set_tfplus_saver_mode: 0 = prediction/inference, 1 = training)
FIRST_N_KV = 2
FIRST_N_INFERENCE = 3
FIRST_N_BLACKLIST = 4
FIRST_N_TRAIN = 6
FIRST_N_DELTA = 8

TableOrShards = Union[kvt.KvTable, Sequence[kvt.KvTable]]


def _shards(t: TableOrShards) -> List[kvt.KvTable]:
    return list(t) if isinstance(t, (list, tuple)) else [t]


def shard_name(name: str, i: int, n: int) -> str:
    return name if n == 1 else f"{name}/part_{i}"


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _encode_pad_keys(keys_np: np.ndarray, cr: int) -> np.ndarray:
    """Host-side uint64 → int32[cr, 2] split, tail-padded with the EMPTY
    sentinel (reserved ids are masked out device-side, so padding rows are
    inert)."""
    u = np.asarray(keys_np).astype(np.uint64)
    out = np.full((cr, 2), -1, np.int32)
    out[:len(u), 0] = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32).astype(
        np.int32)
    out[:len(u), 1] = (u >> np.uint64(32)).astype(np.uint32).astype(np.int32)
    return out


def _pad_rows(arr: np.ndarray, cr: int) -> np.ndarray:
    if len(arr) == cr:
        return arr
    out = np.zeros((cr,) + arr.shape[1:], arr.dtype)
    out[:len(arr)] = arr
    return out


def _restore_import_chunk_fn(table, q, vals, freq, days, black):
    """One donated streaming-restore step: upsert a chunk with exact packed
    meta and report how many VALID keys failed placement. jitted+donated so
    a restore costs O(chunk) per chunk — the eager per-chunk import copied
    the whole multi-GB payload every chunk (measured 0.008 GB/s at 4 GB on
    the CPU backend; scripts/prof_checkpoint_io.py found it)."""
    import jax.numpy as jnp
    table = kvt.insert(table, q, vals, freq=freq, blacklist=black, day=days)
    valid = ~hashing.is_reserved_id(q)
    fr = kvt.find(table, q, valid)
    return table, jnp.sum(valid & ~fr.found, dtype=jnp.int32)


_restore_import_chunk = jax.jit(_restore_import_chunk_fn,
                                donate_argnums=(0,))


def _restore_slot_chunk_fn(table, q, rows, sname):
    import jax.numpy as jnp
    valid = ~hashing.is_reserved_id(q)
    fr = kvt.find(table, q, valid)
    idx = jnp.where(valid & fr.found, fr.slot, -1)
    return kvt.set_slot_rows(table, sname, idx, rows)


_restore_slot_chunk = jax.jit(_restore_slot_chunk_fn, static_argnums=(3,),
                              donate_argnums=(0,))


def _stream_payload_cols(writer, tensor_name: str, table: kvt.KvTable,
                         idx: np.ndarray, col0: int, ncols: int,
                         chunk_rows: Optional[int]):
    """Stream payload columns ``[col0, col0+ncols)`` of rows ``idx`` into the
    bundle in bounded chunks — the device slices BEFORE the host transfer,
    so peak host memory is one chunk, never the table."""
    import jax.numpy as jnp
    n = len(idx)
    writer.add_header(tensor_name, np.float32, (n, ncols))
    cr = _chunk_rows(ncols * 4, chunk_rows)
    for a in range(0, n, cr):
        part = jnp.take(table.payload, jnp.asarray(idx[a:a + cr]), axis=0,
                        )[:, col0:col0 + ncols].astype(jnp.float32)
        writer.append_segment(np.asarray(jax.device_get(part)))
    writer.end_segment()


def save_table(writer: bundle.BundleWriter, name: str, table: kvt.KvTable, *,
               first_n: int = FIRST_N_TRAIN, delta: bool = False,
               enable_cutoff: bool = False, cutoff_value: float = 1e-20,
               delete_keys: Optional[np.ndarray] = None,
               save_slots: bool = True,
               chunk_rows: Optional[int] = None,
               as_of_unix_day: Optional[int] = None) -> kvt.KvTable:
    """Write one table (shard) and return it (delta export clears the
    deltalist bits, so callers must keep the returned table).

    Values and slot columns STREAM through bounded host chunks
    (``chunk_rows``, default ~256 MB worth): only the 12 B/row control
    plane (keys + packed meta) is materialised whole, so tables bigger
    than host RAM save fine (reference: dynamic_save.hpp:302-310 no_copy
    streaming into the bundle writer).
    """
    import jax.numpy as jnp
    dim = table.config.dim
    keys, meta = (np.asarray(x)
                  for x in jax.device_get((table.keys, table.meta)))
    occ = ~((keys[:, 0] == hashing.EMPTY_LO) & (keys[:, 1] == hashing.EMPTY_HI)) \
        & ~((keys[:, 0] == hashing.TOMB_LO) & (keys[:, 1] == hashing.TOMB_HI))
    sel = occ
    if delta:
        sel = sel & ((meta & int(kvt.FLAG_TOUCH_TRAIN)) != 0)
    black = (meta & int(kvt.FLAG_BLACKLIST)) != 0
    if enable_cutoff:
        # per-row max|v| reduces ON DEVICE: [C] f32 to host, not [C, D]
        vmax = np.asarray(jax.device_get(jnp.max(
            jnp.abs(table.payload[:, :dim]).astype(jnp.float32), axis=1)))
        sel = sel & ((vmax >= cutoff_value) | black)  # blacklist rows survive
    idx = np.nonzero(sel)[0]
    n = len(idx)

    writer.add(name + "-keys", hashing.decode_ids_np(keys[sel]))
    _stream_payload_cols(writer, name + "-values", table, idx, 0, dim,
                         chunk_rows)
    if first_n >= FIRST_N_INFERENCE and not delta:
        # delta restore never reads -init_table; writing the whole init
        # pool into every frequent delta snapshot is pure wasted IO
        writer.add(name + "-init_table",
                   np.asarray(jax.device_get(table.init_pool), np.float32))
    if first_n >= FIRST_N_BLACKLIST:
        writer.add(name + "-blacklist",
                   hashing.decode_ids_np(keys[occ & black]))
    if first_n >= FIRST_N_TRAIN:
        # the reference writes -freq_keys with the same content as -keys;
        # alias it instead of doubling the disk bytes
        writer.add_alias(name + "-freq_keys", name + "-keys")
        writer.add(name + "-freq_values",
                   (meta[sel] & packing.FREQ_MASK).astype(np.uint16))
        writer.add(name + "-meta",
                   packing.reference_word_np(meta[sel], as_of_unix_day))
    if first_n >= FIRST_N_DELTA or delta:
        if delta:
            # the saver writes the TRAIN stream (FLAG_TOUCH_TRAIN filter
            # above) — emit that stream's pending deletion-log span
            dstart_t, dcount_t = kvt.pending_delete_span(table, "train")
            dk_arr, dstart, dcount, doverflow = jax.device_get(
                (table.deleted_keys, dstart_t, dcount_t,
                 table.deleted_overflow))
            need_full = bool(doverflow)
            dk_own = hashing.decode_ids_np(
                np.asarray(dk_arr)[int(dstart):int(dcount)])
        else:
            need_full, dk_own = True, np.zeros((0,), np.uint64)
        writer.add(name + "-need_full_import",
                   np.array([1 if need_full else 0], np.int8))
        dk = delete_keys if delete_keys is not None else dk_own
        writer.add(name + "-delete_keys", np.asarray(dk, np.uint64))
    if save_slots and first_n >= FIRST_N_TRAIN:
        # optimizer slot rows for the same exported keys (train resume):
        # same selected payload rows, different column window — streamed,
        # no full-table device_get (round-1 saver pulled each slot whole)
        for sname, (s, w) in table.config.slot_columns().items():
            _stream_payload_cols(writer, f"{name}-slot-{sname}", table, idx,
                                 s, w, chunk_rows)
    if delta:
        table = kvt.clear_deltalist(table, "train")
    elif first_n > FIRST_N_KV:
        # a FULL export resets the delta baseline (dynamic_save.hpp:181-193:
        # first_n <= BLACK_LIST clears the prediction list, else the train
        # list) — without this, a deletion-log overflow under first_n < 6
        # would force-escalate EVERY subsequent delta to full, forever
        table = kvt.clear_deltalist(
            table, "pred" if first_n <= FIRST_N_BLACKLIST else "train")
    return table


def restore_table(reader: bundle.BundleReader, name: str,
                  template: kvt.KvTable, *, delta: bool = False,
                  chunk_rows: Optional[int] = None,
                  load_slots: bool = True) -> kvt.KvTable:
    """Load one table (shard) into a fresh copy of ``template``.

    Values and slot rows stream from the bundle in bounded chunks
    (``reader.stream`` — partial reads with end-to-end CRC), so restore
    peak host memory is one chunk plus the 12 B/row control plane
    (reference: BundleReader::LookupWithIndices, tensor_bundle.cc:597-607).
    """
    import jax.numpy as jnp
    if delta and name + "-need_full_import" in reader:
        if int(np.asarray(reader.lookup(name + "-need_full_import"))[0]):
            # the export's deletion log overflowed: delete_keys is truncated,
            # so replaying this delta would silently resurrect deleted /
            # TTL-evicted rows (reference: FullOrDeltaImport honours
            # need_full_import, ops/kv_variable_ops.cc:576-604)
            raise ValueError(
                f"delta checkpoint for '{name}' was exported after its "
                "deletion log overflowed (need_full_import=1); its delete "
                "list is incomplete — restore from a full checkpoint instead")
    keys = np.asarray(reader.lookup(name + "-keys"))
    n = len(keys)
    meta = (np.asarray(reader.lookup(name + "-meta"))
            if name + "-meta" in reader else None)
    freq = (np.asarray(reader.lookup(name + "-freq_values"))
            if meta is None and name + "-freq_values" in reader else None)
    blacklist = (np.asarray(reader.lookup(name + "-blacklist"))
                 if name + "-blacklist" in reader
                 else np.zeros((0,), np.uint64))
    init_table = (reader.lookup(name + "-init_table")
                  if name + "-init_table" in reader else None)
    delete_keys = (reader.lookup(name + "-delete_keys")
                   if name + "-delete_keys" in reader else None)

    table = template
    if not delta:
        # fresh table with the checkpoint's init pool (ImportValues clears)
        table = kvt.create(
            template.dim, template.capacity,
            initializer=(init_table if init_table is not None
                         else np.asarray(jax.device_get(template.init_pool))),
            enter_threshold=template.config.enter_threshold,
            max_probes=template.config.max_probes,
            value_dtype=template.config.value_dtype,
            name=template.config.name,
            support_prediction_delta=
            template.config.support_prediction_delta)
        table = kvt.ensure_slots(table, dict(template.config.slot_layout))
    if delete_keys is not None and np.asarray(delete_keys).size:
        qd = hashing.encode_ids_np_to_device(np.asarray(delete_keys))
        table, _ = kvt.delete(table, qd)

    # clamp the chunk to the next pow2 >= n: small restores stay one small
    # dispatch, and padded tail shapes land in O(log) jit cache classes
    cr = min(_chunk_rows(table.dim * 4, chunk_rows), _next_pow2(n or 1))
    vname = name + "-values"
    if n:
        # pre-grow ONCE to fit every incoming row (per-chunk load checks
        # re-sized the table mid-stream and cost a device_get per chunk)
        cap = table.capacity
        cur = 0 if not delta else int(jax.device_get(kvt.size(table)))
        while (cur + n) > kvt.GROW_LOAD_FACTOR * cap:
            cap *= 2
        if cap != table.capacity:
            table = kvt.grow(table, cap)

        day_now = np.uint32(packing.current_day() & packing.DAY_MASK)
        bl_u64 = blacklist.astype(np.uint64) if blacklist.size else None

        def chunk_aux(start: int, rows: int):
            """(freq, days, black) numpy chunk planes, tail-padded."""
            if meta is not None:
                m = meta[start:start + rows].astype(np.uint32)
                fq, dy = m & packing.FREQ_MASK, m >> 16
            elif freq is not None:
                fq = freq[start:start + rows].astype(np.uint32)
                dy = np.full((rows,), day_now, np.uint32)
            else:
                fq = np.zeros((rows,), np.uint32)
                dy = np.full((rows,), day_now, np.uint32)
            bk = (np.isin(keys[start:start + rows].astype(np.uint64),
                          bl_u64) if bl_u64 is not None
                  else np.zeros((rows,), bool))
            return (_pad_rows(fq, cr), _pad_rows(dy, cr), _pad_rows(bk, cr))

        def value_pass(table):
            """One full streamed upsert pass; returns (table, missing)."""
            missing = 0
            for start, vals in reader.stream(vname, cr):
                rows = len(vals)
                q = _encode_pad_keys(keys[start:start + rows], cr)
                fq, dy, bk = chunk_aux(start, rows)
                vals = _pad_rows(np.asarray(vals, np.float32), cr)
                table, miss = _restore_import_chunk(table, q, vals, fq,
                                                    dy, bk)
                missing += int(jax.device_get(miss))
            return table, missing

        table, missing = value_pass(table)
        # bucket-pair overflow can reject placements even under the load
        # threshold; a RESTORE must never lose rows — grow (disperses the
        # colliding buckets) and re-run the idempotent upsert pass
        for _ in range(4):
            if not missing:
                break
            table = kvt.grow(table)
            table, missing = value_pass(table)
        else:
            raise RuntimeError(
                f"restore could not place {missing} rows after 4 grows")

    # restore optimizer slot rows (streamed per chunk). load_slots=False
    # drops them — serving-side delta refresh must NOT widen a slot-less
    # inference table with trainer optimizer state (2-4x serving HBM)
    slot_names = [k[len(name) + 6:] for k in reader.keys()
                  if k.startswith(name + "-slot-")] if load_slots else []
    if slot_names and n:
        for sname in slot_names:
            tname = f"{name}-slot-{sname}"
            k = reader.shape(tname)[1] // table.dim
            if sname not in table.config.slot_columns():
                table = kvt.ensure_slots(table, {sname: k})
            scr = min(_chunk_rows(k * table.dim * 4, chunk_rows),
                      _next_pow2(n))
            for start, rows in reader.stream(tname, scr):
                q = _encode_pad_keys(keys[start:start + len(rows)], scr)
                rows = _pad_rows(np.asarray(rows, np.float32), scr)
                table = _restore_slot_chunk(table, q, rows, sname)
    return table


def _save_into(w, tables: Dict[str, TableOrShards],
               dense: Optional[dict], *, first_n: int, delta: bool,
               enable_cutoff: bool, cutoff_value: float,
               chunk_rows: Optional[int] = None
               ) -> Dict[str, TableOrShards]:
    """Write every tensor through ``w.add`` (a BundleWriter or collector)."""
    out: Dict[str, TableOrShards] = {}
    for name, t in tables.items():
        shards = _shards(t)
        ns = len(shards)
        new_shards = [
            save_table(w, shard_name(name, i, ns), s, first_n=first_n,
                       delta=delta, enable_cutoff=enable_cutoff,
                       cutoff_value=cutoff_value, chunk_rows=chunk_rows)
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
         cutoff_value: float = 1e-20,
         chunk_rows: Optional[int] = None) -> Dict[str, TableOrShards]:
    """Save all tables (+ optional dense pytree) under ``prefix``.

    Returns the (possibly deltalist-cleared) tables, same structure as input.
    Values/slots stream through bounded host chunks (``chunk_rows``), so a
    table bigger than host RAM saves fine.
    """
    with bundle.BundleWriter(prefix, num_file_shards) as w:
        return _save_into(w, tables, dense, first_n=first_n, delta=delta,
                          enable_cutoff=enable_cutoff,
                          cutoff_value=cutoff_value, chunk_rows=chunk_rows)


class _Collector:
    """Buffers (name, host array) pairs for a deferred bundle write.

    Implements the writer's streaming surface too (async saves materialise
    everything by design — exports must finish before training continues —
    so streamed segments just accumulate here)."""

    def __init__(self):
        self.items: List[tuple] = []
        self._open: Optional[tuple] = None

    def add(self, name: str, array: np.ndarray):
        self.items.append(("add", name, np.asarray(jax.device_get(array))))

    def add_alias(self, name: str, target: str):
        self.items.append(("alias", name, target))

    def add_header(self, name: str, dtype, shape, shard=None):
        if self._open is not None:
            raise RuntimeError("previous stream not ended")
        self._open = (name, np.dtype(dtype), tuple(shape), [])

    def append_segment(self, array_or_bytes):
        name, dt, shape, chunks = self._open
        a = (np.asarray(array_or_bytes) if isinstance(array_or_bytes, np.ndarray)
             else np.frombuffer(bytes(array_or_bytes), dtype=dt))
        chunks.append(np.ascontiguousarray(a).reshape(-1))

    def end_segment(self):
        name, dt, shape, chunks = self._open
        arr = (np.concatenate(chunks) if chunks
               else np.zeros((0,), dt)).astype(dt, copy=False).reshape(shape)
        self.items.append(("add", name, arr))
        self._open = None


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
                for kind, name, payload in col.items:
                    if kind == "alias":
                        w.add_alias(name, payload)
                    else:
                        w.add(name, payload)
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
            dense: Optional[dict] = None, *, delta: bool = False,
            chunk_rows: Optional[int] = None):
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
                    delta=delta, chunk_rows=chunk_rows))
                bar.update(1)
        else:
            shards = repartition.restore_repartitioned(
                reader, name, want, n_ckpt, delta=delta,
                chunk_rows=chunk_rows)
            bar.update(n_want)
        bar.done()
        out[name] = shards if isinstance(t, (list, tuple)) else shards[0]
    new_dense = None
    if dense is not None:
        flat, treedef = jax.tree_util.tree_flatten_with_path(dense)
        leaves = []
        for path, leaf in flat:
            key = "dense/" + "/".join(_path_str(p) for p in path)
            if key not in reader:
                # bundle saved without dense (e.g. a delta snapshot of
                # tables only): keep the caller's leaf — in the manager's
                # delta replay that is the previously-restored dense
                leaves.append(leaf)
                continue
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
    """Reader-like union over every process's bundle of a multihost save.
    Resolves through the filesystem registry, so multihost checkpoints on
    ``oss://`` (each process writing its own bundle to the object store)
    restore the same way as local ones."""

    def __init__(self, prefix: str):
        import re as _re
        from ..io.filesystem import get_filesystem
        fs, p = get_filesystem(prefix)
        d, base = p.rsplit("/", 1) if "/" in p else ("", p)
        scheme = prefix[:-len(p)]                 # "" or "<scheme>://"
        pat = _re.compile(_re.escape(base) +
                          r"-proc\d{5}-of-(\d{5})\.index\.json$")
        names: List[str] = []
        # relative/flat prefixes have no dir component: local = cwd,
        # flat-key filesystems (ram://) list the root
        for cand in ([d] if d else [".", ""]):
            try:
                names = fs.listdir(cand)
            except (FileNotFoundError, OSError):
                names = []
            if names:
                break
        matches = sorted(fn for fn in names if pat.match(fn))
        if not matches:
            raise FileNotFoundError(f"no multihost bundles under {prefix}")
        # every matched filename encodes the save's process count — an
        # incomplete listing (truncated/eventually-consistent object-store
        # listing, in-flight writes) must be a hard error, not a silent
        # partial restore of a subset of the processes' rows
        counts = {int(pat.match(fn).group(1)) for fn in matches}
        if len(counts) != 1:
            raise IOError(
                f"multihost bundles under {prefix} disagree on process "
                f"count: {sorted(counts)} — mixed/partial save?")
        want = counts.pop()
        if len(matches) != want:
            raise IOError(
                f"multihost checkpoint under {prefix} is incomplete: found "
                f"{len(matches)} of {want} process bundles (listing "
                "truncated or save still in flight)")
        idx = [scheme + (d + "/" if d else "") + fn for fn in matches]
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

    def stream(self, name: str, chunk_rows: int, verify: bool = True):
        return self._where[name].stream(name, chunk_rows, verify=verify)


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
