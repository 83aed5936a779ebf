"""Import REAL TFPlus checkpoints (TF TensorBundle) into KvTables.

The reference persists every KvVariable as six logical tensors inside a
standard TF TensorBundle — ``<var>-keys``, ``-values``, ``-init_table``,
``-blacklist``, ``-freq_keys``, ``-freq_values`` (naming:
kv_variable_ops.py:1458-1459; export op outputs: ops/kv_variable_ops.cc:
421-466) — written through the stock SaveV2/forked SaveV3 savers, so any
TensorFlow build can read them back with ``tf.train.load_checkpoint``.
This module does exactly that: discover the KV variables in a TFPlus
checkpoint, regroup their ``name/part_i`` shards, and rebuild them as
KvTables with the reference's ImportValues semantics
(dynamic_restore.hpp:156-262):

  * keys+values upserted into a cleared table,
  * init_table replaces the init pool when non-empty,
  * blacklisted keys read as zeros,
  * frequencies update EXISTING rows only (UpdateWithFn — freq keys absent
    from the key set are dropped), accepting both the uint16 frequency
    view and SaveV3's packed uint32 ``freq|day<<16`` word
    (``freq_use_uint32``, ops/kv_variable_ops.cc:708-733).

Elastic restore applies: rows route to the requested shard count by
``key % n`` exactly like a native restore (common/util.py:306-401).

TensorFlow is imported lazily — only checkpoint *migration* needs it.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from ..kv import table as kvt
from ..kv import hashing

_PART_RE = re.compile(r"^(.*)/part_(\d+)$")

TableOrShards = Union[kvt.KvTable, Sequence[kvt.KvTable]]


def _load_reader(prefix: str):
    try:
        import tensorflow as tf  # noqa: F401 — lazy, migration-only
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "importing a TFPlus checkpoint requires tensorflow "
            "(pip install tensorflow-cpu) — only migration needs it") from e
    import tensorflow as tf
    return tf.train.load_checkpoint(prefix)


def list_kv_variables(prefix: str) -> Dict[str, dict]:
    """Discover KvVariables in a TFPlus checkpoint.

    A KvVariable shard is any tensor pair ``X-keys`` / ``X-values``;
    ``name/part_i`` shards regroup under their generic name (reference
    get_generic_name, common/util.py:107-121). Returns
    ``{name: {"num_shards", "shard_prefixes", "dim", "rows",
    "has_blacklist", "has_freq", "freq_dtype"}}``.
    """
    reader = _load_reader(prefix)
    shapes = reader.get_variable_to_shape_map()
    dtypes = reader.get_variable_to_dtype_map()
    out: Dict[str, dict] = {}
    for tname in shapes:
        if not tname.endswith("-keys"):
            continue
        base = tname[:-len("-keys")]
        if base + "-values" not in shapes:
            continue
        m = _PART_RE.match(base)
        name, idx = (m.group(1), int(m.group(2))) if m else (base, 0)
        info = out.setdefault(name, {
            "num_shards": 0, "shard_prefixes": {}, "dim": None, "rows": 0,
            "has_blacklist": False, "has_freq": False, "freq_dtype": None})
        info["shard_prefixes"][idx] = base
        info["num_shards"] = max(info["num_shards"], idx + 1)
        vshape = shapes[base + "-values"]
        if len(vshape) == 2:
            info["dim"] = vshape[1]
        info["rows"] += int(vshape[0]) if vshape else 0
        if base + "-blacklist" in shapes:
            info["has_blacklist"] = True
        if base + "-freq_values" in shapes:
            info["has_freq"] = True
            info["freq_dtype"] = np.dtype(
                dtypes[base + "-freq_values"].as_numpy_dtype)
    return out


def _keys_u64(arr: np.ndarray) -> np.ndarray:
    """Checkpoint keys (int32/int64/uint64) → canonical uint64 id space."""
    if arr.dtype == np.uint64:
        return arr
    # int64/int32 keys reinterpret into the same 64-bit space the engine
    # uses (negative ids keep their bit pattern, matching ModKeyImpl's
    # floor-mod routing over the unsigned view, utility.h:96-112)
    return arr.astype(np.int64).view(np.uint64) if arr.dtype != np.int64 \
        else arr.view(np.uint64)


def _collect_var(reader, info: dict) -> dict:
    """Concatenate every shard's tensors for one KvVariable."""
    keys, values, freq_k, freq_v, black = [], [], [], [], []
    init_table = None
    for i in sorted(info["shard_prefixes"]):
        base = info["shard_prefixes"][i]
        k = _keys_u64(np.asarray(reader.get_tensor(base + "-keys")))
        v = np.asarray(reader.get_tensor(base + "-values"))
        keys.append(k)
        values.append(v.reshape(len(k), -1))
        if info["has_blacklist"]:
            try:
                b = np.asarray(reader.get_tensor(base + "-blacklist"))
                black.append(_keys_u64(b.reshape(-1)))
            except Exception:
                pass
        if info["has_freq"]:
            try:
                fk = _keys_u64(np.asarray(
                    reader.get_tensor(base + "-freq_keys")).reshape(-1))
                fv = np.asarray(
                    reader.get_tensor(base + "-freq_values")).reshape(-1)
                freq_k.append(fk)
                freq_v.append(fv)
            except Exception:
                pass
        if init_table is None:
            try:
                it = np.asarray(reader.get_tensor(base + "-init_table"))
                if it.size:
                    init_table = it
            except Exception:
                pass
    dim = values[0].shape[1] if values and values[0].size else info["dim"]
    return {
        "keys": np.concatenate(keys) if keys else np.zeros((0,), np.uint64),
        "values": (np.concatenate(values) if values
                   else np.zeros((0, dim or 0), np.float32)),
        "blacklist": (np.concatenate(black) if black
                      else np.zeros((0,), np.uint64)),
        "freq_keys": (np.concatenate(freq_k) if freq_k
                      else np.zeros((0,), np.uint64)),
        "freq_values": (np.concatenate(freq_v) if freq_v
                        else np.zeros((0,), np.uint16)),
        "init_table": init_table,
    }


def _align_freq(keys: np.ndarray, freq_keys: np.ndarray,
                freq_values: np.ndarray) -> Optional[np.ndarray]:
    """Per-key frequency aligned to ``keys`` — reference UpdateWithFn
    semantics: frequencies apply to existing rows only; freq keys outside
    the key set are dropped (dynamic_restore.hpp:219-249). Vectorized
    (searchsorted over the sorted freq keys): 41M-row variables align in
    array passes, not Python-level iterations."""
    if not len(freq_keys):
        return None
    order = np.argsort(freq_keys)
    sk = freq_keys[order]
    pos = np.clip(np.searchsorted(sk, keys), 0, len(sk) - 1)
    hit = sk[pos] == keys
    out = np.zeros((len(keys),), freq_values.dtype)
    out[hit] = freq_values[order[pos[hit]]]
    return out


def import_kv_variable(prefix: str, name: str, *,
                       templates: Optional[Sequence[kvt.KvTable]] = None,
                       num_shards: int = 1,
                       capacity: int = 1 << 14,
                       value_dtype=None) -> List[kvt.KvTable]:
    """Rebuild one KvVariable from a TFPlus checkpoint as ``num_shards``
    KvTables (rows routed by ``key % num_shards``, the reference's
    partition function — embedding_ops.py:121-127).

    ``templates`` (optional) supplies per-shard table templates (capacity,
    dtype, slot layout); otherwise fresh tables of ``capacity`` are grown
    as needed.
    """
    reader = _load_reader(prefix)
    infos = list_kv_variables(prefix)
    if name not in infos:
        raise KeyError(
            f"no KvVariable '{name}' in {prefix}; found: {sorted(infos)}")
    info = infos[name]
    data = _collect_var(reader, info)
    dim = data["values"].shape[1] if data["values"].size else info["dim"]
    if templates is not None:
        num_shards = len(templates)

    keys = data["keys"]
    assign = (keys % np.uint64(num_shards)).astype(np.int64) \
        if num_shards > 1 else np.zeros(len(keys), np.int64)
    freq_aligned = _align_freq(keys, data["freq_keys"], data["freq_values"])

    out: List[kvt.KvTable] = []
    for s in range(num_shards):
        sel = assign == s
        if templates is not None:
            template = templates[s]
        else:
            import jax.numpy as jnp
            template = kvt.create(
                dim, capacity,
                value_dtype=value_dtype or jnp.float32,
                name=f"{name}/part_{s}" if num_shards > 1 else name)
        sub = {"keys": keys[sel], "values": data["values"][sel]}
        if data["init_table"] is not None:
            sub["init_table"] = data["init_table"]
        if data["blacklist"].size:
            sub["blacklist"] = data["blacklist"]
        if freq_aligned is not None:
            fv = freq_aligned[sel]
            if fv.dtype == np.uint32:
                # SaveV3 freq_use_uint32: the packed freq|day<<16 word
                sub["meta"] = fv
            else:
                sub["freq_values"] = fv.astype(np.uint16)
        out.append(kvt.import_arrays(template, sub, clear=True))
    return out


def import_checkpoint(prefix: str, tables: Dict[str, TableOrShards]
                      ) -> Dict[str, TableOrShards]:
    """Restore every requested table from a TFPlus checkpoint.

    ``tables`` maps checkpoint variable names (generic, without
    ``/part_i``) to template tables — a single KvTable or a list of
    per-shard templates, exactly like :func:`saver.restore`. The
    checkpoint's own shard count is irrelevant (elastic re-mod).
    """
    out: Dict[str, TableOrShards] = {}
    for name, t in tables.items():
        want = list(t) if isinstance(t, (list, tuple)) else [t]
        shards = import_kv_variable(prefix, name, templates=want)
        out[name] = shards if isinstance(t, (list, tuple)) else shards[0]
    return out


def attach_slot_rows(table: kvt.KvTable, prefix: str, slot_var: str,
                     slot_name: str) -> kvt.KvTable:
    """Copy a TFPlus optimizer-slot KvVariable's rows into ``table``'s
    co-located slot columns.

    The reference stores optimizer slots as separate KvVariables sharing
    the primary's keys (slot_creator hook, variable_scope.py:1027-1093;
    concat slots like AdamV4's ``m_v_linear`` are one variable of width
    k·dim). Rows whose key is missing from ``table`` are dropped.
    """
    import jax.numpy as jnp
    reader = _load_reader(prefix)
    infos = list_kv_variables(prefix)
    if slot_var not in infos:
        raise KeyError(f"no slot variable '{slot_var}' in {prefix}")
    data = _collect_var(reader, infos[slot_var])
    if not data["keys"].size:
        return table
    k = data["values"].shape[1] // table.dim
    if slot_name not in table.config.slot_columns():
        table = kvt.ensure_slots(table, {slot_name: k})
    q = hashing.encode_ids_np_to_device(data["keys"])
    fr = kvt.find(table, q)
    idx = jnp.where(fr.found, fr.slot, -1)
    return kvt.set_slot_rows(table, slot_name, idx,
                             jnp.asarray(data["values"]))


def read_dense(prefix: str, name: str) -> np.ndarray:
    """Read any non-KV tensor (dense variable) from the checkpoint."""
    return np.asarray(_load_reader(prefix).get_tensor(name))
