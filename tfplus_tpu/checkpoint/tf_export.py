"""Export KvTables as REAL TFPlus checkpoints (TF TensorBundle).

The inverse of :mod:`tf_import`: writes the reference's logical tensors —
``<var>-keys``, ``-values``, ``-init_table``, ``-blacklist``,
``-freq_keys``, ``-freq_values`` (kv_variable_ops.py:1458-1459; saver
modes via ``first_n``) — through ``tf.raw_ops.SaveV2``, producing a
genuine TensorBundle that existing TFPlus-based systems consume directly:
``tf.train.load_checkpoint`` readers, the reference's restore path, and
ranking services addressing KV checkpoint tensors by name
(common/ranking_utils.py ``embedding_var_keys/values``).

Sharded tables write ``name/part_i-*`` (variable_scope.py:383-430), so a
reference deployment with the same shard count restores them natively.
``freq_use_uint32=True`` writes the packed ``freq|day<<16`` word (SaveV3's
contract, ops/kv_variable_ops.cc:708-733); False writes the legacy uint16
frequency view. TensorFlow is imported lazily — only migration needs it.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import numpy as np

from ..kv import table as kvt
from .saver import (FIRST_N_BLACKLIST, FIRST_N_INFERENCE, FIRST_N_TRAIN,
                    shard_name, _shards, TableOrShards)


def _tf():
    try:
        import tensorflow as tf
        return tf
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "exporting a TFPlus checkpoint requires tensorflow "
            "(pip install tensorflow-cpu) — only migration needs it") from e


def _keys_out(u64: np.ndarray, key_dtype) -> np.ndarray:
    if np.dtype(key_dtype) == np.uint64:
        return u64.astype(np.uint64)
    # int64 checkpoints: same 64-bit patterns, signed view (ModKeyImpl
    # routing is over the unsigned view either way, utility.h:96-112)
    return u64.view(np.int64)


def export_checkpoint(prefix: str, tables: Dict[str, TableOrShards], *,
                      first_n: int = FIRST_N_TRAIN,
                      key_dtype=np.int64,
                      freq_use_uint32: bool = False,
                      enable_cutoff: bool = False,
                      cutoff_value: float = 1e-20,
                      dense: Optional[Dict[str, np.ndarray]] = None,
                      as_of_unix_day: Optional[int] = None) -> str:
    """Write ``tables`` (KvTable or per-shard list) as a TF TensorBundle at
    ``prefix``; returns the prefix. Optimizer slot columns are NOT written
    (the reference stores slots as separate optimizer-owned KvVariables —
    export those explicitly as their own entries if a reference training
    job must resume; inference/serving needs first_n=3 only)."""
    tf = _tf()
    names, slices, tensors = [], [], []

    def add(name: str, arr: np.ndarray):
        names.append(name)
        slices.append("")
        tensors.append(tf.constant(arr))

    for name, t in tables.items():
        shards = _shards(t)
        ns = len(shards)
        for i, s in enumerate(shards):
            base = shard_name(name, i, ns)
            ex = kvt.export_arrays(s, enable_cutoff=enable_cutoff,
                                   cutoff_value=cutoff_value,
                                   clear_deltalist=False,
                                   as_of_unix_day=as_of_unix_day)
            keys = _keys_out(np.asarray(ex["keys"], np.uint64), key_dtype)
            add(base + "-keys", keys)
            add(base + "-values", ex["values"])
            if first_n >= FIRST_N_INFERENCE:
                add(base + "-init_table", ex["init_table"])
            if first_n >= FIRST_N_BLACKLIST:
                add(base + "-blacklist",
                    _keys_out(np.asarray(ex["blacklist"], np.uint64),
                              key_dtype))
            if first_n >= FIRST_N_TRAIN:
                add(base + "-freq_keys", keys)
                if freq_use_uint32:
                    add(base + "-freq_values",
                        np.asarray(ex["meta"], np.uint32))
                else:
                    add(base + "-freq_values",
                        np.asarray(ex["freq_values"], np.uint16))
    if dense:
        for name, arr in dense.items():
            add(name, np.asarray(arr))

    tf.raw_ops.SaveV2(prefix=prefix, tensor_names=names,
                      shape_and_slices=slices, tensors=tensors)
    return prefix
