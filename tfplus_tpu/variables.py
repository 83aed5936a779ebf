"""KvVariable store — the ``get_kv_variable`` user surface.

Functional-world equivalent of the reference's variable_scope layer
(python/ops/variable_scope.py: ``_KvVariableStore.get_kv_variable`` :129-245,
``_get_partitioned_kv_variable`` :247-447 building ``name/part_i`` shards,
``get_kv_variable`` free function :745-777) and the module-level mode
switches (kv_variable_ops.py:80-419 ``IS_TRAINING`` / ``tfplus_saver_mode``).

In a functional framework the "variables" are explicit pytrees, so the store
is a named registry you thread through your program (or use as a global for
TF1-style convenience): ``get_kv_variable`` creates-or-returns a table by
name; ``num_shards`` returns a leading-axis sharded table for the mesh path.
"""
from __future__ import annotations

import threading
from typing import Dict, Optional, Union

import jax.numpy as jnp

from .kv import table as kvt
from .checkpoint import saver as _saver


class KvVariableStore:
    """Named table registry (reference _KvVariableStore)."""

    def __init__(self):
        self._tables: Dict[str, Union[kvt.KvTable, list]] = {}
        self._lock = threading.Lock()
        self.is_training: bool = True
        self.saver_mode: int = 1          # 1=training, 0=prediction

    # -- creation ----------------------------------------------------------
    def get_kv_variable(self, name: str, embedding_dim: int, *,
                        capacity: int = 1 << 14,
                        key_dtype=None,               # accepted for parity
                        initializer=None,
                        enter_threshold: int = 0,
                        num_shards: int = 1,
                        partitioner=None,
                        value_dtype=jnp.float32,
                        seed: int = 0):
        """Create or fetch a table (reference get_kv_variable signature,
        variable_scope.py:745-777). ``partitioner`` accepts the reference's
        ``fixed_size_partitioner(N)`` object (or any callable carrying
        ``num_shards``) and overrides ``num_shards`` — verbatim ports of
        ``get_kv_variable(..., partitioner=tf.fixed_size_partitioner(8))``
        work unchanged."""
        del key_dtype  # all keys are 64-bit here
        if partitioner is not None:
            num_shards = _partitioner_shards(partitioner)
        with self._lock:
            if name in self._tables:
                existing = self._tables[name]
                t0 = existing[0] if isinstance(existing, list) else existing
                if t0.dim != embedding_dim:
                    raise ValueError(
                        f"{name}: dim mismatch {t0.dim} != {embedding_dim}")
                return existing
            if num_shards == 1:
                t = kvt.create(embedding_dim, capacity,
                               initializer=initializer,
                               enter_threshold=enter_threshold,
                               value_dtype=value_dtype, name=name, seed=seed)
                self._tables[name] = t
            else:
                # reference shard naming: name/part_i (variable_scope.py:383-430)
                self._tables[name] = [
                    kvt.create(embedding_dim, capacity,
                               initializer=initializer,
                               enter_threshold=enter_threshold,
                               value_dtype=value_dtype,
                               name=f"{name}/part_{i}", seed=seed + i)
                    for i in range(num_shards)
                ]
            return self._tables[name]

    def update(self, name: str, table):
        """Store back the new table state after a step (functional update)."""
        with self._lock:
            self._tables[name] = table

    def __getitem__(self, name: str):
        return self._tables[name]

    def __contains__(self, name: str):
        return name in self._tables

    def tables(self) -> Dict[str, Union[kvt.KvTable, list]]:
        return dict(self._tables)

    # -- introspection (reference get_kv_feature_size,
    #    kv_variable_ops.py:296-337) --------------------------------------
    def get_kv_feature_size(self) -> Dict[str, int]:
        out = {}
        for name, t in self._tables.items():
            shards = t if isinstance(t, list) else [t]
            out[name] = sum(int(kvt.size(s)) for s in shards)
        return out

    # -- mode switches (reference set_tfplus_saver_mode / IS_TRAINING) ----
    def set_training(self, training: bool):
        self.is_training = training

    def set_saver_mode(self, mode: int):
        """0 = prediction (export first_n=3), 1 = training (first_n=6) —
        kv_variable_ops.py:352-374."""
        self.saver_mode = mode

    @property
    def save_first_n(self) -> int:
        return (_saver.FIRST_N_TRAIN if self.saver_mode
                else _saver.FIRST_N_INFERENCE)


_DEFAULT_STORE = KvVariableStore()


def default_store() -> KvVariableStore:
    return _DEFAULT_STORE


def get_kv_variable(name: str, embedding_dim: int, **kwargs):
    """TF1-style convenience on the global default store."""
    return _DEFAULT_STORE.get_kv_variable(name, embedding_dim, **kwargs)


def set_tfplus_saver_mode(mode: int):
    _DEFAULT_STORE.set_saver_mode(mode)


class _ProbeDim:
    """Quacks like tf.compat.v1.Dimension for partitioner probing."""

    def __init__(self, value):
        self.value = value

    def __index__(self):
        return self.value

    def __int__(self):
        return self.value


class _ProbeShape:
    """Quacks like tf.TensorShape: TF's fixed_size_partitioner closure does
    ``[1]*shape.ndims`` then ``min(num_shards, shape.dims[axis].value)`` —
    feeding a huge leading dim makes the returned partition count on the
    partitioned axis equal num_shards exactly."""

    def __init__(self, dims):
        self.dims = [_ProbeDim(d) for d in dims]
        self.ndims = len(dims)
        self.rank = len(dims)

    def __len__(self):
        return self.ndims

    def __getitem__(self, i):
        return self.dims[i]

    def num_elements(self):
        out = 1
        for d in self.dims:
            out *= d.value
        return out


def _partitioner_shards(partitioner) -> int:
    """Recover num_shards from a partitioner: this package's
    fixed_size_partitioner (``num_shards`` attribute) or a real
    ``tf.fixed_size_partitioner``-style closure (probed with a huge fake
    shape so ``min(num_shards, dim)`` returns num_shards)."""
    n = getattr(partitioner, "num_shards", None)
    if n is None and callable(partitioner):
        try:
            parts = partitioner(shape=_ProbeShape((1 << 60, 1)),
                                dtype=None)
            n = max(int(p) for p in parts)
        except Exception:
            try:  # keyword-less closures
                parts = partitioner(_ProbeShape((1 << 60, 1)), None)
                n = max(int(p) for p in parts)
            except Exception:
                n = None
    if n is None:
        raise ValueError(
            "partitioner must expose num_shards or be a "
            "tf.fixed_size_partitioner-style callable (use "
            "tfplus_tpu.fixed_size_partitioner(N))")
    return int(n)


class fixed_size_partitioner:
    """Reference-compatible partitioner object
    (``tf.fixed_size_partitioner`` stand-in): carries ``num_shards`` for
    ``get_kv_variable(partitioner=...)``."""

    def __init__(self, num_shards: int, axis: int = 0):
        del axis
        self.num_shards = int(num_shards)

    def __call__(self, shape=None, dtype=None):
        return [1] * self.num_shards


def tfplus_saver_mode() -> int:
    """Current saver mode (reference tfplus_saver_mode getter,
    tfplus/__init__.py:26; 0 = prediction/inference, 1 = training)."""
    return _DEFAULT_STORE.saver_mode


def get_kv_feature_size():
    return _DEFAULT_STORE.get_kv_feature_size()
