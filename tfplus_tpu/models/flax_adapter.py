"""Flax (linen) interop — run any Flax dense tower on KV embeddings.

The reference integrates with its host framework by monkey-patching TF
(`tf.variable_scope`, `slot_creator`, … — variable_scope.py:1022-1106);
here the host ecosystem is Flax/optax, and integration is an adapter, not a
patch: :class:`FlaxSparseModel` wraps a ``flax.linen.Module`` into the
:class:`~tfplus_tpu.models.common.SparseModel` protocol so the whole
harness — `init_state`, `make_train_step` (incl. the multi-table variant),
checkpointing, sharding — applies to Flax-defined models unchanged.

The module's ``__call__`` must accept ``(embeddings, features)`` where
``embeddings`` is a dict of ``[B, dim]`` arrays keyed by table name and
``features`` is the dense-feature array (or None). Everything the module
owns (params, and any extra collections created at init) lives in the
TrainState's ``dense`` pytree and is updated by the optax transformation.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .common import SparseModel
from .dcn import optax_sigmoid_ce


class FlaxSparseModel(SparseModel):
    """Adapt a ``flax.linen.Module`` to the SparseModel training harness.

    Args:
      module: a linen module; ``module.apply(variables, embeddings, features)``
        returns predictions/logits.
      table_specs: name -> dict(dim=..., capacity=..., **kv.create kwargs).
      feature_dim: width of the dense-feature input (None → features=None).
      loss_fn: ``(preds, labels) -> scalar``; defaults to mean sigmoid CE.
      id_alias: optional table-name -> id-stream-name aliasing (several
        tables reading one id column, e.g. dim-1 linear terms).
    """

    def __init__(self, module, table_specs: Dict[str, dict], *,
                 feature_dim: Optional[int] = None,
                 loss_fn: Optional[Callable] = None,
                 id_alias: Optional[Dict[str, str]] = None):
        self.module = module
        self.table_specs = dict(table_specs)
        self.feature_dim = feature_dim
        self._loss_fn = loss_fn
        if id_alias:
            self.id_alias = dict(id_alias)

    def _example_inputs(self):
        embs = {name: jnp.zeros((1, spec["dim"]), jnp.float32)
                for name, spec in self.table_specs.items()}
        feats = (None if self.feature_dim is None
                 else jnp.zeros((1, self.feature_dim), jnp.float32))
        return embs, feats

    def init_dense(self, key):
        embs, feats = self._example_inputs()
        return self.module.init(key, embs, feats)

    def apply(self, dense, embeddings: Dict[str, jnp.ndarray], features):
        return self.module.apply(dense, embeddings, features)

    def loss(self, preds, labels):
        if self._loss_fn is not None:
            return self._loss_fn(preds, labels)
        return jnp.mean(optax_sigmoid_ce(preds, labels.astype(preds.dtype)))
