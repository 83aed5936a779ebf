"""DCN — Deep & Cross Network for CTR prediction on KV embeddings.

Re-implementation of the reference benchmark model (example/dcn/train.py:
104-360): 26 hashed categorical features each with its own KV embedding table
(dims from EMBEDDING_DIMENSIONS, train.py:74-101) + 13 numeric features; a
deep tower (default [1024, 512, 256] relu, :119-120) and a 2-layer cross
network (x_{l+1} = x0·(x_l·w) + b + x_l, :176-202) each produce a logit from
the shared input; logits are summed (:346) into a sigmoid-cross-entropy loss
(:351-358). Reference quality bar: the AUC/accuracy table in
example/dcn/README.md:54-84 (BASELINE.md).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..nn import layers as L
from .common import SparseModel

# Criteo layout (train.py:40-44)
NUM_NUMERIC = 13
NUM_CATEGORICAL = 26

# Reference per-column embedding dims (train.py:74-101)
REFERENCE_EMBEDDING_DIMENSIONS = (
    64, 64, 128, 128, 64, 64, 64, 64, 64, 128, 64, 128, 64,
    64, 64, 128, 64, 64, 64, 64, 128, 64, 64, 128, 64, 128)


class DCN(SparseModel):
    def __init__(self,
                 embedding_dims: Optional[Sequence[int]] = None,
                 num_numeric: int = NUM_NUMERIC,
                 dnn_hidden=(1024, 512, 256),
                 cross_layers: int = 2,
                 capacity: int = 1 << 14,
                 uniform_dim: Optional[int] = None):
        """``uniform_dim`` overrides per-column dims (handy for small tests);
        default dims follow the reference."""
        if embedding_dims is None:
            embedding_dims = ([uniform_dim] * NUM_CATEGORICAL if uniform_dim
                              else REFERENCE_EMBEDDING_DIMENSIONS)
        self.embedding_dims = tuple(embedding_dims)
        self.num_numeric = num_numeric
        self.dnn_hidden = tuple(dnn_hidden)
        self.cross_layers = cross_layers
        self.table_specs = {
            f"C{i+1}": dict(dim=d, capacity=capacity)
            for i, d in enumerate(self.embedding_dims)
        }
        self.input_dim = sum(self.embedding_dims) + num_numeric

    def init_dense(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "dnn": L.mlp_init(k1, self.input_dim, list(self.dnn_hidden)),
            "dnn_logits": L.dense_init(k2, self.dnn_hidden[-1], 1),
            "cross": L.cross_net_init(k3, self.input_dim, self.cross_layers),
            "cross_logits": L.dense_init(k4, self.input_dim, 1),
        }

    def apply(self, dense, embeddings: Dict[str, jnp.ndarray], features):
        cats = [embeddings[f"C{i+1}"] for i in range(len(self.embedding_dims))]
        parts = cats + ([features] if self.num_numeric else [])
        net = jnp.concatenate(parts, axis=-1)
        dnn = L.mlp_apply(dense["dnn"], net, final_activation=jax.nn.relu)
        dnn_logits = L.dense_apply(dense["dnn_logits"], dnn)
        cross = L.cross_net_apply(dense["cross"], net)
        cross_logits = L.dense_apply(dense["cross_logits"], cross)
        return (dnn_logits + cross_logits)[..., 0]

    def loss(self, logits, labels):
        return jnp.mean(
            optax_sigmoid_ce(logits, labels.astype(logits.dtype)))


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable sigmoid cross entropy (tf.losses.sigmoid_cross_entropy)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
