"""NCF — neural collaborative filtering on dynamic KV embeddings.

Re-implementation of the reference demo model (example/NCFModel/train.py:
42-111): user + movie 32-dim KV embeddings → concat → Dense(256, relu) →
Dense(64, relu) → Dense(1) → MSE against the rating. The reference trains it
on MovieLens-100k for 20 epochs expecting a decreasing loss (:117-122).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from .common import SparseModel


class NCF(SparseModel):
    def __init__(self, embedding_dim: int = 32, hidden=(256, 64),
                 capacity: int = 1 << 13):
        self.embedding_dim = embedding_dim
        self.hidden = tuple(hidden)
        self.table_specs = {
            "user": dict(dim=embedding_dim, capacity=capacity),
            "movie": dict(dim=embedding_dim, capacity=capacity),
        }

    def init_dense(self, key):
        return L.mlp_init(key, 2 * self.embedding_dim,
                          list(self.hidden) + [1], scale=0.1)

    def apply(self, dense, embeddings, features):
        x = jnp.concatenate([embeddings["user"], embeddings["movie"]], axis=-1)
        out = L.mlp_apply(dense, x)
        return out[..., 0]

    def loss(self, preds, labels):
        return jnp.mean((preds - labels) ** 2)
