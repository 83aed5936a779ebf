"""DeepFM and Wide&Deep — standard CTR model families on KV embeddings.

The reference ships NCF and DCN examples; production TFPlus users run the
wider CTR zoo on the same KvVariable stack (its README positions the
framework for "search, recommendation and advertising" models generally).
These two complete the common set, built on the same SparseModel protocol so
`make_train_step` / checkpointing / sharding apply unchanged.

DeepFM (Guo et al., IJCAI'17): FM second-order interactions over the shared
per-field embeddings + a first-order linear term + a deep tower, summed into
one logit. The FM term uses the 0.5·((Σv)² − Σv²) identity — two batched
elementwise squares and sums, MXU/VPU friendly, no pairwise blowup.

Wide&Deep (Cheng et al., 2016): a linear "wide" part over per-field scalar
weights (a dim-1 KV table per field — exercising tiny-dim tables) + a deep
tower over the embeddings.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..nn import layers as L
from .common import SparseModel
from .dcn import optax_sigmoid_ce


class DeepFM(SparseModel):
    def __init__(self, num_fields: int = 26, embedding_dim: int = 16,
                 num_numeric: int = 13, dnn_hidden=(256, 128),
                 capacity: int = 1 << 14):
        self.num_fields = num_fields
        self.embedding_dim = embedding_dim
        self.num_numeric = num_numeric
        self.dnn_hidden = tuple(dnn_hidden)
        # one embedding table per field + a dim-1 table for the linear term
        self.table_specs = {}
        for i in range(num_fields):
            self.table_specs[f"C{i+1}"] = dict(dim=embedding_dim,
                                               capacity=capacity)
            self.table_specs[f"C{i+1}_w"] = dict(dim=1, capacity=capacity)
        self.id_alias = {f"C{i+1}_w": f"C{i+1}" for i in range(num_fields)}
        self.input_dim = num_fields * embedding_dim + num_numeric

    def init_dense(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "dnn": L.mlp_init(k1, self.input_dim, list(self.dnn_hidden)),
            "dnn_logits": L.dense_init(k2, self.dnn_hidden[-1], 1),
            "bias": jnp.zeros((1,), jnp.float32),
        }

    def apply(self, dense, embeddings: Dict[str, jnp.ndarray], features):
        V = jnp.stack([embeddings[f"C{i+1}"]
                       for i in range(self.num_fields)], axis=1)  # [B, F, D]
        # FM 2nd order: 0.5 * ((Σ_f v)^2 − Σ_f v^2), summed over D
        s = V.sum(axis=1)
        fm = 0.5 * (s * s - (V * V).sum(axis=1)).sum(axis=-1)     # [B]
        first = sum(embeddings[f"C{i+1}_w"][:, 0]
                    for i in range(self.num_fields))              # [B]
        deep_in = jnp.concatenate(
            [V.reshape(V.shape[0], -1), features], axis=-1)
        h = L.mlp_apply(dense["dnn"], deep_in,
                        final_activation=jax.nn.relu)
        deep = L.dense_apply(dense["dnn_logits"], h)[..., 0]
        return fm + first + deep + dense["bias"][0]

    def loss(self, logits, labels):
        return jnp.mean(optax_sigmoid_ce(logits, labels.astype(logits.dtype)))


class WideDeep(SparseModel):
    def __init__(self, num_fields: int = 26, embedding_dim: int = 16,
                 num_numeric: int = 13, dnn_hidden=(256, 128),
                 capacity: int = 1 << 14):
        self.num_fields = num_fields
        self.embedding_dim = embedding_dim
        self.num_numeric = num_numeric
        self.dnn_hidden = tuple(dnn_hidden)
        self.table_specs = {}
        for i in range(num_fields):
            self.table_specs[f"C{i+1}"] = dict(dim=embedding_dim,
                                               capacity=capacity)
            self.table_specs[f"C{i+1}_w"] = dict(dim=1, capacity=capacity)
        self.id_alias = {f"C{i+1}_w": f"C{i+1}" for i in range(num_fields)}
        self.input_dim = num_fields * embedding_dim + num_numeric

    def init_dense(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "dnn": L.mlp_init(k1, self.input_dim, list(self.dnn_hidden)),
            "dnn_logits": L.dense_init(k2, self.dnn_hidden[-1], 1),
            "wide_numeric": L.dense_init(k3, self.num_numeric, 1),
        }

    def apply(self, dense, embeddings: Dict[str, jnp.ndarray], features):
        wide = sum(embeddings[f"C{i+1}_w"][:, 0]
                   for i in range(self.num_fields))
        wide = wide + L.dense_apply(dense["wide_numeric"], features)[..., 0]
        deep_in = jnp.concatenate(
            [embeddings[f"C{i+1}"] for i in range(self.num_fields)]
            + [features], axis=-1)
        h = L.mlp_apply(dense["dnn"], deep_in,
                        final_activation=jax.nn.relu)
        deep = L.dense_apply(dense["dnn_logits"], h)[..., 0]
        return wide + deep

    def loss(self, logits, labels):
        return jnp.mean(optax_sigmoid_ce(logits, labels.astype(logits.dtype)))
