"""DLRM-style model — multi-table embeddings + dot interaction, built for the
row-sharded multi-device path (BASELINE.json config: "DLRM-style multi-table
row-sharded training with all-to-all exchange").

The reference has no DLRM example but its scale-out story (PartitionedVariable
sharding + eflops all-to-all intent, SURVEY.md §2.4) is exactly this workload;
we provide it as the flagship distributed configuration.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..nn import layers as L
from .common import SparseModel
from .dcn import optax_sigmoid_ce


class DLRM(SparseModel):
    def __init__(self, num_tables: int = 8, embedding_dim: int = 32,
                 num_numeric: int = 13, bottom_hidden=(64, 32),
                 top_hidden=(64, 32), capacity: int = 1 << 14):
        assert bottom_hidden[-1] == embedding_dim, \
            "bottom MLP must project numeric features to embedding_dim"
        self.num_tables = num_tables
        self.embedding_dim = embedding_dim
        self.num_numeric = num_numeric
        self.bottom_hidden = tuple(bottom_hidden)
        self.top_hidden = tuple(top_hidden)
        self.table_specs = {
            f"T{i}": dict(dim=embedding_dim, capacity=capacity)
            for i in range(num_tables)
        }
        n_feat = num_tables + 1
        self.num_pairs = n_feat * (n_feat - 1) // 2
        self.top_in = embedding_dim + self.num_pairs

    def init_dense(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "bottom": L.mlp_init(k1, self.num_numeric, list(self.bottom_hidden)),
            "top": L.mlp_init(k2, self.top_in, list(self.top_hidden) + [1]),
        }

    def apply(self, dense, embeddings: Dict[str, jnp.ndarray], features):
        x_num = L.mlp_apply(dense["bottom"], features,
                            final_activation=jax.nn.relu)   # [B, D]
        feats = [x_num] + [embeddings[f"T{i}"] for i in range(self.num_tables)]
        T = jnp.stack(feats, axis=1)                         # [B, F, D]
        # pairwise dot interactions — one batched matmul on the MXU
        Z = jnp.einsum("bfd,bgd->bfg", T, T)
        iu, ju = jnp.triu_indices(T.shape[1], k=1)
        inter = Z[:, iu, ju]                                 # [B, F(F-1)/2]
        top_in = jnp.concatenate([x_num, inter], axis=-1)
        return L.mlp_apply(dense["top"], top_in)[..., 0]

    def loss(self, logits, labels):
        return jnp.mean(optax_sigmoid_ce(logits, labels.astype(logits.dtype)))
