"""DIN — Deep Interest Network for CTR with behavior-sequence attention.

Beyond reference parity (the reference's example zoo is DCN + NCF; it has
no sequence model — SURVEY.md §6): DIN (arXiv:1706.06978) scores a
candidate item against the user's clicked-item history with a learned
*activation unit* — a small MLP over ``[h, c, h*c, h-c]`` per history
position — and pools the history by those attention weights into a
per-candidate interest vector. This exercises the framework pieces a
production sequence recommender needs from the KV engine: ONE shared
item table serving two id streams (candidate + flattened behavior
sequence, deduped together in a single probe/gather/apply pass) and
variable-length sequences via padding masks carried in ``features``.

Batch layout (see :meth:`DIN.pack_item_ids`):
  * ``batch["ids"]["item"]``  — ``concat([cand[B], behavior[B*L]])``
  * ``batch["ids"]["user"]``  — ``[B]``
  * ``batch["features"]``     — ``{"numeric": [B, n], "mask": [B, L]}``
    (mask 1.0 at real positions, 0.0 at pad; pad id 0 allocates one
    harmless table row whose gradient is zeroed by the mask).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import layers as L
from .common import SparseModel
from .dcn import optax_sigmoid_ce


class DIN(SparseModel):
    def __init__(self, embedding_dim: int = 32, seq_len: int = 16,
                 num_numeric: int = 4, att_hidden=(64, 32),
                 dnn_hidden=(128, 64), capacity: int = 1 << 14):
        self.embedding_dim = embedding_dim
        self.seq_len = seq_len
        self.num_numeric = num_numeric
        self.att_hidden = tuple(att_hidden)
        self.dnn_hidden = tuple(dnn_hidden)
        self.table_specs = {
            "item": dict(dim=embedding_dim, capacity=capacity),
            "user": dict(dim=embedding_dim, capacity=capacity),
        }
        # [user, cand, interest, interest*cand, numeric]
        self.input_dim = 4 * embedding_dim + num_numeric

    @staticmethod
    def pack_item_ids(cand_ids: np.ndarray, seq_ids: np.ndarray) -> np.ndarray:
        """One id stream for the shared item table: ``[cand; seq.ravel()]``
        — the step's dedup then probes each unique item exactly once even
        when it appears both as candidate and in histories."""
        return np.concatenate([np.asarray(cand_ids).reshape(-1),
                               np.asarray(seq_ids).reshape(-1)])

    def init_dense(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        d = self.embedding_dim
        return {
            # activation unit: per-position [h, c, h*c, h-c] -> scalar score
            "att": L.mlp_init(k1, 4 * d, list(self.att_hidden)),
            "att_out": L.dense_init(k2, self.att_hidden[-1], 1),
            "dnn": L.mlp_init(k3, self.input_dim, list(self.dnn_hidden)),
            "dnn_logits": L.dense_init(k4, self.dnn_hidden[-1], 1),
        }

    def apply(self, dense, embeddings: Dict[str, jnp.ndarray], features):
        mask = features["mask"]                       # [B, L] {0,1}
        b, length = mask.shape
        d = self.embedding_dim
        e = embeddings["item"]                        # [B + B*L, D]
        cand = e[:b]                                  # [B, D]
        seq = e[b:].reshape(b, length, d)             # [B, L, D]
        user = embeddings["user"]                     # [B, D]

        cexp = jnp.broadcast_to(cand[:, None, :], seq.shape)
        att_in = jnp.concatenate(
            [seq, cexp, seq * cexp, seq - cexp], axis=-1)  # [B, L, 4D]
        h = L.mlp_apply(dense["att"], att_in, final_activation=jax.nn.relu)
        scores = L.dense_apply(dense["att_out"], h)[..., 0]     # [B, L]
        scores = jnp.where(mask > 0, scores, -1e9)
        # all-pad rows (cold-start user) get a zero interest vector
        w = jax.nn.softmax(scores, axis=-1) * (mask.sum(-1, keepdims=True) > 0)
        interest = jnp.einsum("bl,bld->bd", w, seq)             # [B, D]

        numeric = features["numeric"]
        deep_in = jnp.concatenate(
            [user, cand, interest, interest * cand, numeric], axis=-1)
        out = L.mlp_apply(dense["dnn"], deep_in, final_activation=jax.nn.relu)
        return L.dense_apply(dense["dnn_logits"], out)[..., 0]

    def loss(self, logits, labels):
        return jnp.mean(optax_sigmoid_ce(logits, labels.astype(logits.dtype)))
