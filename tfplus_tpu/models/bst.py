"""BST — Behavior Sequence Transformer for CTR (arXiv:1905.06874).

Beyond reference parity, and the flash-attention stack's model-level
consumer: where DIN (models/din.py) pools the click history with a
learned activation unit, BST runs transformer blocks over the sequence
``[history..., candidate]`` — multi-head self-attention through
:func:`tfplus_tpu.nn.attention.flash_attention_layer` (the Pallas flash
kernel with segment-id varlen masking; reference kernel surface
N24-25), learned position embeddings, pre-LN residual blocks, and a
masked mean pool into the CTR tower.

The item/user KV tables are wired exactly like DIN: one shared item
table fed by the candidate + flattened-history id streams (single
dedup/probe/apply), padding carried as a mask in ``features``. The
sequence axis is padded to ``pad_to`` (flash block granularity, 128 on
TPU) with masked positions — the kernel's tile-skip makes the pad cheap.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import layers as L
from ..nn.attention import flash_attention_layer
from .common import SparseModel
from .dcn import optax_sigmoid_ce
from .din import DIN


def _ln_init(dim: int):
    return {"g": jnp.ones((dim,), jnp.float32),
            "b": jnp.zeros((dim,), jnp.float32)}


def _ln(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


class BST(SparseModel):
    def __init__(self, embedding_dim: int = 32, seq_len: int = 31,
                 num_numeric: int = 4, num_heads: int = 2,
                 head_dim: int = 32, num_blocks: int = 1,
                 ffn_hidden: int = 64, dnn_hidden=(128, 64),
                 capacity: int = 1 << 14, pad_to: int = 128):
        self.embedding_dim = embedding_dim
        self.seq_len = seq_len              # history length; +1 candidate
        self.num_numeric = num_numeric
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.num_blocks = num_blocks
        self.ffn_hidden = ffn_hidden
        self.dnn_hidden = tuple(dnn_hidden)
        self.pad_to = pad_to
        self.table_specs = {
            "item": dict(dim=embedding_dim, capacity=capacity),
            "user": dict(dim=embedding_dim, capacity=capacity),
        }
        # [user, pooled, cand_token, numeric]
        self.input_dim = 3 * embedding_dim + num_numeric

    # DIN's shared-item-table id packing (candidate first, then history)
    pack_item_ids = staticmethod(DIN.pack_item_ids)

    def init_dense(self, key):
        d, inner = self.embedding_dim, self.num_heads * self.head_dim
        keys = jax.random.split(key, 4 + 6 * self.num_blocks)
        dense = {
            "pos": jax.random.normal(keys[0],
                                     (self.seq_len + 1, d)) * 0.02,
            "dnn": L.mlp_init(keys[1], self.input_dim,
                              list(self.dnn_hidden)),
            "dnn_logits": L.dense_init(keys[2], self.dnn_hidden[-1], 1),
            "blocks": [],
        }
        for i in range(self.num_blocks):
            k = keys[4 + 6 * i: 10 + 6 * i]
            dense["blocks"].append({
                "ln1": _ln_init(d), "ln2": _ln_init(d),
                "qkv": L.dense_init(k[0], d, 3 * inner, scale=0.05),
                "proj": L.dense_init(k[1], inner, d, scale=0.05),
                "ffn1": L.dense_init(k[2], d, self.ffn_hidden, scale=0.05),
                "ffn2": L.dense_init(k[3], self.ffn_hidden, d, scale=0.05),
            })
        return dense

    def apply(self, dense, embeddings: Dict[str, jnp.ndarray], features):
        mask = features["mask"]                         # [B, L]
        b, hist = mask.shape
        d = self.embedding_dim
        e = embeddings["item"]
        cand = e[:b]
        seq = e[b:].reshape(b, hist, d)
        user = embeddings["user"]

        # tokens = [history..., candidate]; learned positions
        x = jnp.concatenate([seq, cand[:, None, :]], axis=1)  # [B, L+1, D]
        x = x + dense["pos"][None, : hist + 1]
        tok_mask = jnp.concatenate(
            [mask, jnp.ones((b, 1), mask.dtype)], axis=1)     # [B, L+1]

        # pad the sequence axis to the flash block granularity; padded
        # positions carry mask 0 -> segment -1 inside the layer
        s = hist + 1
        pad = (-s) % self.pad_to
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            tok_mask = jnp.pad(tok_mask, ((0, 0), (0, pad)))

        h_heads, dh = self.num_heads, self.head_dim
        for blk in dense["blocks"]:
            y = _ln(blk["ln1"], x)
            qkv = L.dense_apply(blk["qkv"], y)         # [B, S, 3*H*dh]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            sp = x.shape[1]
            q = q.reshape(b, sp, h_heads, dh)
            k = k.reshape(b, sp, h_heads, dh)
            v = v.reshape(b, sp, h_heads, dh)
            att = flash_attention_layer(q, k, v, attention_mask=tok_mask)
            att = att.reshape(b, sp, h_heads * dh)
            x = x + L.dense_apply(blk["proj"], att)
            y = _ln(blk["ln2"], x)
            y = L.dense_apply(blk["ffn1"], y, activation=jax.nn.relu)
            x = x + L.dense_apply(blk["ffn2"], y)

        # masked mean pool over real tokens + the candidate's own token
        w = tok_mask[..., None]
        pooled = (x * w).sum(1) / jnp.maximum(w.sum(1), 1.0)
        cand_tok = x[:, hist]                           # candidate position
        deep_in = jnp.concatenate(
            [user, pooled, cand_tok, features["numeric"]], axis=-1)
        out = L.mlp_apply(dense["dnn"], deep_in, final_activation=jax.nn.relu)
        return L.dense_apply(dense["dnn_logits"], out)[..., 0]

    def loss(self, logits, labels):
        return jnp.mean(optax_sigmoid_ce(logits, labels.astype(logits.dtype)))
