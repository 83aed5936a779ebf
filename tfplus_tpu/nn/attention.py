"""Layer-level flash attention — equivalent of the reference's
FlashAttentionLayer (flash_attn/python/ops/flash_attn_ops.py:57-190).

The reference layer takes padded [B, S, H, D] q/k/v plus an attention mask,
packs tokens into the varlen [ΣS, H, D] layout with cu_seqlens, and calls the
CUDA FMHA kernel. The TPU-native equivalent keeps the padded layout and
expresses varlen via segment ids (−1 = padding) — no pack/unpad round trip.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops import flash_attention as fa


def flash_attention_layer(q, k, v, *, attention_mask=None, lengths=None,
                          causal: bool = False,
                          softmax_scale: Optional[float] = None,
                          block_q: int = 128, block_k: int = 128,
                          p_dropout: float = 0.0, dropout_seed=0,
                          interpret: Optional[bool] = None):
    """q/k/v: [B, S, H, D] (the reference layer's layout). Either
    ``attention_mask`` [B, S] (1 = valid) or ``lengths`` [B] describes
    padding. Returns [B, S, H, D] with padded positions zeroed.

    ``p_dropout``/``dropout_seed`` = the reference layer's attention
    dropout (flash_attn_ops.py p_dropout → FMHA rng_state); pass a fresh
    seed per training step, 0 dropout at inference.
    """
    b, s, h, d = q.shape
    if attention_mask is not None:
        seg = jnp.where(attention_mask.astype(bool), 0, -1).astype(jnp.int32)
    elif lengths is not None:
        seg = fa.make_segment_ids_from_lengths(jnp.asarray(lengths), s)
    else:
        seg = None
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = fa.flash_attention(qt, kt, vt, causal=causal,
                             sm_scale=softmax_scale,
                             q_segment_ids=seg, kv_segment_ids=seg,
                             block_q=block_q, block_k=block_k,
                             p_dropout=p_dropout, dropout_seed=dropout_seed,
                             interpret=interpret)
    return jnp.transpose(out, (0, 2, 1, 3))
