"""Minimal functional dense layers for the model towers.

The reference's towers are stock Keras/TF layers (example/NCFModel/train.py:
46-76 Dense stacks; example/dcn/train.py:157-202 DNN + cross net). Here they
are pure init/apply functions over parameter pytrees so the whole train step
stays functional and GSPMD-shardable; matmuls hit the MXU via jnp.dot with
float32 accumulation.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def dense_init(key, in_dim: int, out_dim: int, scale: float = 0.1):
    """RandomNormal(0, scale) for both kernel and bias — matching the NCF
    example's initializers (train.py:48-63)."""
    kw, kb = jax.random.split(key)
    return {"w": jax.random.normal(kw, (in_dim, out_dim)) * scale,
            "b": jax.random.normal(kb, (out_dim,)) * scale}


def dense_apply(p, x, activation=None):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]
    if activation is not None:
        y = activation(y)
    return y.astype(x.dtype)


def mlp_init(key, in_dim: int, hidden: Sequence[int], scale: float = 0.1):
    params = []
    d = in_dim
    for h in hidden:
        key, sub = jax.random.split(key)
        params.append(dense_init(sub, d, h, scale))
        d = h
    return params


def mlp_apply(params, x, activation=jax.nn.relu, final_activation=None):
    for i, p in enumerate(params):
        act = activation if i + 1 < len(params) else final_activation
        x = dense_apply(p, x, act)
    return x


def cross_net_init(key, dim: int, num_layers: int = 2, scale: float = 0.1):
    """DCN cross network params (example/dcn/train.py:176-202): per layer a
    weight vector w[dim] and bias b[dim]."""
    out = []
    for _ in range(num_layers):
        key, k1, k2 = jax.random.split(key, 3)
        out.append({"w": jax.random.normal(k1, (dim,)) * scale,
                    "b": jax.random.normal(k2, (dim,)) * scale})
    return out


def cross_net_apply(params, x0):
    """x_{l+1} = x0 * (x_l · w_l) + b_l + x_l (train.py:197-198)."""
    x = x0
    for p in params:
        xw = jnp.sum(x * p["w"], axis=-1, keepdims=True)
        x = x0 * xw + p["b"] + x
    return x
