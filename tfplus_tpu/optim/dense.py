"""Dense twins of the sparse optimizer rules.

The reference registers a dense/resource ``Apply*`` twin for every in-house
optimizer (ops/training_ops.cc:103-1285: ApplyAdaDQH, ApplyAdaHessian,
ApplyAdaBelief, ApplyLamb, ApplyLambHessian, ...). Here every sparse
:class:`~tfplus_tpu.optim.rules.Rule` doubles as a dense update by treating a
dense parameter as its own row batch, and is exposed as an optax
``GradientTransformation`` so dense towers can use the in-house optimizers
(AdaDQH etc.) alongside stock optax ones.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .rules import Rule


class DenseRuleState(NamedTuple):
    step: jnp.ndarray                 # int32 scalar
    slots: optax.Params               # per-leaf [*, k*last_dim] arrays


def _rowify(x: jnp.ndarray):
    """View a parameter as a [N, D] row batch (D = trailing dim, padded to
    rank-2; scalars/vectors become a single row)."""
    if x.ndim == 0:
        return x.reshape(1, 1), x.shape
    if x.ndim == 1:
        return x.reshape(1, -1), x.shape
    return x.reshape(-1, x.shape[-1]), x.shape


def as_optax(rule: Rule, learning_rate: float) -> optax.GradientTransformation:
    """Wrap a rule as an optax transformation (dense Apply* twin)."""

    def init_fn(params):
        def mk(p):
            rows, _ = _rowify(p)
            return jnp.zeros((rows.shape[0], rule.slot_width * rows.shape[1]),
                             p.dtype)
        slots = jax.tree_util.tree_map(mk, params)
        return DenseRuleState(step=jnp.zeros((), jnp.int32), slots=slots)

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("this transformation requires params")
        step = state.step + 1

        def upd(p, g, s):
            rows, shape = _rowify(p)
            grows, _ = _rowify(g)
            new_rows, new_s, _ = rule.update(rows, s, grows,
                                             lr=learning_rate, step=step)
            return (new_rows.reshape(shape) - p), new_s

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_s = treedef.flatten_up_to(state.slots)
        outs = [upd(p, g, s) for p, g, s in zip(flat_p, flat_g, flat_s)]
        updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        slots = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        return updates, DenseRuleState(step=step, slots=slots)

    return optax.GradientTransformation(init_fn, update_fn)
