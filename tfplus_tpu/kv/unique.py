"""Static-shape unique-with-counts for id batches.

The reference deduplicates ids with ``tf.unique_with_counts`` before lookup so
frequency counting is per-example, not per-row (``embedding_ops.py:365-372``).
Under XLA everything must be statically shaped, so ``unique_with_counts`` here
returns a fixed-size ``[N]`` unique array padded with the EMPTY sentinel plus
the number of valid uniques — downstream kernels mask on validity.

Deduplication is also what makes the optimizer path deterministic: gradients
for duplicate ids are segment-summed onto one row instead of racing
(SURVEY.md §5.2).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hashing


class UniqueResult(NamedTuple):
    """All arrays have static shape [N] (N = input size)."""

    unique_keys: jnp.ndarray   # int32[N, 2]; rows >= num_unique are EMPTY
    inverse: jnp.ndarray       # int32[N]: position of each input id in unique_keys
    counts: jnp.ndarray        # int32[N]: multiplicity of each unique id (0 on pads)
    num_unique: jnp.ndarray    # int32 scalar


def unique_with_counts(keys: jnp.ndarray, valid: jnp.ndarray | None = None) -> UniqueResult:
    """Dedup encoded keys ``int32[N, 2]``.

    ``valid`` masks out padding slots of the input (invalid entries get
    ``inverse`` pointing at a pad row whose count is 0).
    """
    n = keys.shape[0]
    lo = keys[:, 0]
    hi = keys[:, 1]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    # Sort invalid entries to the back by forcing their key to the EMPTY
    # sentinel (which sorts deterministically; equal keys group together).
    lo = jnp.where(valid, lo, hashing.EMPTY_LO)
    hi = jnp.where(valid, hi, hashing.EMPTY_HI)
    # Lexicographic sort on (validity desc, hi, lo), carrying original index.
    inv_rank = (~valid).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    inv_rank, hi_s, lo_s, idx_s = jax.lax.sort(
        (inv_rank, hi, lo, idx), num_keys=3)
    valid_s = inv_rank == 0

    prev_same = jnp.concatenate([
        jnp.zeros((1,), dtype=bool),
        (hi_s[1:] == hi_s[:-1]) & (lo_s[1:] == lo_s[:-1]),
    ])
    is_first = valid_s & ~prev_same
    # Unique slot index for each sorted position.
    uix = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_unique = jnp.sum(is_first.astype(jnp.int32))
    # Invalid rows map to a trailing pad slot (count 0, EMPTY key).
    uix = jnp.where(valid_s, uix, n - 1)

    empty_row = jnp.array([hashing.EMPTY_LO, hashing.EMPTY_HI], dtype=jnp.int32)
    unique_keys = jnp.broadcast_to(empty_row, (n, 2))
    src = jnp.stack([lo_s, hi_s], axis=-1)
    unique_keys = unique_keys.at[uix].set(
        jnp.where(valid_s[:, None], src, empty_row), mode="drop")

    counts = jnp.zeros((n,), dtype=jnp.int32).at[uix].add(
        valid_s.astype(jnp.int32), mode="drop")

    inverse = jnp.zeros((n,), dtype=jnp.int32).at[idx_s].set(uix)
    return UniqueResult(unique_keys, inverse, counts, num_unique)
