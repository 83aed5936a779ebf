"""Per-row metadata packing: saturating uint16 frequency + day timestamp.

Bit-compatible with the reference's packed ``uint32`` meta word
(``embedding_value.h:189-234``, ``utility.h:50-70``): low 16 bits hold a
saturating visit frequency, high 16 bits hold the day (unix_time // 86400)
of the last update — this packing is load-bearing for frequency filtering
(``enter_threshold``) and time-based eviction (``DeleteWithTimestamp``).
"""
from __future__ import annotations

import time

import jax.numpy as jnp

_U32 = jnp.uint32
FREQ_MASK = 0xFFFF
MAX_FREQ = 0xFFFF


def pack(freq: jnp.ndarray, day: jnp.ndarray) -> jnp.ndarray:
    return (day.astype(_U32) << 16) | (freq.astype(_U32) & _U32(FREQ_MASK))


def get_freq(meta: jnp.ndarray) -> jnp.ndarray:
    return meta.astype(_U32) & _U32(FREQ_MASK)


def get_day(meta: jnp.ndarray) -> jnp.ndarray:
    return meta.astype(_U32) >> 16


def saturating_add_freq(meta: jnp.ndarray, add: jnp.ndarray, day) -> jnp.ndarray:
    """freq = min(freq + add, 0xFFFF); day = now (cf. utility.h:65-70)."""
    f = get_freq(meta) + add.astype(_U32)
    f = jnp.minimum(f, _U32(MAX_FREQ))
    return pack(f, jnp.asarray(day, dtype=_U32))


def current_day() -> int:
    """Host-side day stamp (unix seconds // 86400, cf. utility.h:50)."""
    return int(time.time()) // 86400
