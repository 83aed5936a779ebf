"""Per-row metadata packing: one uint32 word per row.

The reference packs a saturating uint16 visit frequency + the day
(unix_time // 86400) of the last update into one uint32
(``embedding_value.h:189-234``, ``utility.h:50-70``) and keeps blacklist /
delta-list membership as separate per-row state. Here ALL per-row metadata
lives in a single word so the hot path pays ONE metadata gather+scatter per
step (measured: two separate uint32 streams cost 0.97 ms/step on v5e vs
0.53 ms merged — PERF.md):

    bits  0..15  saturating visit frequency   (reference-identical)
    bits 16..28  day of last update, mod 8192 (13 bits; comparisons are
                 wraparound-safe for eviction thresholds < 4096 days ≈ 11 y)
    bit  29      group-lasso blacklist        (reference: EmbeddingValue
                                               in_black, embedding_value.h)
    bit  30      train delta-list membership  (kv_variable.h:870-871)
    bit  31      prediction delta-list membership

Checkpoints still emit the reference-format ``freq|day16`` word (see
``kv.table.export_arrays``), so the on-disk contract is unchanged.
"""
from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
FREQ_MASK = 0xFFFF
MAX_FREQ = 0xFFFF
DAY_BITS = 13
DAY_MASK = 0x1FFF
FLAGS_SHIFT = 29
FLAGS_MASK = 0xE0000000

# flag bits (numpy scalars: no device allocation at import; usable directly
# against the packed word in jnp expressions)
FLAG_BLACKLIST = np.uint32(1 << 29)
FLAG_TOUCH_TRAIN = np.uint32(1 << 30)
FLAG_TOUCH_PRED = np.uint32(1 << 31)
FLAG_TOUCH_BOTH = np.uint32(0b11 << 30)


def pack(freq: jnp.ndarray, day, flags=0) -> jnp.ndarray:
    day = jnp.asarray(day, dtype=_U32) & _U32(DAY_MASK)
    word = (day << 16) | (freq.astype(_U32) & _U32(FREQ_MASK))
    return word | (jnp.asarray(flags, _U32) & _U32(FLAGS_MASK))


def get_freq(meta: jnp.ndarray) -> jnp.ndarray:
    return meta.astype(_U32) & _U32(FREQ_MASK)


def get_day(meta: jnp.ndarray) -> jnp.ndarray:
    return (meta.astype(_U32) >> 16) & _U32(DAY_MASK)


def get_flags(meta: jnp.ndarray) -> jnp.ndarray:
    return meta.astype(_U32) & _U32(FLAGS_MASK)


def day_age(now_day, row_day) -> jnp.ndarray:
    """Wraparound-safe ``now - row_day`` over the 13-bit day ring."""
    now = jnp.asarray(now_day, jnp.int32) & DAY_MASK
    return (now - row_day.astype(jnp.int32)) & DAY_MASK


def saturating_add_freq(meta: jnp.ndarray, add: jnp.ndarray, day) -> jnp.ndarray:
    """freq = min(freq + add, 0xFFFF); day = now; flag bits preserved
    (cf. utility.h:65-70)."""
    f = jnp.minimum(get_freq(meta) + add.astype(_U32), _U32(MAX_FREQ))
    return pack(f, day, get_flags(meta))


def to_reference_word(meta: jnp.ndarray) -> jnp.ndarray:
    """Strip flags → the reference's ``freq | day<<16`` checkpoint word."""
    return get_freq(meta) | (get_day(meta) << 16)


def from_reference_word(word: jnp.ndarray, flags=0) -> jnp.ndarray:
    return pack(word & _U32(FREQ_MASK), word >> 16, flags)


def current_day() -> int:
    """Host-side day stamp (unix seconds // 86400, cf. utility.h:50)."""
    return int(time.time()) // 86400


def reference_day_np(meta: np.ndarray, as_of_unix_day=None) -> np.ndarray:
    """Reconstruct the reference's FULL 16-bit unix day from the in-table
    13-bit ring (numpy, host-side): ``today − ring_age``. Exact for rows
    stamped with :func:`current_day`-derived days within the last 8192 days
    (~22 y) — see docs/checkpointing.md."""
    now = current_day() if as_of_unix_day is None else int(as_of_unix_day)
    ring_now = now & DAY_MASK
    ring_row = (np.asarray(meta, np.uint32) >> 16) & DAY_MASK
    age = (np.int64(ring_now) - ring_row.astype(np.int64)) & DAY_MASK
    return ((np.int64(now) - age) & 0xFFFF).astype(np.uint32)


def reference_word_np(meta: np.ndarray, as_of_unix_day=None) -> np.ndarray:
    """The reference's on-disk ``freq | unix_day<<16`` word (numpy)."""
    m = np.asarray(meta, np.uint32)
    return ((m & np.uint32(FREQ_MASK))
            | (reference_day_np(m, as_of_unix_day) << np.uint32(16)))
