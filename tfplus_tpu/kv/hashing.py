"""Key encoding and hashing for KV embedding tables.

TPU-native design note
----------------------
The reference engine (``/root/reference/tfplus/kv_variable/kernels/hashmap.h:53-85``)
hashes 64-bit keys with murmur-style mixers into a host-DRAM concurrent hash map.
Here keys live in HBM as a pair of ``int32`` words ``(lo, hi)`` — JAX on TPU runs
with 32-bit integers by default, and a 2-word representation keeps every hash /
compare a cheap 32-bit VPU op while still covering the full ``uint64`` key space
(string keys are fingerprinted to 64 bits host-side, mirroring
``utility.h:96-112`` ``ModKeyImpl``).

All functions are shape-polymorphic over a leading batch shape: a key batch is an
``int32[..., 2]`` array (``[..., 0]`` = low word, ``[..., 1]`` = high word).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Reserved sentinels (as uint64): EMPTY = 2**64 - 1, TOMBSTONE = 2**64 - 2.
# As int32 words these are (-1, -1) and (-2, -1).
EMPTY_LO = np.int32(-1)
EMPTY_HI = np.int32(-1)
TOMB_LO = np.int32(-2)
TOMB_HI = np.int32(-1)

_U32 = jnp.uint32


def encode_ids(ids) -> jnp.ndarray:
    """Canonicalise user-facing ids into the ``int32[..., 2]`` key format.

    Accepts:
      * ``int32``/``uint32`` arrays of shape ``[...]`` (high word set to 0),
      * ``int32`` arrays of shape ``[..., 2]`` (already encoded — passthrough),
      * host ``numpy`` ``int64``/``uint64`` arrays (split into words; this path
        runs outside jit since JAX has no 64-bit ints without x64 mode).
    """
    if isinstance(ids, np.ndarray) and ids.dtype in (np.int64, np.uint64):
        u = ids.astype(np.uint64)
        lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32).astype(np.int32)
        hi = (u >> np.uint64(32)).astype(np.uint32).astype(np.int32)
        return jnp.stack([jnp.asarray(lo), jnp.asarray(hi)], axis=-1)
    arr = jnp.asarray(ids)
    if arr.ndim >= 1 and arr.shape[-1] == 2 and arr.dtype == jnp.int32:
        return arr
    if arr.dtype == jnp.uint32:
        arr = arr.astype(jnp.int32)
    if arr.dtype != jnp.int32:
        arr = arr.astype(jnp.int32)
    # Plain 32-bit ids: non-negative ids get hi=0; negative ids sign-extend so
    # that decode() round-trips int32 semantics.
    hi = jnp.where(arr < 0, jnp.int32(-1), jnp.int32(0))
    return jnp.stack([arr, hi], axis=-1)


def encode_ids_raw(ids) -> jnp.ndarray:
    """Like :func:`encode_ids` but NEVER interprets a trailing dim of 2 as
    already-encoded — use for raw id tensors of arbitrary shape (e.g. a
    ``[batch, 2]`` feature matrix of int32 ids)."""
    if isinstance(ids, np.ndarray) and ids.dtype in (np.int64, np.uint64):
        return encode_ids(ids)
    arr = jnp.asarray(ids)
    if arr.dtype != jnp.int32:
        arr = arr.astype(jnp.int32)
    hi = jnp.where(arr < 0, jnp.int32(-1), jnp.int32(0))
    return jnp.stack([arr, hi], axis=-1)


def encode_ids_np_to_device(ids: np.ndarray) -> jnp.ndarray:
    """Host ``int64``/``uint64`` (or 32-bit) ids → device ``int32[N, 2]``."""
    ids = np.asarray(ids)
    if ids.dtype not in (np.int64, np.uint64):
        ids = ids.astype(np.int64)
    return encode_ids(ids)


def decode_ids_np(keys: np.ndarray) -> np.ndarray:
    """Host-side inverse of :func:`encode_ids` → ``uint64`` array."""
    k = np.asarray(keys)
    lo = k[..., 0].astype(np.uint32).astype(np.uint64)
    hi = k[..., 1].astype(np.uint32).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


def is_empty(keys: jnp.ndarray) -> jnp.ndarray:
    return (keys[..., 0] == EMPTY_LO) & (keys[..., 1] == EMPTY_HI)


def is_tombstone(keys: jnp.ndarray) -> jnp.ndarray:
    return (keys[..., 0] == TOMB_LO) & (keys[..., 1] == TOMB_HI)


def is_free(keys: jnp.ndarray) -> jnp.ndarray:
    """Slot can accept an insert (empty or tombstoned)."""
    return is_empty(keys) | is_tombstone(keys)


def is_reserved_id(keys: jnp.ndarray) -> jnp.ndarray:
    """User ids colliding with sentinels (2**64-1, 2**64-2) — rejected."""
    return is_free(keys)


def keys_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (a[..., 0] == b[..., 0]) & (a[..., 1] == b[..., 1])


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finaliser — full 32-bit avalanche (cf. hashmap.h:53-85)."""
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def hash_words(keys: jnp.ndarray, seed: int) -> jnp.ndarray:
    """Mix the two key words with a seed → ``uint32[...]``."""
    lo = keys[..., 0].astype(_U32)
    hi = keys[..., 1].astype(_U32)
    h = _fmix32(lo + _U32(seed))
    h = _fmix32(h ^ (hi * _U32(0x9E3779B9)) ^ _U32(seed * 0x01000193 & 0xFFFFFFFF))
    return h


def probe_start(keys: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """First probe position; ``capacity`` must be a power of two."""
    return (hash_words(keys, 0x2545F491) & _U32(capacity - 1)).astype(jnp.int32)


def probe_step(keys: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Double-hashing step — odd so it generates Z/capacity (capacity = 2**k)."""
    return ((hash_words(keys, 0x6A09E667) | _U32(1)) & _U32(capacity - 1)).astype(jnp.int32)


def probe_positions(keys: jnp.ndarray, capacity: int, max_probes: int) -> jnp.ndarray:
    """All candidate slots ``int32[..., max_probes]`` for each key."""
    h0 = probe_start(keys, capacity).astype(_U32)
    st = probe_step(keys, capacity).astype(_U32)
    j = jnp.arange(max_probes, dtype=_U32)
    pos = (h0[..., None] + j * st[..., None]) & _U32(capacity - 1)
    return pos.astype(jnp.int32)


BUCKET_SIZE = 16


def bucket_choices(keys: jnp.ndarray, capacity: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-choice bucket hashing: each key may live in one of two contiguous
    16-slot buckets. Contiguity is the TPU-perf point — a probe fetches each
    bucket with ONE (1, 16, 2) gather slice instead of 16 scattered 8-byte
    gathers (~25x faster on TPU, where gather cost is per-slice).

    Returns bucket indices ``(b1[N], b2[N])`` into ``capacity // 16`` buckets,
    with ``b2 != b1``.
    """
    g = capacity // BUCKET_SIZE
    b1 = (hash_words(keys, 0x2545F491) & _U32(g - 1)).astype(jnp.int32)
    b2 = (hash_words(keys, 0x6A09E667) & _U32(g - 1)).astype(jnp.int32)
    b2 = jnp.where(b2 == b1, (b2 + 1) & (g - 1), b2)
    return b1, b2


def shard_of(keys: jnp.ndarray, num_shards: int) -> jnp.ndarray:
    """Owner shard = ``key_u64 % num_shards`` — identical routing to the
    reference (``embedding_ops.py:121-127``), so checkpoints re-shard by re-mod.
    """
    if num_shards == 1:
        return jnp.zeros(keys.shape[:-1], dtype=jnp.int32)
    lo = keys[..., 0].astype(_U32)
    hi = keys[..., 1].astype(_U32)
    ns = _U32(num_shards)
    if num_shards & (num_shards - 1) == 0:
        return (lo & _U32(num_shards - 1)).astype(jnp.int32)
    # (hi * 2**32 + lo) mod ns, in 32-bit arithmetic:
    # 2**32 mod ns == ((2**32 - ns) mod ns) computed host-side.
    two32_mod = np.uint32((1 << 32) % num_shards)
    return (((hi % ns) * _U32(int(two32_mod)) + (lo % ns)) % ns).astype(jnp.int32)


def init_row_indices(keys: jnp.ndarray, pool_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two deterministic pseudo-random rows of the init pool per key.

    The reference draws two random rows of its copied init table and averages
    them per new key (``kv_variable.h:889-898``). We derive the rows from the
    key hash instead — same distribution, but reproducible across replays.
    """
    r1 = hash_words(keys, 0x1B873593) % _U32(pool_size)
    r2 = hash_words(keys, 0xCC9E2D51) % _U32(pool_size)
    return r1.astype(jnp.int32), r2.astype(jnp.int32)
