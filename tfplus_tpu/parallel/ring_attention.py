"""Ring attention — sequence/context parallelism over the mesh.

The reference's only long-sequence mechanism is single-GPU varlen
FlashAttention (SURVEY.md §5.7: "no ring attention, context parallelism ...
anywhere in the tree"; sequence length bounded by one device). This module
goes beyond parity: K/V shards rotate around the mesh ring via
``jax.lax.ppermute`` (point-to-point ICI neighbor transfers) while each
device accumulates its queries' attention with online-softmax merging —
total communication equals one all-gather but overlapped with compute.

Two local-block implementations ship: the blockwise online-softmax recipe in
plain jnp (differentiable end-to-end, including through the ppermute
rotations) and the Pallas flash-block kernel path (``_ring_flash_fwd_loop``
below, used when the flash kernel is available on the backend). Causal
masking accounts for each block's global position.

Use inside ``shard_map`` with q/k/v sharded on the sequence axis:

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp", causal=True),
        mesh=mesh, in_specs=(P(None, None, "sp", None),)*3,
        out_specs=P(None, None, "sp", None), check_vma=False)(q, k, v)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -0.7 * float(np.finfo(np.float32).max)


def _dropout_keep_block(seed, b, h, sq, skv, row0, col0,
                        p_dropout: float) -> jnp.ndarray:
    """[B,H,sq,skv] keep-mask for GLOBAL coordinates (row0+i, col0+j) —
    the flash kernel's hash (ops.flash_attention._dropout_keep_dense with
    offsets), so a ring-sharded sequence drops exactly the same attention
    entries as the single-device kernel given the same seed, independent
    of ring step order."""
    from ..ops.flash_attention import _dropout_keep_dense
    return _dropout_keep_dense(seed, b, h, sq, skv, p_dropout,
                               row0=row0, col0=col0)


def _local_block(q, k, v, sm_scale, causal, q_off, kv_off,
                 p_dropout=0.0, seed=0):
    """One (q_local × kv_block) attention partial → (acc, l, m)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    sq, skv = q.shape[2], k.shape[2]
    if causal:
        row = q_off + jnp.arange(sq)[:, None]
        col = kv_off + jnp.arange(skv)[None, :]
        s = jnp.where((col <= row)[None, None], s, _NEG)
    m = jnp.max(s, axis=-1)                                    # [B,H,Sq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)       # lse normaliser stays pre-dropout
    if p_dropout > 0.0:
        keep = _dropout_keep_block(seed, q.shape[0], q.shape[1], sq, skv,
                                   q_off, kv_off, p_dropout)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - p_dropout))
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return acc, l, m


def ring_attention(q, k, v, *, axis_name: str, causal: bool = False,
                   sm_scale: Optional[float] = None,
                   p_dropout: float = 0.0, dropout_seed=0):
    """q [B,H,Sq_l,D], k/v [B,H,Skv_l,D] — the local sequence shards of this
    device. Returns the local output shard [B,H,Sq_l,D].

    ``p_dropout``/``dropout_seed``: attention dropout with the flash
    kernel's seed-replayed global-coordinate masks — a ring-sharded run
    drops the same entries as the single-device kernel."""
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    sq_l = q.shape[2]
    skv_l = k.shape[2]
    q_off = my * sq_l

    b, h, _, d = q.shape
    m = jnp.full((b, h, sq_l), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, sq_l), jnp.float32)
    acc = jnp.zeros((b, h, sq_l, d), jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]
    k_blk, v_blk = k, v
    for step in range(n):
        src = (my - step) % n                    # who this block came from
        kv_off = src * skv_l
        a_i, l_i, m_i = _local_block(q, k_blk, v_blk, sm_scale, causal,
                                     q_off, kv_off, p_dropout, dropout_seed)
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_i - m_new)
        acc = acc * alpha[..., None] + a_i * beta[..., None]
        l = l * alpha + l_i * beta
        m = m_new
        if step < n - 1:
            # rotate KV around the ring — point-to-point ICI transfer that
            # overlaps with the next step's matmuls
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = acc / l_safe[..., None]
    # fully-masked rows (no valid key anywhere) → zeros
    out = jnp.where((m > 0.5 * _NEG)[..., None], out, 0.0)
    return out.astype(q.dtype)


def _block_seed(dropout_seed, src, step):
    """Per-ring-block dropout seed (decorrelates ring steps; the flash
    kernel hashes block-LOCAL coordinates, so the per-block seed is what
    makes the global pattern well-defined)."""
    import jax.numpy as jnp
    return (jnp.asarray(dropout_seed, jnp.int32)
            + src * jnp.int32(0x9E3D) + jnp.int32(step))


def _ring_flash_fwd_loop(q, k, v, axis_name, causal, sm_scale, p_dropout,
                         dropout_seed, block_q, block_k, interpret):
    """Forward ring sweep → (out, l, m) with GLOBAL online-softmax stats."""
    import jax.numpy as jnp
    from ..ops import flash_attention as fa
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, sq_l, d = q.shape

    m = jnp.full((b, h, sq_l), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, sq_l), jnp.float32)
    acc = jnp.zeros((b, h, sq_l, d), jnp.float32)

    def block(q, k_blk, v_blk, blk_causal: bool, seed):
        out, l_i, m_i = fa._fwd_dispatch(
            q, k_blk, v_blk, None, None, fa._seed_array(seed),
            blk_causal, sm_scale, block_q, block_k, interpret,
            save_residuals=True, p_dropout=float(p_dropout))
        # un-normalise: the kernel returns out = acc / l
        return out.astype(jnp.float32) * l_i[..., None], l_i, m_i

    perm = [(i, (i + 1) % n) for i in range(n)]
    k_blk, v_blk = k, v
    for step in range(n):
        src = (my - step) % n
        seed_i = _block_seed(dropout_seed, src, step)
        if not causal:
            a_i, l_i, m_i = block(q, k_blk, v_blk, False, seed_i)
        elif step == 0:
            # diagonal: kv is this device's own shard → causal inside
            a_i, l_i, m_i = block(q, k_blk, v_blk, True, seed_i)
        else:
            # fully visible iff the kv shard sits strictly before this
            # device's queries; fully masked otherwise — whole-block skip
            a_i, l_i, m_i = jax.lax.cond(
                src < my,
                lambda args: block(*args, False, seed_i),
                lambda args: (jnp.zeros_like(acc), jnp.zeros_like(l),
                              jnp.full_like(m, -jnp.inf)),
                (q, k_blk, v_blk))
        m_new = jnp.maximum(m, m_i)
        big = 0.5 * _NEG
        alpha = jnp.exp(jnp.maximum(m, big) - jnp.maximum(m_new, big))
        beta = jnp.exp(jnp.maximum(m_i, big) - jnp.maximum(m_new, big))
        alpha = jnp.where(m == -jnp.inf, 0.0, alpha)
        beta = jnp.where(m_i == -jnp.inf, 0.0, beta)
        acc = acc * alpha[..., None] + a_i * beta[..., None]
        l = l * alpha + l_i * beta
        m = m_new
        if step < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = acc / l_safe[..., None]
    out = jnp.where((l > 0.0)[..., None], out, 0.0)
    return out.astype(q.dtype), l, m


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _ring_flash(q, k, v, seed, axis_name, causal, sm_scale, p_dropout,
                block_q, block_k, interpret):
    out, _, _ = _ring_flash_fwd_loop(q, k, v, axis_name, causal, sm_scale,
                                     p_dropout, seed, block_q, block_k,
                                     interpret)
    return out


def _ring_flash_vjp_fwd(q, k, v, seed, axis_name, causal, sm_scale,
                        p_dropout, block_q, block_k, interpret):
    out, l, m = _ring_flash_fwd_loop(q, k, v, axis_name, causal, sm_scale,
                                     p_dropout, seed, block_q, block_k,
                                     interpret)
    return out, (q, k, v, seed, out, l, m)


def _ring_flash_vjp_bwd(axis_name, causal, sm_scale, p_dropout, block_q,
                        block_k, interpret, res, do):
    """Ring backward: every block's (dq, dk, dv) comes from the Pallas
    flash backward kernels fed the GLOBAL (l, m) stats — p reconstructs as
    the global softmax probability, so per-block gradients sum to the
    exact attention gradient. dq accumulates locally; dk/dv accumulate on
    buffers that travel WITH the kv blocks and take one final ppermute
    hop home. Device memory stays O(S_local) in backward too.
    """
    import jax.numpy as jnp
    from ..ops import flash_attention as fa
    q, k, v, seed, out, l, m = res
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)

    def block_bwd(q, k_blk, v_blk, blk_causal: bool, seed_i):
        return fa._bwd_pallas(q, k_blk, v_blk, None, None,
                              fa._seed_array(seed_i), out, l, m, do,
                              causal=blk_causal, sm_scale=sm_scale,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret,
                              p_dropout=float(p_dropout))

    perm = [(i, (i + 1) % n) for i in range(n)]
    dq = jnp.zeros(q.shape, jnp.float32)
    k_blk, v_blk = k, v
    dk_blk = jnp.zeros(k.shape, jnp.float32)
    dv_blk = jnp.zeros(v.shape, jnp.float32)
    for step in range(n):
        src = (my - step) % n
        seed_i = _block_seed(0 if seed is None else seed, src, step)
        if not causal:
            dq_i, dk_i, dv_i = block_bwd(q, k_blk, v_blk, False, seed_i)
        elif step == 0:
            dq_i, dk_i, dv_i = block_bwd(q, k_blk, v_blk, True, seed_i)
        else:
            dq_i, dk_i, dv_i = jax.lax.cond(
                src < my,
                lambda args: block_bwd(*args, False, seed_i),
                lambda args: (jnp.zeros_like(q), jnp.zeros_like(k),
                              jnp.zeros_like(v)),
                (q, k_blk, v_blk))
        dq = dq + dq_i.astype(jnp.float32)
        dk_blk = dk_blk + dk_i.astype(jnp.float32)
        dv_blk = dv_blk + dv_i.astype(jnp.float32)
        if step < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            dk_blk = jax.lax.ppermute(dk_blk, axis_name, perm)
            dv_blk = jax.lax.ppermute(dv_blk, axis_name, perm)
    # after n-1 rotations the block owned by o sits on device o-1:
    # one more hop returns the accumulated dk/dv to their owners
    dk_blk = jax.lax.ppermute(dk_blk, axis_name, perm)
    dv_blk = jax.lax.ppermute(dv_blk, axis_name, perm)
    return (dq.astype(q.dtype), dk_blk.astype(k.dtype),
            dv_blk.astype(v.dtype), None)


_ring_flash.defvjp(_ring_flash_vjp_fwd, _ring_flash_vjp_bwd)


def ring_flash_attention(q, k, v, *, axis_name: str, causal: bool = False,
                         sm_scale: Optional[float] = None,
                         p_dropout: float = 0.0, dropout_seed=0,
                         block_q: int = 512, block_k: int = 512,
                         interpret: Optional[bool] = None):
    """Ring attention with the PALLAS FLASH KERNEL as the per-block compute:
    device memory stays O(S_local) — the [Sq_l, Skv_l] block score matrix of
    :func:`ring_attention` is never materialised, so sequence length scales
    with ring size × flash-kernel reach (the plain-jnp ring tops out when
    one block's scores exhaust HBM).

    Works with the UNMODIFIED flash kernel because a ring block pair is
    always one of three whole-block cases: the diagonal (kv from this
    device — causal flash), fully visible (kv from an earlier position —
    non-causal flash), or fully masked (later position — skipped via
    ``lax.cond``, the ring's tile-skipping).

    DIFFERENTIABLE: the custom VJP runs the flash backward kernel pair per
    ring block with the global (l, m) stats, dk/dv riding the rotating
    buffers home — O(S_local) memory in backward too.

    Dropout uses a per-(source-shard, step) derived seed — statistically
    equivalent inverted dropout, replayed exactly in backward; the mask
    pattern does not replicate the single-device kernel's (use
    :func:`ring_attention` when exact cross-topology mask equality
    matters).
    """
    import jax.numpy as jnp
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ring_flash(q, k, v, jnp.asarray(dropout_seed, jnp.int32),
                       axis_name, causal, sm_scale, float(p_dropout),
                       block_q, block_k, interpret)


def context_parallel_attention(q, k_shard, v_shard, *, axis_name: str,
                               causal: bool = False,
                               sm_scale: Optional[float] = None,
                               p_dropout: float = 0.0, dropout_seed=0):
    """Simpler alternative (one collective round instead of a ring): each
    device computes a partial against its local KV shard; partials merge with
    a cross-device online-softmax combine (pmax + psum)."""
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    my = jax.lax.axis_index(axis_name)
    skv_l = k_shard.shape[2]
    # q replicated across the axis: global offsets start at 0
    acc, l, m = _local_block(q, k_shard, v_shard, sm_scale, causal,
                             0, my * skv_l, p_dropout, dropout_seed)
    m_g = jax.lax.pmax(m, axis_name)
    corr = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * corr, axis_name)
    acc_g = jax.lax.psum(acc * corr[..., None], axis_name)
    l_safe = jnp.where(l_g == 0.0, 1.0, l_g)
    out = acc_g / l_safe[..., None]
    out = jnp.where((m_g > 0.5 * _NEG)[..., None], out, 0.0)
    return out.astype(q.dtype)
