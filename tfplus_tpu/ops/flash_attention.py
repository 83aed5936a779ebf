"""Flash attention — Pallas TPU kernel with varlen (segment-id) support.

TPU-native replacement for the reference's GPU FMHA wrappers
(``/root/reference/tfplus/flash_attn/``: ops/flash_attention_ops.cc:8-68
FMHAForward/Backward around Dao-AILab flash-attention v1.0.4, fp16/bf16,
head dim ≤ 128, varlen via cu_seqlens prefix sums, causal flag, softmax_lse
residual). Design follows the blockwise online-softmax recipe: the
(seq, seq) score matrix is never materialised; per-Q-tile running max ``m``,
normaliser ``l`` and output accumulator live in VMEM scratch across KV tiles.

Varlen: instead of CUDA's packed [ΣS, H, D] + cu_seqlens, sequences are
packed along one axis with **segment ids** (the TPU idiom): tokens attend
only within their segment; ``segment_id < 0`` marks padding (attends to
nothing, outputs zeros).

Backward uses the standard flash residuals (o, l, m): on TPU (and in
interpret mode) a blockwise Pallas dkv/dq kernel pair recomputes p from the
saved stats tile-by-tile — memory stays O(S), the score matrix is never
materialised (the reference's backward likewise recomputes from
softmax_lse). Off-TPU a dense XLA recompute is the fallback.

Shapes: q [B, H, Sq, D], k/v [B, H, Skv, D]; segment ids [B, Sq] / [B, Skv].
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
_LANES = 128


# ---------------------------------------------------------------------------
# Attention dropout (reference FMHA contract: p_dropout + rng_state,
# flash_attention_ops.cc:8-37). The keep-mask is a COUNTER-BASED hash of
# (seed, batch, head, global_row, global_col) — a pure jnp function, so the
# forward kernel, the backward kernels and the dense fallback all regenerate
# bit-identical masks from the same seed (the reference's rng_state replay),
# with no dependence on tile iteration order or pltpu PRNG availability.
# ---------------------------------------------------------------------------

def _mix_bits(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer — full-avalanche 32-bit mix."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _dropout_keep(seed, bi, hi, row0, col0, bq: int, bk: int,
                  p_dropout: float) -> jnp.ndarray:
    """Boolean keep-mask tile [bq, bk] for global coordinates
    (row0+i, col0+j). ``seed``/``bi``/``hi`` may be traced scalars."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (bq, bk), 0) \
        + jnp.uint32(row0)
    c = jax.lax.broadcasted_iota(jnp.uint32, (bq, bk), 1) \
        + jnp.uint32(col0)
    base = (jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
            + jnp.uint32(bi) * jnp.uint32(0x7FEB352D)
            + jnp.uint32(hi) * jnp.uint32(0x846CA68B))
    x = _mix_bits(base + r * jnp.uint32(0x27D4EB2F) + c)
    thresh = jnp.uint32(min(int(p_dropout * 4294967296.0), 4294967295))
    return x >= thresh


def _dropout_keep_dense(seed, b: int, h: int, sq: int, skv: int,
                        p_dropout: float, row0=0, col0=0) -> jnp.ndarray:
    """[B, H, Sq, Skv] keep-mask — the dense twin of :func:`_dropout_keep`
    (bit-identical by construction). ``row0``/``col0`` offset the global
    coordinates (ring attention uses this for per-block masks)."""
    bi = jnp.arange(b, dtype=jnp.uint32)[:, None, None, None]
    hi = jnp.arange(h, dtype=jnp.uint32)[None, :, None, None]
    r = (jnp.arange(sq, dtype=jnp.uint32)
         + jnp.uint32(row0))[None, None, :, None]
    c = (jnp.arange(skv, dtype=jnp.uint32)
         + jnp.uint32(col0))[None, None, None, :]
    base = (jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
            + bi * jnp.uint32(0x7FEB352D) + hi * jnp.uint32(0x846CA68B))
    x = _mix_bits(base + r * jnp.uint32(0x27D4EB2F) + c)
    thresh = jnp.uint32(min(int(p_dropout * 4294967296.0), 4294967295))
    return x >= thresh


def _tile_lanes(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Repeat a lane-replicated [rows, LANES] stat register out to
    ``width`` lanes (identity when width == LANES; falls back to the
    sub-lane broadcast when width doesn't tile evenly)."""
    if width == _LANES:
        return x
    if width % _LANES == 0:
        return jnp.tile(x, (1, width // _LANES))
    return x[:, :1]


def _fwd_kernel(qseg_ref, kseg_ref, seed_ref, q_ref, k_ref, v_ref,
                *out_and_scratch,
                causal, sm_scale, block_q, block_k, kv_len, mask_value,
                use_segments, save_residuals, p_dropout, block_k_inner=None):
    # l/m residuals are only materialised on the VJP path — the plain
    # forward call skips two [B,H,S,LANES] f32 HBM writes (they dominated
    # fwd-only time: 512 MB/call at the bench shape)
    if save_residuals:
        o_ref, l_ref, m_ref, m_scr, l_scr, acc_scr = out_and_scratch
    else:
        (o_ref, m_scr, l_scr, acc_scr) = out_and_scratch
        l_ref = m_ref = None
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # inner-K split (the official kernel's two-level K structure): the grid
    # step still DMAs one block_k-wide K/V block, but the MXU/VPU work runs
    # over statically-unrolled block_k_inner sub-tiles with the m/l/acc
    # carry in REGISTERS — scratch is read/written once per grid step and
    # Mosaic can overlap sub-tile t's softmax VPU work with t+1's matmul.
    bki = block_k_inner or block_k
    k_splits = block_k // bki

    def _run(apply_causal_mask):
        # feed native (bf16) operands to the MXU, accumulate f32 — casting
        # to f32 first would force 4-8x slower f32 MXU passes
        q = q_ref[0, 0]                              # [bq, d]
        qs = qseg_ref[0, 0] if use_segments else None

        m_prev = m_scr[...]                           # [bq, LANES]
        l_prev = l_scr[...]
        acc = acc_scr[...]
        for j in range(k_splits):
            k = k_ref[0, 0][j * bki:(j + 1) * bki]    # [bki, d] static slice
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if sm_scale != 1.0:
                s = s * sm_scale

            col0 = kv_idx * block_k + j * bki
            mask = None
            if apply_causal_mask:
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, bki), 0) + q_idx * block_q
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, bki), 1) + col0
                mask = col <= row
            if use_segments:
                ks = kseg_ref[0, 0][j * bki:(j + 1) * bki]   # [bki]
                seg = (qs[:, None] == ks[None, :]) & (qs[:, None] >= 0) \
                    & (ks[None, :] >= 0)
                mask = seg if mask is None else (mask & seg)
            if mask is not None:
                s = s + jnp.where(mask, 0.0, mask_value)

            m_curr = jnp.max(s, axis=1)[:, None]      # [bq, 1]
            m_next = jnp.maximum(m_prev, m_curr)      # broadcast [bq, LANES]
            alpha = jnp.exp(m_prev - m_next)
            # subtract a TILED lane-replicated m (full-register repeat)
            # instead of broadcasting the [bq, 1] sub-lane slice — Mosaic
            # lowers the 1-lane broadcast to a per-use lane splat, measured
            # slower than register tiling (official-kernel idiom)
            p = jnp.exp(s - _tile_lanes(m_next, bki))  # [bq, bki]
            # l (the lse residual) accumulates PRE-dropout probabilities —
            # dropout only gates the value accumulation (flash-attn v1 order)
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]

            if p_dropout > 0.0:
                keep = _dropout_keep(seed_ref[0], bi, hi, q_idx * block_q,
                                     col0, block_q, bki, p_dropout)
                p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - p_dropout))
            v = v_ref[0, 0][j * bki:(j + 1) * bki]    # [bki, d]
            acc = acc * _tile_lanes(alpha, acc.shape[1]) + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            m_prev, l_prev = m_next, l_next
        m_scr[...] = m_prev
        l_scr[...] = l_prev
        acc_scr[...] = acc

    if causal:
        # run only tiles touching/below the diagonal; pay the iota-mask VPU
        # work only on tiles the diagonal actually crosses (fully-below
        # tiles are unmasked — the official kernel's schedule)
        last_row = (q_idx + 1) * block_q - 1
        should_run = last_row >= (kv_idx * block_k)
        fully_below = ((kv_idx + 1) * block_k - 1) <= (q_idx * block_q)
        pl.when(should_run & fully_below)(lambda: _run(False))
        pl.when(should_run & ~fully_below)(lambda: _run(True))
    else:
        _run(False)

    @pl.when(kv_idx == (kv_len // block_k) - 1)
    def _store():
        l = l_scr[...]                                # [bq, LANES] replicated
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        # rows with no un-masked key ever (padding / empty segments) still
        # accumulate exp(mask_value - mask_value) = 1 terms; their running
        # max stays at mask_value — force their output to zero
        d_out = acc_scr.shape[1]
        # tile the f32 stat FIRST, compare after — Mosaic can't relayout
        # sub-32-bit (bool) vectors (same constraint as _p_from_stats)
        never_hit = _tile_lanes(m_scr[...], d_out) <= (0.5 * mask_value)
        o = jnp.where(never_hit, 0.0,
                      acc_scr[...] * _tile_lanes(l_inv, d_out))
        o_ref[0, 0] = o.astype(o_ref.dtype)
        if save_residuals:
            l_ref[0, 0] = jnp.where(never_hit, 0.0,
                                    l_scr[...]).astype(l_ref.dtype)
            m_ref[0, 0] = m_scr[...].astype(m_ref.dtype)


def _fwd_single_kernel(qseg_ref, kseg_ref, seed_ref, q_ref, k_ref, v_ref,
                       o_ref, l_ref=None, m_ref=None,
                       *, sm_scale, block_q, mask_value, use_segments,
                       save_residuals, p_dropout):
    """Whole-KV-in-one-block specialization: when the entire key sequence
    fits a single VMEM block there is nothing to accumulate across steps —
    the online-softmax m/l carry, the acc rescale and the scratch traffic
    all disappear (cf. the official pallas kernel's single-step variant).
    Measured +25% over the tiled path for non-causal S=2048 on v5e."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    skv = k.shape[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    if use_segments:
        qs = qseg_ref[0, 0]
        ks = kseg_ref[0, 0]
        seg = (qs[:, None] == ks[None, :]) & (qs[:, None] >= 0) \
            & (ks[None, :] >= 0)
        s = s + jnp.where(seg, 0.0, mask_value)
    m = jnp.max(s, axis=1, keepdims=True)          # [bq, 1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)          # pre-dropout normaliser
    never_hit = m <= (0.5 * mask_value)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    if p_dropout > 0.0:
        keep = _dropout_keep(seed_ref[0], pl.program_id(0), pl.program_id(1),
                             pl.program_id(2) * block_q, 0, block_q, skv,
                             p_dropout)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - p_dropout))
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = jnp.where(never_hit, 0.0, o / l_safe).astype(o_ref.dtype)
    if save_residuals:
        l_ref[0, 0] = jnp.broadcast_to(jnp.where(never_hit, 0.0, l),
                                       (block_q, _LANES)).astype(l_ref.dtype)
        m_ref[0, 0] = jnp.broadcast_to(m, (block_q, _LANES)).astype(m_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_q", "interpret", "save_residuals",
                     "p_dropout"))
def _fwd_single(q, k, v, q_seg, kv_seg, seed, *, sm_scale, block_q, interpret,
                save_residuals=True, p_dropout=0.0):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    block_q = min(block_q, sq)
    if sq % block_q:
        raise ValueError(
            f"sequence length {sq} must be divisible by block_q {block_q}")
    use_segments = q_seg is not None
    if q_seg is None:
        q_seg = jnp.zeros((b, sq), jnp.int32)
        kv_seg = jnp.zeros((b, skv), jnp.int32)
    q_seg3 = q_seg.reshape(b, 1, sq)
    kv_seg3 = kv_seg.reshape(b, 1, skv)
    kernel = functools.partial(
        _fwd_single_kernel, sm_scale=sm_scale, block_q=block_q,
        mask_value=DEFAULT_MASK_VALUE, use_segments=use_segments,
        save_residuals=save_residuals, p_dropout=p_dropout)
    lm_specs = [
        pl.BlockSpec((1, 1, block_q, _LANES), lambda bi, hi, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_q, _LANES), lambda bi, hi, qi: (bi, hi, qi, 0)),
    ]
    lm_shapes = [
        jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(b, h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, skv), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, skv, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ] + (lm_specs if save_residuals else []),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
        ] + (lm_shapes if save_residuals else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(q_seg3, kv_seg3, seed, q, k, v)
    if save_residuals:
        out, l, m = outs
        return out, l[..., 0], m[..., 0]
    return outs[0], None, None


# whole-KV single-step limit: s/p tiles are [block_q, Skv] f32 in VMEM
_SINGLE_STEP_MAX_KV = 4096


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret",
                     "save_residuals", "p_dropout", "block_k_inner"))
def _fwd(q, k, v, q_seg, kv_seg, seed, *, causal, sm_scale, block_q, block_k,
         interpret, save_residuals=True, p_dropout=0.0, block_k_inner=None):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    if sq % block_q or skv % block_k:
        raise ValueError(
            f"sequence lengths ({sq}, {skv}) must be divisible by block sizes "
            f"({block_q}, {block_k}) — pad with segment_id=-1")
    if block_k_inner and (block_k_inner > block_k
                          or block_k % block_k_inner):
        block_k_inner = None            # degenerate split → single tile
    grid = (b, h, sq // block_q, skv // block_k)
    use_segments = q_seg is not None
    if q_seg is None:
        q_seg = jnp.zeros((b, sq), jnp.int32)
        kv_seg = jnp.zeros((b, skv), jnp.int32)
    # [B, 1, S] so the block's trailing dims satisfy TPU tiling rules
    q_seg3 = q_seg.reshape(b, 1, sq)
    kv_seg3 = kv_seg.reshape(b, 1, skv)

    kernel = functools.partial(
        _fwd_kernel, causal=causal, sm_scale=sm_scale, block_q=block_q,
        block_k=block_k, kv_len=skv, mask_value=DEFAULT_MASK_VALUE,
        use_segments=use_segments, save_residuals=save_residuals,
        p_dropout=p_dropout, block_k_inner=block_k_inner)

    lm_specs = [
        pl.BlockSpec((1, 1, block_q, _LANES), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_q, _LANES), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
    ]
    lm_shapes = [
        jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32),
    ]
    if causal:
        # skipped above-diagonal grid steps would still DMA their K/V
        # blocks — clamp the index map to the diagonal block so Mosaic sees
        # the same block as the previous step and elides the fetch
        # (halves K/V HBM traffic; the compute skip alone doesn't)
        def ki_map(bi, hi, qi, ki):
            return jnp.minimum(ki, ((qi + 1) * block_q - 1) // block_k)
    else:
        def ki_map(bi, hi, qi, ki):
            return ki

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bi, hi, qi, ki: (bi, 0, ki_map(bi, hi, qi, ki))),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hi, qi, ki: (bi, hi, ki_map(bi, hi, qi, ki), 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hi, qi, ki: (bi, hi, ki_map(bi, hi, qi, ki), 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ] + (lm_specs if save_residuals else []),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
        ] + (lm_shapes if save_residuals else []),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(q_seg3, kv_seg3, seed, q, k, v)
    if save_residuals:
        out, l, m = outs
        return out, l[..., 0], m[..., 0]
    return outs[0], None, None


def _bwd_mask(s, causal, q_idx, kv_idx, block_q, block_k, use_segments,
              qseg, kseg, mask_value):
    mask = None
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
            + q_idx * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
            + kv_idx * block_k
        mask = col <= row
    if use_segments:
        seg = (qseg[:, None] == kseg[None, :]) & (qseg[:, None] >= 0) \
            & (kseg[None, :] >= 0)
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        s = s + jnp.where(mask, 0.0, mask_value)
    return s


def _p_from_stats(s, l, m):
    """Reconstruct softmax block from saved (l, m): p = exp(s - m) / l with
    never-hit rows (l == 0) forced to zero. Comparisons happen after the
    f32 [:, None] reshape — Mosaic can't reshape sub-32-bit (bool) vectors."""
    l2 = l[:, None]
    p = jnp.exp(s - m[:, None]) / jnp.where(l2 == 0.0, 1.0, l2)
    return jnp.where(l2 == 0.0, 0.0, p)


def _bwd_dkv_kernel(qseg_ref, kseg_ref, seed_ref, q_ref, do_ref, l_ref,
                    m_ref, di_ref, k_ref, v_ref, dk_ref, dv_ref,
                    dk_scr, dv_scr,
                    *, causal, sm_scale, block_q, block_k, q_len, mask_value,
                    use_segments, p_dropout):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if causal:
        should_run = ((q_idx + 1) * block_q - 1) >= (kv_idx * block_k)
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        s = _bwd_mask(s, causal, q_idx, kv_idx, block_q, block_k,
                      use_segments,
                      qseg_ref[0, 0] if use_segments else None,
                      kseg_ref[0, 0] if use_segments else None, mask_value)
        l = l_ref[0, 0, 0]
        m = m_ref[0, 0, 0]
        di = di_ref[0, 0, 0]
        p = _p_from_stats(s, l, m)                       # [bq, bk]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if p_dropout > 0.0:
            # identical mask to the fwd tile (same hash of global coords);
            # dv uses the DROPPED probabilities, dS gates dp through the
            # mask — di already equals Σₖ P_d·dp (it is do·o)
            keep = _dropout_keep(seed_ref[0], bi, hi, q_idx * block_q,
                                 kv_idx * block_k, block_q, block_k,
                                 p_dropout)
            inv = 1.0 / (1.0 - p_dropout)
            p_d = jnp.where(keep, p, 0.0) * inv
            dp = jnp.where(keep, dp, 0.0) * inv
        else:
            p_d = p
        ds = p * (dp - di[:, None]) * sm_scale
        pb = p_d.astype(q.dtype)
        dsb = ds.astype(q.dtype)
        dv_scr[...] += jax.lax.dot_general(
            pb, do.astype(q.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bk, d]
        dk_scr[...] += jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(q_idx == (q_len // block_q) - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(qseg_ref, kseg_ref, seed_ref, k_ref, v_ref, do_ref,
                   l_ref, m_ref, di_ref, q_ref, dq_ref, dq_scr,
                   *, causal, sm_scale, block_q, block_k, kv_len, mask_value,
                   use_segments, p_dropout):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    if causal:
        should_run = ((q_idx + 1) * block_q - 1) >= (kv_idx * block_k)
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        s = _bwd_mask(s, causal, q_idx, kv_idx, block_q, block_k,
                      use_segments,
                      qseg_ref[0, 0] if use_segments else None,
                      kseg_ref[0, 0] if use_segments else None, mask_value)
        l = l_ref[0, 0, 0]
        m = m_ref[0, 0, 0]
        di = di_ref[0, 0, 0]
        p = _p_from_stats(s, l, m)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if p_dropout > 0.0:
            keep = _dropout_keep(seed_ref[0], bi, hi, q_idx * block_q,
                                 kv_idx * block_k, block_q, block_k,
                                 p_dropout)
            dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - p_dropout))
        ds = (p * (dp - di[:, None]) * sm_scale).astype(q.dtype)
        dq_scr[...] += jax.lax.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == (kv_len // block_k) - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret",
                     "p_dropout"))
def _bwd_pallas(q, k, v, q_seg, kv_seg, seed, out, l, m, do, *, causal,
                sm_scale, block_q, block_k, interpret, p_dropout=0.0):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    use_segments = q_seg is not None
    if q_seg is None:
        q_seg = jnp.zeros((b, sq), jnp.int32)
        kv_seg = jnp.zeros((b, skv), jnp.int32)
    q_seg3 = q_seg.reshape(b, 1, sq)
    kv_seg3 = kv_seg.reshape(b, 1, skv)
    di = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    l4 = l.reshape(b, h, 1, sq)
    m4 = m.reshape(b, h, 1, sq)
    di4 = di.reshape(b, h, 1, sq)

    # --- dk/dv: iterate q tiles per kv tile -------------------------------
    # causal: q tiles strictly above the diagonal are compute-skipped; clamp
    # their index maps forward to the first contributing q block so Mosaic
    # elides the block fetches too (mirrors the fwd kernel's ki_map)
    if causal:
        def qi_map(bi, hi, ki, qi):
            return jnp.maximum(qi, (ki * block_k) // block_q)
    else:
        def qi_map(bi, hi, ki, qi):
            return qi

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, causal=causal, sm_scale=sm_scale, block_q=block_q,
        block_k=block_k, q_len=sq, mask_value=DEFAULT_MASK_VALUE,
        use_segments=use_segments, p_dropout=p_dropout)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, skv // block_k, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q),
                         lambda bi, hi, ki, qi: (bi, 0, qi_map(bi, hi, ki, qi))),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki, qi: (bi, 0, ki)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d),
                         lambda bi, hi, ki, qi: (bi, hi, qi_map(bi, hi, ki, qi), 0)),
            pl.BlockSpec((1, 1, block_q, d),
                         lambda bi, hi, ki, qi: (bi, hi, qi_map(bi, hi, ki, qi), 0)),
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda bi, hi, ki, qi: (bi, hi, 0, qi_map(bi, hi, ki, qi))),
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda bi, hi, ki, qi: (bi, hi, 0, qi_map(bi, hi, ki, qi))),
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda bi, hi, ki, qi: (bi, hi, 0, qi_map(bi, hi, ki, qi))),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(q_seg3, kv_seg3, seed, q, do, l4, m4, di4, k, v)

    # --- dq: iterate kv tiles per q tile ----------------------------------
    dq_kernel = functools.partial(
        _bwd_dq_kernel, causal=causal, sm_scale=sm_scale, block_q=block_q,
        block_k=block_k, kv_len=skv, mask_value=DEFAULT_MASK_VALUE,
        use_segments=use_segments, p_dropout=p_dropout)
    if causal:
        def dq_ki_map(bi, hi, qi, ki):
            return jnp.minimum(ki, ((qi + 1) * block_q - 1) // block_k)
    else:
        def dq_ki_map(bi, hi, qi, ki):
            return ki

    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, sq // block_q, skv // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bi, hi, qi, ki: (bi, 0, dq_ki_map(bi, hi, qi, ki))),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hi, qi, ki: (bi, hi, dq_ki_map(bi, hi, qi, ki), 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, hi, qi, ki: (bi, hi, dq_ki_map(bi, hi, qi, ki), 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(q_seg3, kv_seg3, seed, k, v, do, l4, m4, di4, q)
    return dq, dk, dv


def _attention_mask(sq, skv, q_seg, kv_seg, causal):
    mask = jnp.ones((q_seg.shape[0] if q_seg is not None else 1, sq, skv),
                    bool)
    if causal:
        row = jnp.arange(sq)[:, None]
        col = jnp.arange(skv)[None, :]
        mask = mask & (col <= row)[None]
    if q_seg is not None:
        seg = (q_seg[:, :, None] == kv_seg[:, None, :]) \
            & (q_seg[:, :, None] >= 0) & (kv_seg[:, None, :] >= 0)
        mask = mask & seg
    return mask


def reference_attention(q, k, v, *, causal=False, sm_scale=None,
                        q_segment_ids=None, kv_segment_ids=None,
                        p_dropout: float = 0.0, dropout_seed=0,
                        return_softmax: bool = False):
    """Exact attention (the py_ut_gpu einsum-softmax reference,
    test_flash_attention.py:41-69) — also the non-TPU fallback.

    ``p_dropout > 0`` applies the SAME counter-based keep-mask as the Pallas
    kernels (bit-identical given the same seed). ``return_softmax=True``
    additionally returns the post-dropout probabilities — the reference
    FMHAForward's ``return_sm`` debug output (O(S²) memory, like the
    reference's)."""
    b, h = q.shape[0], q.shape[1]
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / np.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    mask = _attention_mask(q.shape[2], k.shape[2], q_segment_ids,
                           kv_segment_ids, causal)
    s = jnp.where(mask[:, None, :, :], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    if p_dropout > 0.0:
        keep = _dropout_keep_dense(dropout_seed, b, h, q.shape[2],
                                   k.shape[2], p_dropout)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - p_dropout))
    # fully-masked rows (padding) → zero output
    any_valid = jnp.any(mask, axis=-1)[:, None, :, None]
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    out = jnp.where(any_valid, out, 0.0).astype(q.dtype)
    if return_softmax:
        return out, jnp.where(any_valid, p, 0.0)
    return out


def _fwd_dispatch(q, k, v, q_seg, kv_seg, seed, causal, sm_scale, block_q,
                  block_k, interpret, save_residuals, p_dropout=0.0,
                  block_k_inner=None):
    """Route to the single-step kernel when the whole KV sequence fits one
    VMEM block and there is no causal tile-skipping to exploit (causal
    measured FASTER tiled: skipping above-diagonal tiles outweighs the
    saved online-softmax VPU work)."""
    if not causal and k.shape[2] <= _SINGLE_STEP_MAX_KV:
        return _fwd_single(q, k, v, q_seg, kv_seg, seed, sm_scale=sm_scale,
                           block_q=block_q, interpret=interpret,
                           save_residuals=save_residuals,
                           p_dropout=p_dropout)
    return _fwd(q, k, v, q_seg, kv_seg, seed, causal=causal,
                sm_scale=sm_scale, block_q=block_q, block_k=block_k,
                interpret=interpret, save_residuals=save_residuals,
                p_dropout=p_dropout, block_k_inner=block_k_inner)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _flash(q, k, v, q_seg, kv_seg, seed, causal, sm_scale, block_q, block_k,
           interpret, p_dropout, block_k_inner=None):
    out, _, _ = _fwd_dispatch(q, k, v, q_seg, kv_seg, seed, causal, sm_scale,
                              block_q, block_k, interpret,
                              save_residuals=False, p_dropout=p_dropout,
                              block_k_inner=block_k_inner)
    return out


def _flash_fwd(q, k, v, q_seg, kv_seg, seed, causal, sm_scale, block_q,
               block_k, interpret, p_dropout, block_k_inner=None):
    out, l, m = _fwd_dispatch(q, k, v, q_seg, kv_seg, seed, causal, sm_scale,
                              block_q, block_k, interpret,
                              save_residuals=True, p_dropout=p_dropout,
                              block_k_inner=block_k_inner)
    return out, (q, k, v, q_seg, kv_seg, seed, out, l, m)


def _flash_bwd(causal, sm_scale, block_q, block_k, interpret, p_dropout,
               block_k_inner, res, do):
    """Standard flash backward from (o, l, m) residuals:
    p = exp(s−m)/l; di = Σ(do·o); ds = p∘(do·vᵀ − di); dq = ds·k; dk = dsᵀ·q;
    dv = p_dᵀ·do (cf. the reference backward consuming softmax_lse +
    rng_state — the dropout mask regenerates from the same seed).

    Runs the blockwise Pallas dkv/dq kernel pair on TPU (memory O(S) — the
    scores are never materialised); the dense XLA recompute below is the
    non-TPU fallback."""
    q, k, v, q_seg, kv_seg, seed, out, l, m = res
    if jax.default_backend() == "tpu" or interpret:
        dq, dk, dv = _bwd_pallas(q, k, v, q_seg, kv_seg, seed, out, l, m, do,
                                 causal=causal, sm_scale=sm_scale,
                                 block_q=block_q, block_k=block_k,
                                 interpret=interpret, p_dropout=p_dropout)
        return dq, dk, dv, None, None, None
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * sm_scale
    mask = _attention_mask(q.shape[2], k.shape[2], q_seg, kv_seg, causal)
    s = jnp.where(mask[:, None, :, :], s, DEFAULT_MASK_VALUE)
    l_safe = jnp.where(l == 0.0, 1.0, l)[..., None]
    p = jnp.exp(s - m[..., None]) / l_safe
    p = jnp.where(mask[:, None, :, :], p, 0.0)
    di = jnp.sum(dof * out.astype(jnp.float32), axis=-1, keepdims=True)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
    if p_dropout > 0.0:
        keep = _dropout_keep_dense(seed[0], q.shape[0], q.shape[1],
                                   q.shape[2], k.shape[2], p_dropout)
        inv = 1.0 / (1.0 - p_dropout)
        p_d = jnp.where(keep, p, 0.0) * inv
        dp = jnp.where(keep, dp, 0.0) * inv
    else:
        p_d = p
    ds = p * (dp - di)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * sm_scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * sm_scale
    dv = jnp.einsum("bhqk,bhqd->bhkd", p_d, dof)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None, None)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _seed_array(dropout_seed) -> jnp.ndarray:
    return jnp.asarray([dropout_seed] if np.ndim(dropout_seed) == 0
                       else dropout_seed, jnp.int32).reshape(1)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block(s: int, requested: int) -> int:
    """Largest multiple of 128 lanes that divides ``s`` (itself a multiple
    of 128), capped at ``requested`` — keeps big MXU tiles where the padded
    length allows them."""
    best = _LANES
    b = _LANES
    while b <= min(s, requested):
        if s % b == 0:
            best = b
        b += _LANES
    return best


def _pad_for_blocks(q, k, v, q_seg, kv_seg, block_q, block_k):
    """Pad arbitrary sequence lengths to lane multiples with segment −1
    (= padding: attends to nothing, is attended by nothing, outputs zeros)
    and re-pick block sizes that divide the padded lengths. The reference's
    cu_seqlens API takes arbitrary lengths (flash_attention_ops.cc:8-37);
    this is the TPU equivalent — callers never see a divisibility error.
    Returns (q, k, v, q_seg, kv_seg, block_q, block_k)."""
    b, _, sq, _ = q.shape
    skv = k.shape[2]
    sq_p = _round_up(sq, _LANES)
    skv_p = _round_up(skv, _LANES)
    if q_seg is None:
        q_seg = jnp.zeros((b, sq), jnp.int32)
        kv_seg = jnp.zeros((b, skv), jnp.int32)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    q_seg = jnp.pad(q_seg, ((0, 0), (0, sq_p - sq)), constant_values=-1)
    kv_seg = jnp.pad(kv_seg, ((0, 0), (0, skv_p - skv)), constant_values=-1)
    return (q, k, v, q_seg, kv_seg,
            _pick_block(sq_p, block_q), _pick_block(skv_p, block_k))


def _needs_padding(sq: int, skv: int, block_q: int, block_k: int) -> bool:
    return bool(sq % min(block_q, sq) or skv % min(block_k, skv))


def flash_attention(q, k, v, *, causal: bool = False,
                    sm_scale: Optional[float] = None,
                    q_segment_ids=None, kv_segment_ids=None,
                    block_q: int = 1024, block_k: int = 1024,
                    block_k_inner: Optional[int] = None,
                    p_dropout: float = 0.0, dropout_seed=0,
                    interpret: Optional[bool] = None):
    """Blockwise flash attention.

    q [B, H, Sq, D], k/v [B, H, Skv, D]; optional int32 segment ids
    [B, Sq] / [B, Skv] (−1 = padding). Arbitrary sequence lengths: inputs
    whose lengths don't divide the block sizes are padded internally with
    segment −1 and the output sliced back (the reference's cu_seqlens API
    likewise takes arbitrary lengths). Differentiable.

    ``p_dropout``/``dropout_seed`` mirror the reference FMHA contract
    (flash_attention_ops.cc:8-37 ``p_dropout``/``rng_state``): inverted
    dropout on the attention probabilities, identical masks in forward and
    backward (regenerated from the seed — pass a fresh seed per step).
    ``p_dropout=0`` is bit-identical to the no-dropout kernel.
    """
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("provide both or neither segment id array")
    if not (0.0 <= p_dropout < 1.0):
        raise ValueError(f"p_dropout must be in [0, 1), got {p_dropout}")
    if interpret is None:
        if jax.default_backend() != "tpu":
            # exact fallback keeps CPU tests fast; kernel is validated
            # separately in interpreter mode
            return reference_attention(
                q, k, v, causal=causal, sm_scale=sm_scale,
                q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
                p_dropout=p_dropout, dropout_seed=dropout_seed)
        interpret = False
    sq = q.shape[2]
    if _needs_padding(sq, k.shape[2], block_q, block_k):
        (q, k, v, q_segment_ids, kv_segment_ids,
         block_q, block_k) = _pad_for_blocks(
            q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k)
        out = _flash(q, k, v, q_segment_ids, kv_segment_ids,
                     _seed_array(dropout_seed), causal, sm_scale,
                     block_q, block_k, interpret, float(p_dropout),
                     block_k_inner)
        return out[:, :, :sq]
    return _flash(q, k, v, q_segment_ids, kv_segment_ids,
                  _seed_array(dropout_seed), causal, sm_scale,
                  block_q, block_k, interpret, float(p_dropout),
                  block_k_inner)


def flash_attention_with_lse(q, k, v, *, causal: bool = False,
                             sm_scale: Optional[float] = None,
                             q_segment_ids=None, kv_segment_ids=None,
                             block_q: int = 1024, block_k: int = 1024,
                             block_k_inner: Optional[int] = None,
                             p_dropout: float = 0.0, dropout_seed=0,
                             interpret: Optional[bool] = None):
    """Forward pass returning ``(out, softmax_lse)`` — the reference
    FMHAForward's ``softmax_lse`` output [B, H, Sq] consumed by downstream
    ops (flash_attention_ops.cc:8-37). lse is the PRE-dropout
    log-sum-exp of the masked scores; fully-masked (padding) rows get
    ``-inf``. Primal-only (use :func:`flash_attention` for gradients)."""
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("provide both or neither segment id array")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sq = q.shape[2]
    if _needs_padding(sq, k.shape[2], block_q, block_k):
        (q, k, v, q_segment_ids, kv_segment_ids,
         block_q, block_k) = _pad_for_blocks(
            q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k)
    out, l, m = _fwd_dispatch(q, k, v, q_segment_ids, kv_segment_ids,
                              _seed_array(dropout_seed), causal, sm_scale,
                              block_q, block_k, interpret,
                              save_residuals=True, p_dropout=float(p_dropout),
                              block_k_inner=block_k_inner)
    lse = jnp.where(l > 0.0, m + jnp.log(jnp.where(l > 0.0, l, 1.0)),
                    -jnp.inf)
    return out[:, :, :sq], lse[:, :, :sq]


def make_segment_ids_from_lengths(lengths, seq_len: int):
    """cu_seqlens equivalent: per-example valid length → segment ids
    (0 for the first ``length`` tokens, −1 padding). Mirrors the reference
    layer's mask→cu_seqlens packing (flash_attn_ops.py:128-160)."""
    pos = jnp.arange(seq_len)[None, :]
    return jnp.where(pos < lengths[:, None], 0, -1).astype(jnp.int32)
