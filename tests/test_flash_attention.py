"""Flash attention tests — mirrors py_ut_gpu/test_flash_attention.py
(flash vs exact einsum-softmax attention within 1e-3) plus segment/varlen,
causal, and gradient checks. The Pallas kernel itself runs in interpreter
mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfplus_tpu.ops import flash_attention as fa


def make_qkv(b=2, h=2, sq=256, skv=256, d=64, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, sq, d).astype(np.float32), dtype=dtype)
    k = jnp.asarray(rng.randn(b, h, skv, d).astype(np.float32), dtype=dtype)
    v = jnp.asarray(rng.randn(b, h, skv, d).astype(np.float32), dtype=dtype)
    return q, k, v


class TestKernelInterpret:
    """Validate the actual Pallas kernel (interpret mode) vs exact attention."""

    def test_basic(self):
        q, k, v = make_qkv()
        out = fa.flash_attention(q, k, v, interpret=True)
        ref = fa.reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_causal(self):
        q, k, v = make_qkv(sq=256, skv=256)
        out = fa.flash_attention(q, k, v, causal=True, interpret=True)
        ref = fa.reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_segments_varlen(self):
        q, k, v = make_qkv(b=2, sq=256, skv=256)
        seg = np.zeros((2, 256), np.int32)
        seg[0, :100] = 0
        seg[0, 100:200] = 1
        seg[0, 200:] = -1          # padding
        seg[1, :256] = 0
        seg = jnp.asarray(seg)
        out = fa.flash_attention(q, k, v, q_segment_ids=seg,
                                 kv_segment_ids=seg, interpret=True)
        ref = fa.reference_attention(q, k, v, q_segment_ids=seg,
                                     kv_segment_ids=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)
        # padded positions produce zeros
        np.testing.assert_allclose(np.asarray(out)[0, :, 200:, :], 0.0,
                                   atol=1e-5)

    def test_causal_plus_segments(self):
        q, k, v = make_qkv(b=1, sq=256, skv=256)
        seg = jnp.asarray(np.repeat([[0, 1]], 128, axis=1).reshape(1, 256))
        out = fa.flash_attention(q, k, v, causal=True, q_segment_ids=seg,
                                 kv_segment_ids=seg, interpret=True)
        ref = fa.reference_attention(q, k, v, causal=True, q_segment_ids=seg,
                                     kv_segment_ids=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_bf16(self):
        q, k, v = make_qkv(dtype=jnp.bfloat16)
        out = fa.flash_attention(q, k, v, interpret=True)
        ref = fa.reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_rectangular(self):
        q, k, v = make_qkv(sq=128, skv=384)
        out = fa.flash_attention(q, k, v, interpret=True)
        ref = fa.reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)


class TestInnerKSplit:
    """The two-level K structure (``block_k_inner``): one block_k-wide DMA
    per grid step, statically-unrolled MXU/VPU sub-tiles with the online-
    softmax carry in registers. Must be bit-compatible with the reference
    math for every mask/dropout combination."""

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("p_dropout", [0.0, 0.25])
    def test_matches_reference(self, causal, p_dropout):
        q, k, v = make_qkv(b=1, h=2, sq=256, skv=256, d=64)
        rng = np.random.RandomState(3)
        seg = jnp.asarray(rng.randint(0, 3, (1, 256)), jnp.int32)
        out = fa.flash_attention(q, k, v, causal=causal, p_dropout=p_dropout,
                                 dropout_seed=11, q_segment_ids=seg,
                                 kv_segment_ids=seg, block_q=128, block_k=128,
                                 block_k_inner=64 if causal else 128,
                                 interpret=True)
        ref = fa.reference_attention(q, k, v, causal=causal,
                                     p_dropout=p_dropout, dropout_seed=11,
                                     q_segment_ids=seg, kv_segment_ids=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_grads_match_base_kernel(self):
        q, k, v = make_qkv(b=1, h=1, sq=256, skv=256, d=32)

        def loss(inner):
            def f(a, b, c):
                o = fa.flash_attention(a, b, c, causal=True, block_q=128,
                                       block_k=128, block_k_inner=inner,
                                       interpret=True)
                return jnp.sum(o ** 2)
            return f

        g0 = jax.grad(loss(None), argnums=(0, 1, 2))(q, k, v)
        g1 = jax.grad(loss(64), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=2e-5)

    def test_degenerate_split_falls_back(self):
        # block_k_inner that doesn't divide block_k → single-tile behavior
        q, k, v = make_qkv(b=1, h=1, sq=256, skv=256, d=32)
        out = fa.flash_attention(q, k, v, causal=True, block_q=128,
                                 block_k=128, block_k_inner=96,
                                 interpret=True)
        ref = fa.reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)


class TestArbitraryLengths:
    """Sequence lengths that do NOT divide the block sizes are auto-padded
    with segment −1 inside flash_attention (the reference's cu_seqlens API
    takes arbitrary lengths — VERDICT r4 item 5)."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_s1000(self, causal):
        q, k, v = make_qkv(b=1, h=2, sq=1000, skv=1000, d=64)
        out = fa.flash_attention(q, k, v, causal=causal, interpret=True)
        assert out.shape == q.shape
        ref = fa.reference_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_rectangular_odd(self):
        q, k, v = make_qkv(b=1, h=1, sq=333, skv=712, d=32)
        out = fa.flash_attention(q, k, v, interpret=True)
        assert out.shape == q.shape
        ref = fa.reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_odd_length_with_segments(self):
        q, k, v = make_qkv(b=2, sq=300, skv=300)
        seg = np.zeros((2, 300), np.int32)
        seg[:, 150:] = 1
        seg[0, 280:] = -1          # caller padding mixes with auto padding
        seg = jnp.asarray(seg)
        out = fa.flash_attention(q, k, v, q_segment_ids=seg,
                                 kv_segment_ids=seg, interpret=True)
        ref = fa.reference_attention(q, k, v, q_segment_ids=seg,
                                     kv_segment_ids=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_grads_s1000(self):
        q, k, v = make_qkv(b=1, h=1, sq=1000, skv=1000, d=32)

        def loss_flash(q, k, v):
            o = fa.flash_attention(q, k, v, causal=True, interpret=True)
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            o = fa.reference_attention(q, k, v, causal=True)
            return jnp.sum(o * o)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=2e-3,
                                       err_msg=f"d{name}")

    def test_lse_odd_length(self):
        q, k, v = make_qkv(b=1, h=1, sq=200, skv=200, d=32)
        out, lse = fa.flash_attention_with_lse(q, k, v, interpret=True)
        assert out.shape == q.shape and lse.shape == (1, 1, 200)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(32)
        ref_lse = jax.scipy.special.logsumexp(s, axis=-1)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                                   atol=1e-3, rtol=1e-3)

    def test_dropout_odd_length_fwd_matches_dense(self):
        q, k, v = make_qkv(b=1, h=1, sq=200, skv=200, d=32)
        out = fa.flash_attention(q, k, v, p_dropout=0.3, dropout_seed=7,
                                 interpret=True)
        ref = fa.reference_attention(q, k, v, p_dropout=0.3, dropout_seed=7)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)


class TestGradients:
    def test_grads_match_exact_attention(self):
        q, k, v = make_qkv(b=1, h=1, sq=128, skv=128, d=32)

        def loss_flash(q, k, v):
            o = fa.flash_attention(q, k, v, causal=True, interpret=True)
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            o = fa.reference_attention(q, k, v, causal=True)
            return jnp.sum(o * o)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=2e-3,
                                       err_msg=f"d{name}")

    def test_grads_with_segments(self):
        q, k, v = make_qkv(b=1, h=1, sq=128, skv=128, d=32)
        seg = np.zeros((1, 128), np.int32)
        seg[0, 64:] = -1
        seg = jnp.asarray(seg)

        def loss_flash(q):
            o = fa.flash_attention(q, k, v, q_segment_ids=seg,
                                   kv_segment_ids=seg, interpret=True)
            return jnp.sum(o)

        def loss_ref(q):
            o = fa.reference_attention(q, k, v, q_segment_ids=seg,
                                       kv_segment_ids=seg)
            return jnp.sum(o)

        np.testing.assert_allclose(np.asarray(jax.grad(loss_flash)(q)),
                                   np.asarray(jax.grad(loss_ref)(q)),
                                   atol=2e-3, rtol=2e-3)


class TestHelpers:
    def test_segment_ids_from_lengths(self):
        seg = fa.make_segment_ids_from_lengths(jnp.array([3, 5]), 6)
        np.testing.assert_array_equal(
            np.asarray(seg), [[0, 0, 0, -1, -1, -1], [0, 0, 0, 0, 0, -1]])

    def test_fallback_on_cpu_matches(self):
        # default (no interpret flag) on CPU routes to exact attention
        q, k, v = make_qkv(sq=128, skv=128)
        out = fa.flash_attention(q, k, v)
        ref = fa.reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestLayer:
    def test_layer_with_mask(self):
        from tfplus_tpu.nn.attention import flash_attention_layer
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 128, 2, 32).astype(np.float32))
        mask = np.ones((2, 128), np.int32)
        mask[0, 100:] = 0
        out = flash_attention_layer(q, q, q, attention_mask=jnp.asarray(mask))
        assert out.shape == (2, 128, 2, 32)
        np.testing.assert_allclose(np.asarray(out)[0, 100:], 0.0, atol=1e-5)

    def test_layer_with_lengths_matches_mask(self):
        from tfplus_tpu.nn.attention import flash_attention_layer
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(2, 128, 2, 32).astype(np.float32))
        mask = np.ones((2, 128), np.int32)
        mask[0, 64:] = 0
        a = flash_attention_layer(q, q, q, attention_mask=jnp.asarray(mask))
        b = flash_attention_layer(q, q, q, lengths=jnp.array([64, 128]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestDropout:
    """Attention dropout — reference FMHA p_dropout/rng_state contract
    (flash_attention_ops.cc:8-37). The keep-mask is a counter-based hash
    of (seed, b, h, row, col), so the Pallas kernel, its backward, and the
    dense fallback regenerate IDENTICAL masks from the same seed."""

    def test_zero_dropout_identical_to_base(self):
        q, k, v = make_qkv()
        base = fa.flash_attention(q, k, v, interpret=True)
        z = fa.flash_attention(q, k, v, p_dropout=0.0, dropout_seed=7,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(z))

    def test_kernel_matches_dense_same_seed(self):
        """Tiled kernel (causal forces tiling) vs dense fallback: same seed
        -> same mask -> same output (within online-softmax roundoff)."""
        q, k, v = make_qkv(sq=256, skv=256)
        out = fa.flash_attention(q, k, v, causal=True, p_dropout=0.3,
                                 dropout_seed=123, interpret=True)
        ref = fa.reference_attention(q, k, v, causal=True, p_dropout=0.3,
                                     dropout_seed=123)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    def test_single_step_kernel_matches_dense(self):
        q, k, v = make_qkv(sq=128, skv=256)
        out = fa.flash_attention(q, k, v, p_dropout=0.25, dropout_seed=9,
                                 interpret=True)
        ref = fa.reference_attention(q, k, v, p_dropout=0.25, dropout_seed=9)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    def test_different_seeds_differ(self):
        q, k, v = make_qkv(sq=128, skv=128)
        a = fa.flash_attention(q, k, v, p_dropout=0.3, dropout_seed=1,
                               interpret=True)
        b = fa.flash_attention(q, k, v, p_dropout=0.3, dropout_seed=2,
                               interpret=True)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4

    def test_keep_fraction(self):
        keep = fa._dropout_keep_dense(42, 2, 2, 256, 256, 0.3)
        frac = float(np.asarray(keep).mean())
        assert abs(frac - 0.7) < 0.01

    def test_expectation_preserved(self):
        """Inverted dropout: E[out] ≈ no-dropout out (averaged over seeds)."""
        q, k, v = make_qkv(b=1, h=1, sq=128, skv=128)
        base = np.asarray(fa.reference_attention(q, k, v))
        acc = np.zeros_like(base, np.float64)
        n = 24
        for s in range(n):
            acc += np.asarray(fa.reference_attention(
                q, k, v, p_dropout=0.3, dropout_seed=s * 1013 + 5))
        np.testing.assert_allclose(acc / n, base, atol=0.25)

    def test_grads_match_dense_same_mask(self):
        """Pallas backward regenerates the forward's mask: grads must match
        autodiff through the dense implementation with the same seed."""
        q, k, v = make_qkv(b=1, h=2, sq=128, skv=128, d=32)
        seed = 77

        def loss_kernel(q, k, v):
            o = fa.flash_attention(q, k, v, causal=True, p_dropout=0.2,
                                   dropout_seed=seed, interpret=True)
            return jnp.sum(o * o)

        def loss_dense(q, k, v):
            o = fa.reference_attention(q, k, v, causal=True, p_dropout=0.2,
                                       dropout_seed=seed)
            return jnp.sum(o * o)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gk, gd, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"d{name}")

    def test_grads_with_segments_and_dropout(self):
        q, k, v = make_qkv(b=1, h=1, sq=128, skv=128, d=32)
        seg = np.zeros((1, 128), np.int32)
        seg[0, 100:] = -1
        seg = jnp.asarray(seg)
        seed = 5

        def loss_kernel(q, k, v):
            o = fa.flash_attention(q, k, v, q_segment_ids=seg,
                                   kv_segment_ids=seg, p_dropout=0.2,
                                   dropout_seed=seed, block_q=128,
                                   block_k=128, interpret=True)
            return jnp.sum(o * o)

        def loss_dense(q, k, v):
            o = fa.reference_attention(q, k, v, q_segment_ids=seg,
                                       kv_segment_ids=seg, p_dropout=0.2,
                                       dropout_seed=seed)
            return jnp.sum(o * o)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gk, gd, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"d{name}")


class TestLseAndSoftmaxReturn:
    def test_lse_matches_dense_logsumexp(self):
        q, k, v = make_qkv(sq=256, skv=256)
        sm = 1.0 / np.sqrt(q.shape[-1])
        out, lse = fa.flash_attention_with_lse(q, k, v, interpret=True)
        s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q, np.float32),
                      np.asarray(k, np.float32)) * sm
        want = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) \
            + s.max(-1)
        np.testing.assert_allclose(np.asarray(lse), want, atol=1e-3,
                                   rtol=1e-3)
        ref = fa.reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_lse_padding_rows_are_neg_inf(self):
        q, k, v = make_qkv(b=1, sq=256, skv=256)
        seg = np.zeros((1, 256), np.int32)
        seg[0, 200:] = -1
        seg = jnp.asarray(seg)
        _, lse = fa.flash_attention_with_lse(q, k, v, q_segment_ids=seg,
                                             kv_segment_ids=seg,
                                             interpret=True)
        assert np.all(np.isneginf(np.asarray(lse)[0, :, 200:]))
        assert np.all(np.isfinite(np.asarray(lse)[0, :, :200]))

    def test_return_softmax_probs(self):
        """reference FMHAForward return_sm: post-dropout probabilities."""
        q, k, v = make_qkv(b=1, h=1, sq=128, skv=128)
        out, p = fa.reference_attention(q, k, v, p_dropout=0.4,
                                        dropout_seed=3, return_softmax=True)
        p = np.asarray(p)
        keep = np.asarray(fa._dropout_keep_dense(3, 1, 1, 128, 128, 0.4))
        assert (p[~keep] == 0).all()
        # kept probs are softmax/(1-p): rows sum to ~kept_mass/(1-p)
        np.testing.assert_allclose(
            np.asarray(out),
            np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v, np.float32)),
            atol=1e-5)
