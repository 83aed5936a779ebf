"""Ring / context-parallel attention on the 8-device mesh vs exact
single-device attention — forward and gradients."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tfplus_tpu import parallel as par
from tfplus_tpu.parallel import ring_attention as ra
from tfplus_tpu.ops import flash_attention as fa

NDEV = 8
B, H, S, D = 2, 2, 8 * 32, 16


@pytest.fixture(scope="module")
def mesh():
    return par.make_mesh(NDEV, axis_name="sp")


def make_qkv(seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    return mk(), mk(), mk()


class TestRingAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_exact(self, mesh, causal):
        q, k, v = make_qkv()

        fn = functools.partial(ra.ring_attention, axis_name="sp",
                               causal=causal)
        out = jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(P(None, None, "sp", None),) * 3,
            out_specs=P(None, None, "sp", None), check_vma=False))(q, k, v)
        ref = fa.reference_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_gradients_match_exact(self, mesh):
        q, k, v = make_qkv(1)

        def ring_loss(q, k, v):
            fn = functools.partial(ra.ring_attention, axis_name="sp",
                                   causal=True)
            out = shard_map(fn, mesh=mesh,
                            in_specs=(P(None, None, "sp", None),) * 3,
                            out_specs=P(None, None, "sp", None),
                            check_vma=False)(q, k, v)
            return jnp.sum(out ** 2)

        def ref_loss(q, k, v):
            return jnp.sum(fa.reference_attention(q, k, v, causal=True) ** 2)

        g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_ring, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-4,
                                       err_msg=f"d{name}")


class TestContextParallel:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_exact(self, mesh, causal):
        q, k, v = make_qkv(2)

        fn = functools.partial(ra.context_parallel_attention, axis_name="sp",
                               causal=causal)
        out = jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P(None, None, "sp", None),
                      P(None, None, "sp", None)),
            out_specs=P(), check_vma=False))(q, k, v)
        ref = fa.reference_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


class TestRingDropout:
    """Ring attention dropout uses the flash kernel's global-coordinate
    hash masks: an 8-way ring-sharded run must drop EXACTLY the entries
    the single-device dense path drops for the same seed."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_dense_same_seed(self, mesh, causal):
        q, k, v = make_qkv(2)
        fn = functools.partial(ra.ring_attention, axis_name="sp",
                               causal=causal, p_dropout=0.3, dropout_seed=42)
        out = jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(P(None, None, "sp", None),) * 3,
            out_specs=P(None, None, "sp", None), check_vma=False))(q, k, v)
        ref = fa.reference_attention(q, k, v, causal=causal, p_dropout=0.3,
                                     dropout_seed=42)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    def test_context_parallel_matches_dense(self, mesh):
        q, k, v = make_qkv(2)
        fn = functools.partial(ra.context_parallel_attention, axis_name="sp",
                               p_dropout=0.25, dropout_seed=9)
        out = jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P(None, None, "sp", None),
                      P(None, None, "sp", None)),
            out_specs=P(), check_vma=False))(q, k, v)
        ref = fa.reference_attention(q, k, v, p_dropout=0.25, dropout_seed=9)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    def test_zero_dropout_unchanged(self, mesh):
        q, k, v = make_qkv(2)
        base = functools.partial(ra.ring_attention, axis_name="sp")
        zero = functools.partial(ra.ring_attention, axis_name="sp",
                                 p_dropout=0.0, dropout_seed=5)
        specs = dict(mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
                     out_specs=P(None, None, "sp", None), check_vma=False)
        a = jax.jit(shard_map(base, **specs))(q, k, v)
        b = jax.jit(shard_map(zero, **specs))(q, k, v)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRingFlash:
    """Ring attention with Pallas flash local blocks (O(S_local) memory):
    must match exact attention on the 8-way ring — the kernel runs in
    interpret mode on CPU."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_exact(self, mesh, causal):
        q, k, v = make_qkv(3)
        fn = functools.partial(ra.ring_flash_attention, axis_name="sp",
                               causal=causal, block_q=32, block_k=32,
                               interpret=True)
        out = jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(P(None, None, "sp", None),) * 3,
            out_specs=P(None, None, "sp", None), check_vma=False))(q, k, v)
        ref = fa.reference_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    def test_dropout_runs_and_differs(self, mesh):
        q, k, v = make_qkv(3)
        specs = dict(mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
                     out_specs=P(None, None, "sp", None), check_vma=False)
        base = jax.jit(shard_map(functools.partial(
            ra.ring_flash_attention, axis_name="sp", block_q=32, block_k=32,
            interpret=True), **specs))(q, k, v)
        drop = jax.jit(shard_map(functools.partial(
            ra.ring_flash_attention, axis_name="sp", p_dropout=0.3,
            dropout_seed=11, block_q=32, block_k=32,
            interpret=True), **specs))(q, k, v)
        assert np.isfinite(np.asarray(drop)).all()
        assert np.abs(np.asarray(drop) - np.asarray(base)).max() > 1e-4
        # inverted dropout keeps the output scale (loose expectation check)
        assert (np.abs(np.asarray(drop)).mean()
                < 3 * np.abs(np.asarray(base)).mean() + 1e-3)


class TestRingFlashGradients:
    """ring_flash_attention's custom VJP (flash backward kernels per ring
    block, global (l,m) stats, dk/dv riding the rotating buffers home)
    must match autodiff through an equivalent dense implementation."""

    def _ring_fn(self, causal, p_dropout=0.0, seed=0):
        return functools.partial(
            ra.ring_flash_attention, axis_name="sp", causal=causal,
            p_dropout=p_dropout, dropout_seed=seed,
            block_q=32, block_k=32, interpret=True)

    def _sharded_grads(self, mesh, fn, q, k, v):
        specs = dict(mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
                     out_specs=P(None, None, "sp", None), check_vma=False)

        def loss(q, k, v):
            o = shard_map(fn, **specs)(q, k, v)
            return jnp.sum(o * o)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_dense(self, mesh, causal):
        q, k, v = make_qkv(5)
        gk = self._sharded_grads(mesh, self._ring_fn(causal), q, k, v)

        def dense_loss(q, k, v):
            o = fa.reference_attention(q, k, v, causal=causal)
            return jnp.sum(o * o)

        gd = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gk, gd, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"d{name}")

    def test_grads_with_dropout_match_dense_replica(self, mesh):
        """Dense replica applies EXACTLY the ring's per-(shard,step) block
        masks; gradients must agree — proving the backward replays the
        forward's masks."""
        q, k, v = make_qkv(6)
        seed, p_drop = 21, 0.25
        n = NDEV
        sq_l = S // n
        sm = 1.0 / np.sqrt(D)

        def dense_loss(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm
            p = jax.nn.softmax(s, axis=-1)
            keep = jnp.zeros((B, H, S, S), bool)
            for my in range(n):
                for step in range(n):
                    src = (my - step) % n
                    blk_seed = seed + src * 0x9E3D + step
                    kb = fa._dropout_keep_dense(blk_seed, B, H, sq_l, sq_l,
                                                p_drop)
                    keep = keep.at[:, :, my * sq_l:(my + 1) * sq_l,
                                   src * sq_l:(src + 1) * sq_l].set(kb)
            p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - p_drop))
            o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
            return jnp.sum(o * o)

        gk = self._sharded_grads(
            mesh, self._ring_fn(False, p_drop, seed), q, k, v)
        gd = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gk, gd, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"d{name}")
