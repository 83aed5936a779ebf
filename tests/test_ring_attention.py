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
