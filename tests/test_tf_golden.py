"""Cross-framework golden tests — the reference's canonical harness
(py_ut/tests/test_training_ops.py:60-547): the SAME gradient sequence is
applied to (a) stock TensorFlow optimizer kernels on a tf.Variable and
(b) a KvTable + this framework's fused sparse rule; trajectories must
match. The reference gates its own kernels the same way ("Group* with
l1=l2=l21=0 must equal the base optimizer", README.md:150-158) — here the
base side is TF's actual C++ kernels, not a numpy mirror."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from tfplus_tpu import kv, train as tft  # noqa: E402

N, DIM, STEPS = 6, 8, 5
LR = 0.01


def make_data(seed=0):
    rng = np.random.RandomState(seed)
    init = rng.randn(N, DIM).astype(np.float32) * 0.5
    grads = [rng.randn(N, DIM).astype(np.float32) for _ in range(STEPS)]
    return init, grads


def run_ours(opt, grads, init):
    t = kv.create(DIM, 256, seed=0)
    ids = kv.encode_ids_np_to_device(np.arange(1, N + 1, dtype=np.int64))
    t = kv.insert(t, ids, jnp.asarray(init))
    t = opt.init(t)
    for s, g in enumerate(grads, 1):
        res = kv.lookup_or_insert(t, ids)
        t = opt.apply(res.table, res.slot, jnp.asarray(g), lr=LR, step=s)
    return np.asarray(kv.lookup_or_zeros(t, ids))


def tf_ids():
    return tf.constant(np.arange(N, dtype=np.int64))


class TestStockTFKernels:
    def test_adagrad(self):
        init, grads = make_data()
        ours = run_ours(tft.AdagradOptimizer(), grads, init)
        var = tf.Variable(init)
        accum = tf.Variable(np.full((N, DIM), 0.1, np.float32))
        for g in grads:
            tf.raw_ops.ResourceSparseApplyAdagrad(
                var=var.handle, accum=accum.handle, lr=tf.constant(LR),
                grad=tf.constant(g), indices=tf_ids(), use_locking=False,
                update_slots=True)
        np.testing.assert_allclose(ours, var.numpy(), rtol=1e-5, atol=1e-6)

    def test_adam(self):
        """Lazy-Adam on rows all touched every step == dense TF Adam."""
        init, grads = make_data(1)
        ours = run_ours(tft.AdamOptimizer(), grads, init)
        b1, b2, eps = 0.9, 0.999, 1e-8
        var = tf.Variable(init)
        m = tf.Variable(np.zeros((N, DIM), np.float32))
        v = tf.Variable(np.zeros((N, DIM), np.float32))
        for t_i, g in enumerate(grads, 1):
            tf.raw_ops.ResourceApplyAdam(
                var=var.handle, m=m.handle, v=v.handle,
                beta1_power=tf.constant(b1 ** t_i),
                beta2_power=tf.constant(b2 ** t_i),
                lr=tf.constant(LR), beta1=tf.constant(b1),
                beta2=tf.constant(b2), epsilon=tf.constant(eps),
                grad=tf.constant(g), use_locking=False, use_nesterov=False)
        np.testing.assert_allclose(ours, var.numpy(), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("l1,l2", [(0.0, 0.0), (0.002, 0.001)])
    def test_ftrl(self, l1, l2):
        """SparseGroupFtrl(l21=0) == stock TF FTRL incl. l1/l2."""
        init, grads = make_data(2)
        ours = run_ours(tft.SparseGroupFtrlOptimizer(
            l1_regularization_strength=l1, l2_regularization_strength=l2),
            grads, init)
        var = tf.Variable(init)
        accum = tf.Variable(np.full((N, DIM), 0.1, np.float32))
        linear = tf.Variable(np.zeros((N, DIM), np.float32))
        for g in grads:
            tf.raw_ops.ResourceSparseApplyFtrl(
                var=var.handle, accum=accum.handle, linear=linear.handle,
                grad=tf.constant(g), indices=tf_ids(),
                lr=tf.constant(LR), l1=tf.constant(l1), l2=tf.constant(l2),
                lr_power=tf.constant(-0.5), use_locking=False)
        np.testing.assert_allclose(ours, var.numpy(), rtol=1e-4, atol=1e-6)

    def test_gradient_descent(self):
        init, grads = make_data(3)
        ours = run_ours(tft.GradientDescentOptimizer(), grads, init)
        var = init.copy()
        for g in grads:
            var -= LR * g
        np.testing.assert_allclose(ours, var, rtol=1e-6)

    def test_adadelta(self):
        """The reference's group reformulation (COMPUTE_ADADELTA,
        training_ops.cc:2193-2198: var rebuilt from the linear accumulator;
        eps enters the denominator but not the sqrt-delta term) drifts from
        stock TF Adadelta by O(eps)-level reassociation — tolerance reflects
        that inherent difference, not an implementation bug."""
        init, grads = make_data(4)
        ours = run_ours(tft.AdadeltaOptimizer(learning_rate=LR), grads, init)
        var = tf.Variable(init)
        accum = tf.Variable(np.zeros((N, DIM), np.float32))
        accum_update = tf.Variable(np.zeros((N, DIM), np.float32))
        for g in grads:
            tf.raw_ops.ResourceSparseApplyAdadelta(
                var=var.handle, accum=accum.handle,
                accum_update=accum_update.handle, lr=tf.constant(LR),
                rho=tf.constant(0.95), epsilon=tf.constant(1e-8),
                grad=tf.constant(g), indices=tf_ids(), use_locking=False)
        np.testing.assert_allclose(ours, var.numpy(), rtol=5e-4, atol=1e-5)

    def test_momentum(self):
        init, grads = make_data(5)
        ours = run_ours(tft.MomentumOptimizer(momentum=0.9), grads, init)
        var = tf.Variable(init)
        mom = tf.Variable(np.zeros((N, DIM), np.float32))
        for g in grads:
            tf.raw_ops.ResourceSparseApplyMomentum(
                var=var.handle, accum=mom.handle, lr=tf.constant(LR),
                grad=tf.constant(g), indices=tf_ids(),
                momentum=tf.constant(0.9), use_locking=False,
                use_nesterov=False)
        np.testing.assert_allclose(ours, var.numpy(), rtol=1e-4, atol=1e-6)


class TestRealTFPartitioner:
    def test_verbatim_tf_fixed_size_partitioner(self):
        """The documented verbatim port: a REAL tf.compat.v1
        fixed_size_partitioner closure recovers its shard count."""
        import tfplus_tpu
        part = tf.compat.v1.fixed_size_partitioner(5)
        shards = tfplus_tpu.get_kv_variable(
            "tfpart_emb", 8, capacity=256, partitioner=part)
        assert isinstance(shards, list) and len(shards) == 5
