"""Model-level cross-framework parity for the GROUP-LASSO optimizers.

The reference's published quality table (example/dcn/README.md:54-84) is
mostly GroupAdam/GroupAdagrad rows; test_model_parity_tf.py pins the
Adam/Adagrad columns, this file pins the group-lasso ones: the SAME DCN,
SAME initial weights, SAME batch stream, trained here with
``GroupAdamOptimizer`` (V4, λ>0) / ``SparseGroupFtrlOptimizer`` on the
sparse tables — versus stock TF where the embedding variables are updated
by an independent per-row oracle implementing the reference kernel math
(GroupSparseApplyAdamV4, training_ops.cc:7156-7196; SparseGroupFtrl
COMPUTE_FTRL :713-752) and the dense towers by stock
``tf.compat.v1.train.AdamOptimizer``. Both sides must produce the same
per-step losses, final tables, eval scores/AUC AND the same blacklist set
(rows zeroed by the l21 group shrink — the semantics that distinguish
this family: blacklisted rows read as zeros and may re-activate when
their ``linear`` accumulator climbs back over the threshold).

Every batch covers the full vocabulary so lazy touched-row updates here
coincide with the oracle's all-rows pass (the same trick the reference's
own kernel tests use, py_ut/tests/test_training_ops.py).
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from tfplus_tpu import kv, train as tft  # noqa: E402
from tfplus_tpu.kv import table as kvt  # noqa: E402
from tfplus_tpu.models import DCN, TrainState, make_train_step  # noqa: E402
from tfplus_tpu.optim import dense as odense, rules as orl  # noqa: E402

from tests.test_model_parity_tf import (  # noqa: E402
    B, D, F, INPUT, NUMERIC, STEPS, V, auc_of, gen_batches, gen_weights,
    planted_truth)

DENSE_LR = 3e-3      # dense towers: plain Adam both sides


# -- per-row oracles of the reference kernel math ---------------------------

class GroupAdamV4Oracle:
    """training_ops.cc:7156-7196: l1/l2/l21 pre-scaled by lr, lazy-Adam
    momentum folded into an FTRL-style ``linear``, closed-form group-lasso
    solve, MarkBlacklist (row reads as zeros) when the shrunk norm falls
    under l21·√dim."""

    def __init__(self, var, lr, beta1=0.9, beta2=0.999, epsilon=1e-8,
                 l1=0.0, l2=0.0, l21=0.0):
        self.var = np.array(var, np.float32)
        self.m = np.zeros_like(self.var)
        self.v = np.zeros_like(self.var)
        self.linear = np.zeros_like(self.var)
        self.black = np.zeros(self.var.shape[0], bool)
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, epsilon
        self.l1, self.l2, self.l21 = l1 * lr, l2 * lr, l21 * lr
        self.t = 0

    def apply(self, grad):
        self.t += 1
        b1p, b2p = self.b1 ** self.t, self.b2 ** self.t
        alpha = self.lr * np.sqrt(1.0 - b2p) / (1.0 - b1p)
        self.m = self.b1 * self.m + (1.0 - self.b1) * grad
        new_v = self.b2 * self.v + (1.0 - self.b2) * grad * grad
        nvs = np.sqrt(new_v)
        if self.b1 > b1p:                       # not the first step
            self.linear += alpha * self.m - (nvs - np.sqrt(self.v)) * self.var
        else:
            self.linear += alpha * self.m - (nvs + self.eps) * self.var
        self.v = new_v
        self._solve(nvs + self.eps)
        return self.var

    def _solve(self, y):
        adj = np.clip(self.linear, -self.l1, self.l1)
        l1_linear = adj - self.linear
        nrm = np.sqrt((l1_linear * l1_linear).sum(axis=1))
        l21n = self.l21 * np.sqrt(np.float32(self.var.shape[1]))
        keep = nrm > l21n
        scale = 1.0 - l21n / np.maximum(nrm, 1e-30)
        new = l1_linear * scale[:, None] / (y + 2.0 * self.l2)
        self.var = np.where(keep[:, None], new, 0.0).astype(np.float32)
        self.black = ~keep


class GroupFtrlOracle:
    """training_ops.cc COMPUTE_FTRL :713-752 (lr_power=-0.5 — the
    reference README's 'GroupAdagrad'); l1/l2/l21 NOT lr-scaled."""

    def __init__(self, var, lr, initial_accumulator_value=0.1,
                 l1=0.0, l2=0.0, l21=0.0):
        self.var = np.array(var, np.float32)
        self.accum = np.full_like(self.var, initial_accumulator_value)
        self.linear = np.zeros_like(self.var)
        self.black = np.zeros(self.var.shape[0], bool)
        self.lr, self.l1, self.l2, self.l21 = lr, l1, l2, l21

    def apply(self, grad):
        new_accum = self.accum + grad * grad
        self.linear += grad - (np.sqrt(new_accum) - np.sqrt(self.accum)) \
            / self.lr * self.var
        y = np.sqrt(new_accum) / self.lr
        self.accum = new_accum
        adj = np.clip(self.linear, -self.l1, self.l1)
        l1_linear = adj - self.linear
        nrm = np.sqrt((l1_linear * l1_linear).sum(axis=1))
        l21n = self.l21 * np.sqrt(np.float32(self.var.shape[1]))
        keep = nrm > l21n
        scale = 1.0 - l21n / np.maximum(nrm, 1e-30)
        new = l1_linear * scale[:, None] / (y + 2.0 * self.l2)
        self.var = np.where(keep[:, None], new, 0.0).astype(np.float32)
        self.black = ~keep
        return self.var


# (sparse optimizer for our side, oracle factory for the TF side)
GROUP_OPTIMIZERS = {
    "group_adam": (
        # λ tuned so the l21 threshold lands INSIDE the end-of-run spread
        # of row norms: roughly half the rows blacklist, half survive
        lambda: tft.GroupAdamOptimizer(
            learning_rate=3e-2, l1_regularization_strength=1e-5,
            l2_regularization_strength=1e-2,
            l21_regularization_strength=3e-4, version=4),
        lambda var: GroupAdamV4Oracle(var, 3e-2, l1=1e-5, l2=1e-2, l21=3e-4),
        3e-2),
    "sparse_group_ftrl": (
        lambda: tft.SparseGroupFtrlOptimizer(
            learning_rate=5e-2, initial_accumulator_value=0.1,
            l1_regularization_strength=1e-3,
            l2_regularization_strength=1e-2,
            l21_regularization_strength=2e-3),
        lambda var: GroupFtrlOracle(var, 5e-2, initial_accumulator_value=0.1,
                                    l1=1e-3, l2=1e-2, l21=2e-3),
        5e-2),
}


# -- our side ----------------------------------------------------------------

def run_ours_group(weights, batches, eval_batches, name):
    mk_opt, _, sparse_lr = GROUP_OPTIMIZERS[name]
    model = DCN(embedding_dims=[D] * F, num_numeric=NUMERIC,
                dnn_hidden=(32, 16), cross_layers=2, capacity=512)
    opt = mk_opt()
    tx = odense.as_optax(orl.Adam(), DENSE_LR)
    dense = {
        "dnn": [{"w": jnp.asarray(weights["w0"]),
                 "b": jnp.asarray(weights["b0"])},
                {"w": jnp.asarray(weights["w1"]),
                 "b": jnp.asarray(weights["b1"])}],
        "dnn_logits": {"w": jnp.asarray(weights["wd"]),
                       "b": jnp.asarray(weights["bd"])},
        "cross": [{"w": jnp.asarray(weights["cw"][i]),
                   "b": jnp.asarray(weights["cb"][i])} for i in range(2)],
        "cross_logits": {"w": jnp.asarray(weights["wc"]),
                         "b": jnp.asarray(weights["bc"])},
    }
    tables = {}
    all_ids = kv.encode_ids_np_to_device(np.arange(1, V + 1, dtype=np.int64))
    for f in range(F):
        t = kvt.create(D, 512, name=f"C{f+1}", seed=f)
        t = kv.insert(t, all_ids, jnp.asarray(weights["emb"][f][1:]))
        tables[f"C{f+1}"] = opt.init(t)
    state = TrainState(tables=tables, dense=dense,
                       opt_state=tx.init(dense),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, opt, tx, sparse_lr=sparse_lr, donate=False)
    estep = make_train_step(model, opt, tx, sparse_lr=sparse_lr, train=False,
                            donate=False)

    def to_batch(b):
        ids, numeric, labels = b
        return {"ids": {f"C{f+1}": kv.encode_ids_np_to_device(
                            ids[:, f].astype(np.int64)) for f in range(F)},
                "features": jnp.asarray(numeric),
                "labels": jnp.asarray(labels)}

    losses = []
    for b in batches:
        state, loss, _ = step(state, to_batch(b))
        losses.append(float(loss))
    scores, labels = [], []
    for b in eval_batches:
        _, _, preds = estep(state, to_batch(b))
        scores.append(np.asarray(preds))
        labels.append(b[2])
    final_emb, blacks = [], []
    for f in range(F):
        t = state.tables[f"C{f+1}"]
        final_emb.append(np.asarray(kv.lookup_or_zeros(t, all_ids)))
        fr = kvt.find(t, all_ids)
        blacks.append(np.asarray((fr.meta & kvt.FLAG_BLACKLIST) != 0))
    return np.array(losses), np.concatenate(scores), \
        np.concatenate(labels), final_emb, blacks


# -- stock TF + reference-math oracle ----------------------------------------

def run_tf_group(weights, batches, eval_batches, name):
    _, mk_oracle, _ = GROUP_OPTIMIZERS[name]
    emb = [tf.Variable(weights["emb"][f]) for f in range(F)]
    oracles = [mk_oracle(weights["emb"][f]) for f in range(F)]
    w0, b0 = tf.Variable(weights["w0"]), tf.Variable(weights["b0"])
    w1, b1 = tf.Variable(weights["w1"]), tf.Variable(weights["b1"])
    wd, bd = tf.Variable(weights["wd"]), tf.Variable(weights["bd"])
    cw = [tf.Variable(weights["cw"][i]) for i in range(2)]
    cb = [tf.Variable(weights["cb"][i]) for i in range(2)]
    wc, bc = tf.Variable(weights["wc"]), tf.Variable(weights["bc"])
    dense_vars = [w0, b0, w1, b1, wd, bd] + cw + cb + [wc, bc]
    opt = tf.compat.v1.train.AdamOptimizer(DENSE_LR)

    def fwd(ids, numeric):
        embs = [tf.gather(emb[f], ids[:, f]) for f in range(F)]
        net = tf.concat(embs + [numeric], axis=1)
        h = tf.nn.relu(net @ w0 + b0)
        h = tf.nn.relu(h @ w1 + b1)
        dnn_logit = h @ wd + bd
        x = net
        for i in range(2):
            xw = tf.reduce_sum(x * cw[i], axis=-1, keepdims=True)
            x = net * xw + cb[i] + x
        cross_logit = x @ wc + bc
        return (dnn_logit + cross_logit)[:, 0]

    losses = []
    for ids, numeric, labels in batches:
        with tf.GradientTape() as tape:
            logits = fwd(tf.constant(ids), tf.constant(numeric))
            loss = tf.reduce_mean(tf.nn.sigmoid_cross_entropy_with_logits(
                labels=tf.constant(labels), logits=logits))
        grads = tape.gradient(loss, emb + dense_vars)
        opt.apply_gradients(zip(grads[F:], dense_vars))
        for f in range(F):
            g = tf.convert_to_tensor(grads[f]).numpy()  # dup-ids segment-sum
            emb[f].assign(oracles[f].apply(g))
        losses.append(float(loss))
    scores, labels_all = [], []
    for ids, numeric, labels in eval_batches:
        scores.append(fwd(tf.constant(ids), tf.constant(numeric)).numpy())
        labels_all.append(labels)
    final_emb = [emb[f].numpy()[1:] for f in range(F)]
    blacks = [oracles[f].black[1:] for f in range(F)]
    return np.array(losses), np.concatenate(scores), \
        np.concatenate(labels_all), final_emb, blacks


class TestGroupOptimizerCrossFramework:
    @pytest.mark.parametrize("name", sorted(GROUP_OPTIMIZERS))
    def test_identical_trajectory_blacklist_and_auc(self, name):
        weights = gen_weights()
        truth = planted_truth()
        batches = gen_batches(STEPS, truth, seed=11)
        eval_batches = gen_batches(6, truth, seed=99)
        l_ours, s_ours, y, e_ours, b_ours = run_ours_group(
            weights, batches, eval_batches, name)
        l_tf, s_tf, y2, e_tf, b_tf = run_tf_group(
            weights, batches, eval_batches, name)
        np.testing.assert_array_equal(y, y2)

        # per-step loss trajectories coincide
        np.testing.assert_allclose(l_ours, l_tf, atol=5e-3, rtol=0)
        # both learned — parity of garbage would be vacuous
        assert l_ours[-1] < l_ours[0] - 0.02

        # the group-lasso path was actually exercised: the l21 shrink
        # blacklisted SOME rows without killing the whole table
        n_black = sum(int(b.sum()) for b in b_tf)
        assert 0 < n_black < F * V, n_black

        # the blacklist SETS coincide row-for-row
        for f in range(F):
            np.testing.assert_array_equal(b_ours[f], b_tf[f])
            # blacklisted rows read as zeros on our side
            assert not e_ours[f][b_ours[f]].any()

        # final embedding tables match row-for-row
        for f in range(F):
            np.testing.assert_allclose(e_ours[f], e_tf[f], atol=2e-3)

        # eval scores and AUC coincide
        auc_ours, auc_tf = auc_of(s_ours, y), auc_of(s_tf, y)
        assert auc_ours > 0.6 and auc_tf > 0.6
        assert abs(auc_ours - auc_tf) < 0.01, (auc_ours, auc_tf)
        np.testing.assert_allclose(s_ours, s_tf, atol=2e-2)
