"""Model-level cross-framework parity: a full DCN trained in stock
TensorFlow vs this framework, identical weights and identical batches.

The reference's quality bar is the AUC table in example/dcn/README.md —
its absolute numbers need the non-redistributable Criteo-Kaggle set, so
absolute-value parity can't be demonstrated here. This test pins the
stronger framework-equivalence claim instead: the SAME model (DCN towers,
example/dcn/train.py:104-360), SAME initial weights, SAME batch stream,
SAME optimizer (Adam both sides — sparse tables through our fused rule,
dense towers through the dense twin) must produce the SAME per-step loss
trajectory, final embeddings, and eval AUC as stock TF training the exact
graph. Any divergence in lookup, combiner grads, segment-sum dedup,
optimizer math, or the loss would show up here.

Every batch covers the full vocabulary (plus duplicates) so TF1 Adam's
non-lazy sparse semantics (all-row m/v decay) coincide with our
touched-row updates — the same trick the reference's own kernel tests use
to compare against dense TF optimizers (py_ut/tests/test_training_ops.py).
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402
import jax  # noqa: E402

from tfplus_tpu import kv, train as tft  # noqa: E402
from tfplus_tpu.kv import table as kvt  # noqa: E402
from tfplus_tpu.models import DCN, TrainState, make_train_step  # noqa: E402
from tfplus_tpu.optim import dense as odense, rules as orl  # noqa: E402

F, V, D, NUMERIC = 4, 96, 8, 4
B, STEPS = 160, 30
INPUT = F * D + NUMERIC

# (our sparse rule via train.py wrapper, our dense-twin rule, stock TF
#  optimizer, lr) — both frameworks get the same optimizer + hyperparams
OPTIMIZERS = {
    "adam": (lambda lr: tft.AdamOptimizer(learning_rate=lr),
             lambda: orl.Adam(),
             lambda lr: tf.compat.v1.train.AdamOptimizer(lr), 3e-3),
    "adagrad": (lambda lr: tft.AdagradOptimizer(learning_rate=lr),
                lambda: orl.Adagrad(),
                lambda lr: tf.compat.v1.train.AdagradOptimizer(
                    lr, initial_accumulator_value=0.1), 5e-2),
}


def gen_weights(seed=7):
    rng = np.random.RandomState(seed)
    w = {
        "emb": [rng.randn(V + 1, D).astype(np.float32) * 0.05
                for _ in range(F)],
        "w0": rng.randn(INPUT, 32).astype(np.float32) * 0.1,
        "b0": rng.randn(32).astype(np.float32) * 0.1,
        "w1": rng.randn(32, 16).astype(np.float32) * 0.1,
        "b1": rng.randn(16).astype(np.float32) * 0.1,
        "wd": rng.randn(16, 1).astype(np.float32) * 0.1,
        "bd": rng.randn(1).astype(np.float32) * 0.1,
        "cw": [rng.randn(INPUT).astype(np.float32) * 0.1 for _ in range(2)],
        "cb": [rng.randn(INPUT).astype(np.float32) * 0.1 for _ in range(2)],
        "wc": rng.randn(INPUT, 1).astype(np.float32) * 0.1,
        "bc": rng.randn(1).astype(np.float32) * 0.1,
    }
    return w


def planted_truth(seed=5):
    rng = np.random.RandomState(seed)
    return (rng.randn(F, V + 1).astype(np.float32) * 0.8,
            rng.randn(NUMERIC).astype(np.float32) * 0.5)


def gen_batches(n, truth, seed=11):
    """Planted-logistic stream; ids cover 1..V every batch."""
    rng = np.random.RandomState(seed)
    w_true, w_num = truth
    out = []
    for _ in range(n):
        ids = np.stack([np.concatenate([
            rng.permutation(V) + 1,
            rng.randint(1, V + 1, B - V)]) for _ in range(F)], axis=1)
        numeric = rng.randn(B, NUMERIC).astype(np.float32)
        logit = sum(w_true[f][ids[:, f]] for f in range(F)) + numeric @ w_num
        labels = (rng.uniform(size=B) < 1 / (1 + np.exp(-logit))
                  ).astype(np.float32)
        out.append((ids, numeric, labels))
    return out


def auc_of(scores, labels):
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    return ((ranks[pos].sum() - pos.sum() * (pos.sum() + 1) / 2)
            / max(pos.sum() * (~pos).sum(), 1))


# -- ours -------------------------------------------------------------------

def run_ours(weights, batches, eval_batches, opt_name):
    mk_sparse, mk_rule, _, LR = OPTIMIZERS[opt_name]
    model = DCN(embedding_dims=[D] * F, num_numeric=NUMERIC,
                dnn_hidden=(32, 16), cross_layers=2, capacity=512)
    opt = mk_sparse(LR)
    tx = odense.as_optax(mk_rule(), LR)     # dense twin: TF-kernel math
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
    step = make_train_step(model, opt, tx, sparse_lr=LR, donate=False)
    estep = make_train_step(model, opt, tx, sparse_lr=LR, train=False,
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
    final_emb = [np.asarray(kv.lookup_or_zeros(state.tables[f"C{f+1}"],
                                               all_ids)) for f in range(F)]
    return np.array(losses), np.concatenate(scores), \
        np.concatenate(labels), final_emb


# -- stock TF -----------------------------------------------------------

def run_tf(weights, batches, eval_batches, opt_name):
    _, _, mk_tf, LR = OPTIMIZERS[opt_name]
    emb = [tf.Variable(weights["emb"][f]) for f in range(F)]
    w0, b0 = tf.Variable(weights["w0"]), tf.Variable(weights["b0"])
    w1, b1 = tf.Variable(weights["w1"]), tf.Variable(weights["b1"])
    wd, bd = tf.Variable(weights["wd"]), tf.Variable(weights["bd"])
    cw = [tf.Variable(weights["cw"][i]) for i in range(2)]
    cb = [tf.Variable(weights["cb"][i]) for i in range(2)]
    wc, bc = tf.Variable(weights["wc"]), tf.Variable(weights["bc"])
    allvars = emb + [w0, b0, w1, b1, wd, bd] + cw + cb + [wc, bc]
    opt = mk_tf(LR)

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
        grads = tape.gradient(loss, allvars)
        opt.apply_gradients(zip(grads, allvars))
        losses.append(float(loss))
    scores, labels_all = [], []
    for ids, numeric, labels in eval_batches:
        scores.append(fwd(tf.constant(ids), tf.constant(numeric)).numpy())
        labels_all.append(labels)
    final_emb = [emb[f].numpy()[1:] for f in range(F)]
    return np.array(losses), np.concatenate(scores), \
        np.concatenate(labels_all), final_emb


class TestDCNCrossFramework:
    @pytest.mark.parametrize("opt_name", sorted(OPTIMIZERS))
    def test_identical_trajectory_and_auc(self, opt_name):
        weights = gen_weights()
        truth = planted_truth()
        batches = gen_batches(STEPS, truth, seed=11)
        eval_batches = gen_batches(6, truth, seed=99)
        l_ours, s_ours, y, e_ours = run_ours(weights, batches, eval_batches,
                                             opt_name)
        l_tf, s_tf, y2, e_tf = run_tf(weights, batches, eval_batches,
                                      opt_name)
        np.testing.assert_array_equal(y, y2)

        # per-step loss trajectories coincide
        np.testing.assert_allclose(l_ours, l_tf, atol=5e-3, rtol=0)
        # both learned (loss fell) — parity of garbage would be vacuous
        assert l_ours[-1] < l_ours[0] - 0.02

        # final embedding tables match row-for-row
        for f in range(F):
            np.testing.assert_allclose(e_ours[f], e_tf[f], atol=2e-3)

        # eval scores and AUC coincide
        auc_ours, auc_tf = auc_of(s_ours, y), auc_of(s_tf, y)
        assert auc_ours > 0.6 and auc_tf > 0.6
        assert abs(auc_ours - auc_tf) < 0.01, (auc_ours, auc_tf)
        np.testing.assert_allclose(s_ours, s_tf, atol=2e-2)
