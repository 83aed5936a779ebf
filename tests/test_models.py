"""Model integration tests — the examples-as-integration-tests strategy of the
reference (SURVEY.md §4): NCF loss decreases (example/NCFModel/train.py:
117-122), DCN reaches a meaningful AUC on criteo-like data."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tfplus_tpu import kv, train as tft
from tfplus_tpu.data import synthetic
from tfplus_tpu.models import DCN, DLRM, NCF, init_state, make_train_step


def auc_score(labels, scores):
    """Plain rank-based AUC (no sklearn dependency)."""
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


class TestNCF:
    def test_loss_decreases(self):
        data = synthetic.movielens_like(20_000, seed=0)
        model = NCF(embedding_dim=16, hidden=(64, 32), capacity=1 << 12)
        opt = tft.AdamOptimizer()
        tx = optax.adam(1e-2)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=1e-2)

        bs = 256
        losses = []
        for e in range(8):
            for i in range(0, 5120, bs):
                batch = {
                    "ids": {"user": jnp.asarray(data["user_id"][i:i+bs].astype(np.int32)),
                            "movie": jnp.asarray(data["movie_id"][i:i+bs].astype(np.int32))},
                    "labels": jnp.asarray(data["rating"][i:i+bs]),
                }
                state, loss, _ = step(state, batch)
                losses.append(float(loss))
        first = np.mean(losses[:5])
        last = np.mean(losses[-5:])
        assert last < 0.5 * first, (first, last)

    def test_eval_mode_stable(self):
        model = NCF(embedding_dim=8, hidden=(16,), capacity=1 << 10)
        opt = tft.AdamOptimizer()
        tx = optax.adam(1e-3)
        state = init_state(model, opt, tx, seed=0)
        estep = make_train_step(model, opt, tx, sparse_lr=1e-3, train=False,
                                donate=False)
        batch = {"ids": {"user": jnp.arange(32, dtype=jnp.int32),
                         "movie": jnp.arange(32, dtype=jnp.int32)},
                 "labels": jnp.zeros((32,))}
        s1, l1, p1 = estep(state, batch)
        s2, l2, p2 = estep(state, batch)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
        assert int(kv.size(s2.tables["user"])) == 0  # eval never inserts


class TestDCN:
    @pytest.mark.parametrize("opt_name", ["adam", "group_adam"])
    def test_auc_beats_random(self, opt_name):
        gen = synthetic.CriteoLike(seed=0, num_categorical=6,
                                   vocab_sizes=[200] * 6)
        model = DCN(uniform_dim=8, num_numeric=13, dnn_hidden=(64, 32),
                    capacity=1 << 12)
        # restrict to 6 columns for test speed
        model.embedding_dims = (8,) * 6
        model.table_specs = {f"C{i+1}": dict(dim=8, capacity=1 << 12)
                             for i in range(6)}
        model.input_dim = 8 * 6 + 13
        opt = (tft.AdamOptimizer() if opt_name == "adam"
               else tft.GroupAdamOptimizer(l1_regularization_strength=1e-5,
                                           l21_regularization_strength=1e-5))
        tx = optax.adam(1e-3)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=1e-3)

        for batch_np in gen.batches(512, 60):
            batch = {
                "ids": {f"C{i+1}": kv.encode_ids_np_to_device(
                    batch_np["categorical"][:, i]) for i in range(6)},
                "features": jnp.asarray(batch_np["numeric"]),
                "labels": jnp.asarray(batch_np["label"]),
            }
            state, loss, _ = step(state, batch)

        estep = make_train_step(model, opt, tx, sparse_lr=1e-3, train=False,
                                donate=False)
        labels, scores = [], []
        for batch_np in gen.batches(512, 8):
            batch = {
                "ids": {f"C{i+1}": kv.encode_ids_np_to_device(
                    batch_np["categorical"][:, i]) for i in range(6)},
                "features": jnp.asarray(batch_np["numeric"]),
                "labels": jnp.asarray(batch_np["label"]),
            }
            _, _, preds = estep(state, batch)
            labels.append(batch_np["label"])
            scores.append(np.asarray(preds))
        auc = auc_score(np.concatenate(labels), np.concatenate(scores))
        assert auc > 0.70, f"AUC {auc} too low for planted logistic data"


class TestDLRM:
    def test_single_host_train(self):
        model = DLRM(num_tables=4, embedding_dim=8, bottom_hidden=(16, 8),
                     top_hidden=(16, 8), capacity=1 << 12)
        opt = tft.AdagradOptimizer()
        tx = optax.adagrad(0.05)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=0.05)
        losses = []
        for batch_np in synthetic.dlrm_batches(256, 40, num_tables=4,
                                               vocab=1000):
            batch = {
                "ids": {f"T{i}": kv.encode_ids_np_to_device(
                    batch_np["categorical"][:, i]) for i in range(4)},
                "features": jnp.asarray(batch_np["numeric"]),
                "labels": jnp.asarray(batch_np["label"]),
            }
            state, loss, _ = step(state, batch)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestMultiTableStep:
    def test_multi_matches_per_table_semantics(self):
        """Dim-grouped multi-table training works and learns (API parity with
        the reference's multi-level map; see PERF.md for when to use it)."""
        import optax
        from tfplus_tpu.models import (init_state_multi, make_train_step_multi)
        from tfplus_tpu import train as tft
        model = DLRM(num_tables=4, embedding_dim=8, bottom_hidden=(16, 8),
                     top_hidden=(16, 8), capacity=1 << 12)
        opt = tft.AdagradOptimizer()
        tx = optax.adagrad(0.05)
        state = init_state_multi(model, opt, tx, capacity_per_group=1 << 12)
        assert list(state.tables) == ["__group_8"]  # one physical table
        step = make_train_step_multi(model, opt, tx, sparse_lr=0.05)
        losses = []
        for batch_np in synthetic.dlrm_batches(128, 30, num_tables=4,
                                               vocab=500):
            batch = {
                "ids": {f"T{i}": kv.encode_ids_np_to_device(
                    batch_np["categorical"][:, i]) for i in range(4)},
                "features": jnp.asarray(batch_np["numeric"]),
                "labels": jnp.asarray(batch_np["label"]),
            }
            state, loss, _ = step(state, batch)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestDeepFMWideDeep:
    """DeepFM / Wide&Deep on the SparseModel harness: the _w dim-1 linear
    tables alias their field's ids (model.id_alias) and learn with the rest."""

    def _train(self, model_cls, batches=40):
        from tfplus_tpu.models import init_state, make_train_step
        import optax
        from tfplus_tpu import train as tft
        from tfplus_tpu.data import synthetic

        model = model_cls(num_fields=4, embedding_dim=8, num_numeric=4,
                          dnn_hidden=(16, 8), capacity=1 << 10)
        opt = tft.AdamOptimizer()
        tx = optax.adam(5e-3)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=5e-3)
        losses = []
        for i, b in enumerate(synthetic.dlrm_batches(
                256, batches, num_tables=4, num_numeric=4, vocab=500,
                seed=5)):
            batch = {
                "ids": {f"C{c+1}": kv.encode_ids_np_to_device(
                    b["categorical"][:, c]) for c in range(4)},
                "features": jnp.asarray(b["numeric"]),
                "labels": jnp.asarray(b["label"]),
            }
            state, loss, _ = step(state, batch)
            losses.append(float(loss))
        return losses, state

    @pytest.mark.parametrize("name", ["DeepFM", "WideDeep"])
    def test_loss_decreases(self, name):
        from tfplus_tpu import models
        losses, state = self._train(getattr(models, name))
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.01
        # the dim-1 linear tables actually populated
        assert int(kv.size(state.tables["C1_w"])) > 0
        assert state.tables["C1_w"].dim == 1


class TestFlaxAdapter:
    """FlaxSparseModel: a linen dense tower on KV embeddings runs through
    the unchanged harness (init_state / make_train_step) and learns."""

    def _model(self):
        import flax.linen as nn
        from tfplus_tpu.models import FlaxSparseModel

        class Tower(nn.Module):
            @nn.compact
            def __call__(self, embeddings, features):
                x = jnp.concatenate(
                    [embeddings["C1"], embeddings["C2"], features], axis=-1)
                x = nn.relu(nn.Dense(32)(x))
                x = nn.relu(nn.Dense(16)(x))
                return nn.Dense(1)(x)[..., 0]

        return FlaxSparseModel(
            Tower(),
            {"C1": dict(dim=8, capacity=1 << 10),
             "C2": dict(dim=8, capacity=1 << 10)},
            feature_dim=4)

    def test_loss_decreases_and_checkpoints(self, tmp_path):
        from tfplus_tpu import checkpoint as ckpt
        from tfplus_tpu.models import init_state, make_train_step

        model = self._model()
        opt = tft.AdagradOptimizer()
        tx = optax.adam(5e-3)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=0.05)
        losses = []
        for b in synthetic.dlrm_batches(256, 40, num_tables=2,
                                        num_numeric=4, vocab=400, seed=7):
            batch = {
                "ids": {f"C{c+1}": kv.encode_ids_np_to_device(
                    b["categorical"][:, c]) for c in range(2)},
                "features": jnp.asarray(b["numeric"]),
                "labels": jnp.asarray(b["label"]),
            }
            state, loss, _ = step(state, batch)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.01

        # the flax variables dict rides the normal checkpoint path
        prefix = str(tmp_path / "flax_ckpt")
        ckpt.save(prefix, state.tables, dense=state.dense)
        tables2, dense2 = ckpt.restore(
            prefix, dict(state.tables), dense=state.dense)
        got = jax.tree_util.tree_leaves(dense2)
        want = jax.tree_util.tree_leaves(state.dense)
        assert len(got) == len(want)
        for a, b_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-6)


class TestDIN:
    def _run(self, train_steps=300):
        from tfplus_tpu.models.din import DIN
        gen = synthetic.BehaviorSequence(seed=0, n_items=800, n_clusters=12,
                                         seq_len=12)
        model = DIN(embedding_dim=16, seq_len=12, num_numeric=4,
                    att_hidden=(32, 16), dnn_hidden=(64, 32),
                    capacity=1 << 12)
        opt = tft.AdamOptimizer()
        tx = optax.adam(5e-3)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=5e-3)

        def to_batch(b):
            return {
                "ids": {
                    "item": kv.encode_ids_np_to_device(
                        model.pack_item_ids(b["cand"], b["seq"])),
                    "user": kv.encode_ids_np_to_device(
                        b["user"].astype(np.int64)),
                },
                "features": {"numeric": jnp.asarray(b["numeric"]),
                             "mask": jnp.asarray(b["mask"])},
                "labels": jnp.asarray(b["label"]),
            }

        losses = []
        for b in gen.batches(512, train_steps):
            state, loss, _ = step(state, to_batch(b))
            losses.append(float(loss))
        estep = make_train_step(model, opt, tx, sparse_lr=5e-3, train=False,
                                donate=False)
        labels, scores = [], []
        for b in gen.batches(512, 6):
            _, _, preds = estep(state, to_batch(b))
            labels.append(b["label"])
            scores.append(np.asarray(preds))
        return losses, auc_score(np.concatenate(labels),
                                 np.concatenate(scores))

    def test_attention_learns_planted_interest(self):
        """The BehaviorSequence signal is only recoverable through the
        history (latent per-example interest): a healthy DIN separates it
        well above chance, through the shared-item-table dual-stream
        lookup (candidate + flattened sequence in one dedup/probe)."""
        losses, auc = self._run()
        assert losses[-1] < losses[0] - 0.05
        assert auc > 0.75, f"AUC {auc}"


class TestBST:
    def test_transformer_over_history_learns(self):
        """BST: transformer blocks over [history..., candidate] THROUGH the
        Pallas flash-attention layer (segment-id masked, sequence padded to
        the 128 block), trained end-to-end — attention gradients flow back
        into the shared item KV table."""
        from tfplus_tpu.models import BST
        gen = synthetic.BehaviorSequence(seed=0, n_items=400, n_clusters=10,
                                         seq_len=15, pref_strength=0.95,
                                         logit_scale=4.0)
        model = BST(embedding_dim=16, seq_len=15, num_numeric=4,
                    num_heads=2, head_dim=32, num_blocks=1, ffn_hidden=32,
                    dnn_hidden=(64, 32), capacity=1 << 12)
        opt = tft.AdamOptimizer()
        tx = optax.adam(1e-2)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=1e-2)

        def to_batch(b):
            return {
                "ids": {
                    "item": kv.encode_ids_np_to_device(
                        model.pack_item_ids(b["cand"], b["seq"])),
                    "user": kv.encode_ids_np_to_device(
                        b["user"].astype(np.int64)),
                },
                "features": {"numeric": jnp.asarray(b["numeric"]),
                             "mask": jnp.asarray(b["mask"])},
                "labels": jnp.asarray(b["label"]),
            }

        losses = []
        for b in gen.batches(256, 250):
            state, loss, _ = step(state, to_batch(b))
            losses.append(float(loss))
        estep = make_train_step(model, opt, tx, sparse_lr=1e-2, train=False,
                                donate=False)
        labels, scores = [], []
        for b in gen.batches(512, 6):
            _, _, preds = estep(state, to_batch(b))
            labels.append(b["label"])
            scores.append(np.asarray(preds))
        auc = auc_score(np.concatenate(labels), np.concatenate(scores))
        assert losses[-1] < losses[0] - 0.05
        assert auc > 0.72, f"AUC {auc}"


class TestDayStamping:
    def test_train_step_stamps_real_day(self):
        """make_train_step threads the REAL ring day into lookups (review
        finding: a constant day=0 made every row 'thousands of days old',
        so delete_with_timestamp would evict rows touched seconds ago)."""
        from tfplus_tpu.kv import table as kvt
        from tfplus_tpu.utils import packing
        model = NCF(embedding_dim=8, hidden=(16,), capacity=1 << 10)
        opt = tft.AdamOptimizer()
        tx = optax.adam(1e-3)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=1e-3, donate=False)
        batch = {
            "ids": {"user": kv.encode_ids_np_to_device(
                        np.arange(1, 9, dtype=np.int64)),
                    "movie": kv.encode_ids_np_to_device(
                        np.arange(1, 9, dtype=np.int64))},
            "labels": jnp.ones((8,), jnp.float32) * 3.0,
        }
        state, _, _ = step(state, batch)
        today = packing.current_day() % (1 << 13)
        q = kv.encode_ids_np_to_device(np.arange(1, 9, dtype=np.int64))
        days = np.asarray(kv.get_timestamp(state.tables["user"], q))
        np.testing.assert_array_equal(days, today)
        # a TTL sweep "as of now" must evict NOTHING just touched
        t2, evicted = kvt.delete_with_timestamp(state.tables["user"], 30,
                                                packing.current_day())
        assert int(jax.device_get(jnp.sum(evicted))) == 0


class TestScanStep:
    """make_train_step_scan: K steps per dispatch (the TPU
    iterations_per_loop idiom) must be numerically IDENTICAL to K
    sequential single steps — same dedup, same optimizer math, same day
    stamping — and compose with the packed one-buffer feed."""

    def _setup(self, n_tab=3, bs=64):
        model = DCN(uniform_dim=8, num_numeric=13, dnn_hidden=(16,),
                    capacity=1 << 10)
        model.embedding_dims = (8,) * n_tab
        model.table_specs = {f"C{i+1}": dict(dim=8, capacity=1 << 10)
                             for i in range(n_tab)}
        model.input_dim = 8 * n_tab + 13
        opt = tft.GroupAdamOptimizer()
        tx = optax.adam(1e-3)
        return model, opt, tx

    def _batches(self, n_tab, bs, k, seed=0):
        rng = np.random.RandomState(seed)
        out = []
        for _ in range(k):
            out.append({
                "ids": {f"C{i+1}": np.asarray(kv.encode_ids_np_to_device(
                    rng.randint(1, 300, (bs,)).astype(np.int64)))
                    for i in range(n_tab)},
                "features": rng.randn(bs, 13).astype(np.float32),
                "labels": rng.randint(0, 2, (bs,)).astype(np.float32),
            })
        return out

    def test_matches_sequential_single_steps(self):
        from tfplus_tpu.models import make_train_step_scan
        model, opt, tx = self._setup()
        k = 4
        batches = self._batches(3, 64, k)

        s1 = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=1e-2, donate=False)
        single_losses = []
        for b in batches:
            s1, loss, _ = step(s1, b)
            single_losses.append(float(loss))

        s2 = init_state(model, opt, tx, seed=0)
        scan_step = make_train_step_scan(model, opt, tx, sparse_lr=1e-2,
                                         donate=False)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)
        s2, losses = scan_step(s2, stacked)
        np.testing.assert_allclose(np.asarray(losses), single_losses,
                                   rtol=2e-5, atol=2e-6)
        for name in s1.tables:
            np.testing.assert_allclose(np.asarray(s1.tables[name].payload),
                                       np.asarray(s2.tables[name].payload),
                                       rtol=2e-5, atol=2e-6)

    def test_composes_with_packed_feed(self):
        from tfplus_tpu.data import make_packed_feed
        from tfplus_tpu.models import make_train_step_scan
        from tfplus_tpu.models.common import make_train_step as _mts
        from tfplus_tpu.utils import packing as _pk
        import functools

        model, opt, tx = self._setup()
        k = 3
        batches = self._batches(3, 64, k, seed=7)
        pack, unpack = make_packed_feed(batches[0])
        flat = np.stack([pack(b) for b in batches])        # [K, words]

        raw = _mts(model, opt, tx, sparse_lr=1e-2, jit=False)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan_packed(state, flat, day):
            def body(s, f):
                s2, loss, _ = raw(s, unpack(f), day)
                return s2, loss
            return jax.lax.scan(body, state, flat)

        day = jnp.uint32(_pk.current_day() % (1 << 13))
        s0 = init_state(model, opt, tx, seed=0)
        s_packed, losses_packed = scan_packed(s0, jnp.asarray(flat), day)

        s1 = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=1e-2, donate=False)
        want = []
        for b in batches:
            s1, loss, _ = step(s1, b)
            want.append(float(loss))
        np.testing.assert_allclose(np.asarray(losses_packed), want,
                                   rtol=2e-5, atol=2e-6)
