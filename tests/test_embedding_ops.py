"""Embedding lookup op tests — mirrors py_ut/tests/test_embedding_ops.py
(lookup, lookup_sparse combiners, safe lookup, frequency counting)."""
import numpy as np
import jax
import jax.numpy as jnp

from tfplus_tpu import kv, embedding as emb


def make_table(dim=4, capacity=256):
    return kv.create(dim, capacity, seed=3)


def enc(*xs):
    return kv.encode_ids_np_to_device(np.array(xs, dtype=np.int64))


class TestEmbeddingLookup:
    def test_dense_lookup_shape(self):
        t = make_table()
        ids = jnp.array([[1, 2], [3, 1]], dtype=jnp.int32)
        out, look, t = emb.embedding_lookup(t, ids)
        assert out.shape == (2, 2, 4)
        # duplicate id 1 gets identical rows
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(out[1, 1]))
        assert int(kv.size(t)) == 3

    def test_eval_mode_no_insert(self):
        t = make_table()
        out, look, t2 = emb.embedding_lookup(t, jnp.array([5, 6]), train=False)
        np.testing.assert_array_equal(np.asarray(out), 0.0)
        assert int(kv.size(t2)) == 0

    def test_frequency_counts_per_example(self):
        t = make_table()
        ids = jnp.array([7, 7, 7, 8], dtype=jnp.int32)
        _, look, t = emb.embedding_lookup(t, ids)
        assert int(kv.get_count(t, enc(7))[0]) == 3
        assert int(kv.get_count(t, enc(8))[0]) == 1

    def test_gradient_flows_to_unique_rows(self):
        t = make_table()
        ids = jnp.array([1, 1, 2], dtype=jnp.int32)
        look, t = emb.lookup_unique(t, ids)

        def loss_fn(rows):
            x = emb.gather(look, rows)      # [3, 4]
            return jnp.sum(x * jnp.arange(1.0, 4.0)[:, None])

        g = jax.grad(loss_fn)(look.rows)
        # row for id=1 accumulates grads of positions 0 and 1 (1+2), id=2 gets 3
        gn = np.asarray(g)
        sums = sorted(gn.sum(axis=1).tolist())
        # valid rows: 4*(1+2)=12 and 4*3=12 -> both 12; pads 0
        assert sums[-2:] == [12.0, 12.0]


class TestCombiners:
    def _setup(self):
        t = make_table()
        # set known rows: id 1 -> ones, id 2 -> twos, id 3 -> threes
        t = kv.insert(t, enc(1, 2, 3),
                      jnp.stack([jnp.full((4,), v) for v in (1.0, 2.0, 3.0)]))
        return t

    def test_sum_mean_sqrtn(self):
        t = self._setup()
        ids = jnp.array([1, 2, 3], dtype=jnp.int32)
        seg = jnp.array([0, 0, 1], dtype=jnp.int32)
        for combiner, want in [
            ("sum", [[3.0] * 4, [3.0] * 4]),
            ("mean", [[1.5] * 4, [3.0] * 4]),
            ("sqrtn", [[3.0 / np.sqrt(2)] * 4, [3.0] * 4]),
        ]:
            out, _, _ = emb.embedding_lookup_sparse(
                t, ids, seg, 2, combiner=combiner, train=False)
            np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6,
                                       err_msg=combiner)

    def test_weighted_combiners(self):
        t = self._setup()
        ids = jnp.array([1, 2], dtype=jnp.int32)
        seg = jnp.array([0, 0], dtype=jnp.int32)
        w = jnp.array([3.0, 1.0])
        out, _, _ = emb.embedding_lookup_sparse(
            t, ids, seg, 1, weights=w, combiner="mean", train=False)
        np.testing.assert_allclose(np.asarray(out[0]), [(3 + 2) / 4.0] * 4,
                                   rtol=1e-6)
        out, _, _ = emb.embedding_lookup_sparse(
            t, ids, seg, 1, weights=w, combiner="sqrtn", train=False)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   [5.0 / np.sqrt(10.0)] * 4, rtol=1e-6)

    def test_padding_ignored(self):
        t = self._setup()
        ids = jnp.array([1, 2, 999], dtype=jnp.int32)
        seg = jnp.array([0, 1, 1], dtype=jnp.int32)
        valid = jnp.array([True, True, False])
        out, _, t2 = emb.embedding_lookup_sparse(
            t, ids, seg, 2, valid=valid, combiner="sum", train=True)
        np.testing.assert_allclose(np.asarray(out), [[1.0] * 4, [2.0] * 4],
                                   rtol=1e-6)
        # padded id not inserted
        assert int(kv.size(t2)) == 3


class TestSafeLookup:
    def test_negative_ids_pruned_and_empty_rows_zero(self):
        t = make_table()
        t = kv.insert(t, enc(1), jnp.ones((1, 4)))
        ids = np.array([1, -5, -7], dtype=np.int64)
        seg = jnp.array([0, 1, 1], dtype=jnp.int32)
        out, _, _ = emb.safe_embedding_lookup_sparse(
            t, kv.encode_ids_np_to_device(ids), seg, 2, combiner="sum",
            train=False)
        np.testing.assert_allclose(np.asarray(out[0]), 1.0)
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)

    def test_default_id(self):
        t = make_table()
        t = kv.insert(t, enc(1, 42), jnp.stack([jnp.ones((4,)),
                                                jnp.full((4,), 9.0)]))
        ids = np.array([1, -5], dtype=np.int64)
        seg = jnp.array([0, 1], dtype=jnp.int32)
        out, _, _ = emb.safe_embedding_lookup_sparse(
            t, kv.encode_ids_np_to_device(ids), seg, 2, combiner="sum",
            train=False, default_id=42)
        np.testing.assert_allclose(np.asarray(out[1]), 9.0)

    def test_zero_weights_pruned(self):
        t = make_table()
        t = kv.insert(t, enc(1, 2), jnp.stack([jnp.ones((4,)),
                                               jnp.full((4,), 5.0)]))
        ids = jnp.array([1, 2], dtype=jnp.int32)
        seg = jnp.array([0, 0], dtype=jnp.int32)
        out, _, _ = emb.safe_embedding_lookup_sparse(
            t, ids, seg, 1, weights=jnp.array([1.0, 0.0]), combiner="sum",
            train=False)
        np.testing.assert_allclose(np.asarray(out[0]), 1.0)


class TestGradsToUnique:
    def test_segment_sum_grads(self):
        t = make_table()
        ids = jnp.array([4, 4, 9], dtype=jnp.int32)
        look, t = emb.lookup_unique(t, ids)
        g = jnp.arange(12.0).reshape(3, 4)
        gu = emb.grads_to_unique(look, g)
        inv = np.asarray(look.inverse)
        want0 = np.asarray(g[0] + g[1])
        np.testing.assert_allclose(np.asarray(gu[inv[0]]), want0)
        np.testing.assert_allclose(np.asarray(gu[inv[2]]), np.asarray(g[2]))


class TestPartitionedLookup:
    """partitioned_lookup: the reference's PartitionedVariable read path
    (key % N routing over a shard list, single process)."""

    def test_mod_routing_and_values(self):
        from tfplus_tpu import variables
        store = variables.KvVariableStore()
        shards = store.get_kv_variable("pl_emb", 8, num_shards=4,
                                       capacity=512)
        rng = np.random.RandomState(3)
        ids = rng.randint(0, 5000, 64).astype(np.int64)
        rows, shards = emb.partitioned_lookup(shards, ids.astype(np.int32))
        assert rows.shape == (64, 8)
        owner = np.asarray(kv.shard_of(kv.encode_ids(ids), 4))
        for s in range(4):
            assert int(kv.size(shards[s])) == len(np.unique(ids[owner == s]))
        # eval: identical rows, no inserts
        more = np.concatenate([ids, np.array([999_999], np.int64)])
        rows2, shards2 = emb.partitioned_lookup(
            shards, more.astype(np.int32), train=False)
        np.testing.assert_allclose(np.asarray(rows2[:64]), np.asarray(rows))
        np.testing.assert_allclose(np.asarray(rows2[64]), 0.0)
        assert sum(int(kv.size(s)) for s in shards2) == \
            sum(int(kv.size(s)) for s in shards)

    def test_single_table_passthrough(self):
        t = kv.create(8, 256)
        rows, t = emb.partitioned_lookup(t, np.arange(10, dtype=np.int64))
        assert rows.shape == (10, 8) and int(kv.size(t)) == 10


class TestSafeLookupUint64:
    def test_uint64_fingerprints_not_pruned(self):
        """String-key fingerprints span the full uint64 space (hashing.py);
        ids >= 2**63 set the encoded high word's sign bit and must NOT be
        pruned as 'negative' (review finding: the sign convention only
        exists for signed int64 inputs)."""
        t = kv.create(4, 256, seed=0)
        big = np.array([2**63 + 5, 2**63 + 12345], dtype=np.uint64)
        enc = kv.encode_ids(big)
        t = kv.insert(t, enc, jnp.stack([jnp.full((4,), 1.0),
                                         jnp.full((4,), 2.0)]))
        seg = jnp.array([0, 1], dtype=jnp.int32)
        out, _, _ = emb.safe_embedding_lookup_sparse(
            t, big, seg, 2, combiner="sum", train=False)
        np.testing.assert_allclose(np.asarray(out[0]), 1.0)
        np.testing.assert_allclose(np.asarray(out[1]), 2.0)
        # pre-encoded fingerprints: opt out of pruning explicitly
        out2, _, _ = emb.safe_embedding_lookup_sparse(
            t, kv.encode_ids_np_to_device(big.view(np.int64)), seg, 2,
            combiner="sum", train=False, prune_negative=False)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out))

    def test_negative_int64_still_pruned(self):
        t = kv.create(4, 256, seed=0)
        q = kv.encode_ids(np.array([9], dtype=np.int64))
        t = kv.insert(t, q, jnp.full((1, 4), 5.0))
        out, _, _ = emb.safe_embedding_lookup_sparse(
            t, np.array([9, -1], dtype=np.int64),
            jnp.array([0, 1], jnp.int32), 2, combiner="sum", train=False)
        np.testing.assert_allclose(np.asarray(out[0]), 5.0)
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)
