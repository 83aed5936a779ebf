"""API-surface parity tests: variable store, multi-table packing, serving
metadata, config tree, table stats, and second-order segment gradients
(reference SparseSegment*GradGrad ops — free via JAX autodiff)."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfplus_tpu import kv, serving, config as tfconfig
from tfplus_tpu import embedding as emb
from tfplus_tpu.kv import multi
from tfplus_tpu.variables import KvVariableStore


class TestVariableStore:
    def test_create_and_reuse(self):
        store = KvVariableStore()
        t1 = store.get_kv_variable("emb_a", 16)
        t2 = store.get_kv_variable("emb_a", 16)
        assert t1 is t2
        with pytest.raises(ValueError, match="dim mismatch"):
            store.get_kv_variable("emb_a", 32)

    def test_partitioned(self):
        store = KvVariableStore()
        shards = store.get_kv_variable("big", 8, num_shards=4)
        assert len(shards) == 4
        assert shards[2].config.name == "big/part_2"

    def test_feature_size(self):
        store = KvVariableStore()
        t = store.get_kv_variable("e", 4, capacity=256)
        ids = kv.encode_ids_np_to_device(np.arange(5, dtype=np.int64))
        store.update("e", kv.lookup_or_insert(t, ids).table)
        assert store.get_kv_feature_size() == {"e": 5}

    def test_saver_mode(self):
        from tfplus_tpu.checkpoint import saver
        store = KvVariableStore()
        assert store.save_first_n == saver.FIRST_N_TRAIN
        store.set_saver_mode(0)
        assert store.save_first_n == saver.FIRST_N_INFERENCE


class TestMultiTable:
    def test_logical_tables_disjoint(self):
        mt = multi.MultiTable(4, 1 << 10)
        mt.register("user")
        mt.register("item")
        ids = np.array([1, 2, 3], np.int64)
        qu = kv.encode_ids_np_to_device(np.asarray(mt.tag("user", ids)))
        qi = kv.encode_ids_np_to_device(np.asarray(mt.tag("item", ids)))
        t = kv.insert(mt.table, qu, jnp.ones((3, 4)))
        t = kv.insert(t, qi, jnp.full((3, 4), 2.0))
        mt.table = t
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t, qu)), 1.0)
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t, qi)), 2.0)
        assert int(kv.size(t)) == 6

    def test_device_tagging_matches_host(self):
        mt = multi.MultiTable(4)
        mt.register("a")
        mt.register("b")
        ids = np.array([7, 2**40 + 3], np.uint64)
        host = np.asarray(mt.tag("b", ids))
        dev = multi.tag_ids(jnp.asarray([7], jnp.int32), 1)
        assert kv.decode_ids_np(np.asarray(dev))[0] == host[0]

    def test_export_split(self):
        mt = multi.MultiTable(4, 1 << 10)
        mt.register("x")
        mt.register("y")
        qx = kv.encode_ids_np_to_device(np.asarray(mt.tag("x", np.array([5], np.int64))))
        qy = kv.encode_ids_np_to_device(np.asarray(mt.tag("y", np.array([5, 6], np.int64))))
        mt.table = kv.insert(mt.table, qx, jnp.ones((1, 4)))
        mt.table = kv.insert(mt.table, qy, jnp.full((2, 4), 3.0))
        out = mt.export_split()
        assert out["x"]["keys"].tolist() == [5]
        assert sorted(out["y"]["keys"].tolist()) == [5, 6]
        np.testing.assert_allclose(out["x"]["values"], 1.0)


class TestServingMetadata:
    def test_metadata_roundtrip(self, tmp_path):
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="C1", var_name="embedding_weight_1",
                                embedding_dim=64, combiner="mean", num_shards=2)
        blob = json.loads(md.to_json())
        cols = blob[serving.RANK_SERVICE_COLLECTION]
        assert cols[0]["embedding_var_keys"] == [
            "embedding_weight_1/part_0-keys", "embedding_weight_1/part_1-keys"]
        p = str(tmp_path / "rank.json")
        md.save(p)
        md2 = serving.RankingMetadata.load(p)
        assert md2.generate_signature()["C1"]["embedding_dim"] == 64


class TestServingExport:
    """export_for_serving/load_for_serving: the reference's prediction-mode
    export (first_n=3, kv_variable_ops.py:1438-1466) + ranking metadata,
    loadable with NO templates."""

    def test_export_load_roundtrip(self, tmp_path):
        t = kv.create(8, 1024)
        ids = kv.encode_ids_np_to_device(np.arange(100, dtype=np.int64))
        t = kv.lookup_or_insert(t, ids).table
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="user", var_name="user_emb",
                                embedding_dim=8)
        serving.export_for_serving(str(tmp_path), {"user_emb": t}, md)
        tabs, md2 = serving.load_for_serving(str(tmp_path))
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(tabs["user_emb"], ids)),
            np.asarray(kv.lookup_or_zeros(t, ids)))
        unk = kv.encode_ids_np_to_device(np.array([99999], dtype=np.int64))
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(tabs["user_emb"], unk)), 0.0)
        assert md2.generate_signature()["user"]["embedding_dim"] == 8
        # inference export carries no optimizer slots
        assert not tabs["user_emb"].slots

    def test_sharded_export_load(self, tmp_path):
        all_ids = np.arange(100, dtype=np.int64)
        shards = []
        for i in range(2):
            mine = all_ids[all_ids % 2 == i]
            s = kv.create(8, 512, seed=i)
            s = kv.insert(s, kv.encode_ids_np_to_device(mine),
                          np.full((mine.size, 8), float(i + 1), np.float32))
            shards.append(s)
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="item", var_name="item_emb",
                                embedding_dim=8, num_shards=2)
        serving.export_for_serving(str(tmp_path), {"item_emb": shards}, md)
        tabs, _ = serving.load_for_serving(str(tmp_path))
        assert isinstance(tabs["item_emb"], list) and len(tabs["item_emb"]) == 2
        for i in range(2):
            mine = all_ids[all_ids % 2 == i]
            got = kv.lookup_or_zeros(
                tabs["item_emb"][i], kv.encode_ids_np_to_device(mine))
            np.testing.assert_allclose(np.asarray(got), float(i + 1))


class TestConfig:
    def test_defaults_and_env(self, monkeypatch):
        rc = tfconfig.RuntimeConfig.from_env()
        assert rc.support_delta_export
        monkeypatch.setenv("SUPPORT_DELTA_EXPORT", "0")
        rc = tfconfig.RuntimeConfig.from_env()
        assert not rc.support_delta_export

    def test_kv_options(self):
        opts = tfconfig.KvOptions(enter_threshold=5, ttl_days=30)
        assert opts.storage.combination == tfconfig.StorageCombination.MEM


class TestStats:
    def test_stats_snapshot(self):
        t = kv.create(8, 256, seed=0)
        ids = kv.encode_ids_np_to_device(np.arange(10, dtype=np.int64))
        t = kv.lookup_or_insert(t, ids, counts=jnp.full((10,), 3, jnp.int32)).table
        s = kv.table.stats(t)
        assert s["size"] == 10 and s["sum_freq"] == 30
        assert s["delta_pending"] == 10
        assert s["bytes"] > 0


class TestSecondOrderSegmentGrads:
    """Parity with N15 (ops/math_ops.cc SparseSegmentMeanGradGrad /
    SparseSegmentSqrtNGradGrad): grad-of-grad through mean/sqrtn combiners
    must exist and be correct — JAX autodiff provides it; we pin it down."""

    @pytest.mark.parametrize("combiner", ["mean", "sqrtn"])
    def test_grad_grad(self, combiner):
        t = kv.create(4, 256, seed=0)
        ids = jnp.array([1, 1, 2], jnp.int32)
        look, t = emb.lookup_unique(t, ids)
        seg = jnp.array([0, 0, 1], jnp.int32)

        def f(rows):
            out = emb.combine(look, seg, 2, rows=rows, combiner=combiner)
            return jnp.sum(out ** 3)

        g = jax.grad(f)(look.rows)
        hvp = jax.grad(lambda r: jnp.vdot(jax.grad(f)(r), g))(look.rows)
        assert np.all(np.isfinite(np.asarray(hvp)))
        assert np.abs(np.asarray(hvp)).sum() > 0


class TestQuantizedServingLoad:
    def test_load_for_serving_quantized(self, tmp_path):
        from tfplus_tpu import serving
        from tfplus_tpu.kv import quant
        t = kv.create(8, 512, seed=0)
        q = kv.encode_ids_np_to_device(np.arange(1, 100, dtype=np.int64))
        rng = np.random.RandomState(0)
        t = kv.insert(t, q, jnp.asarray(rng.randn(99, 8).astype(np.float32)))
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="u", var_name="u_emb",
                                embedding_dim=8)
        d = str(tmp_path / "srv")
        serving.export_for_serving(d, {"u_emb": t}, md)
        tables, _ = serving.load_for_serving(d, quantize=True)
        qt = tables["u_emb"]
        assert isinstance(qt, quant.QuantKvTable)
        full = np.asarray(kv.lookup_or_zeros(t, q), np.float32)
        deq = np.asarray(quant.lookup_or_zeros(qt, q))
        bound = np.abs(full).max(axis=1, keepdims=True) / 250.0 + 1e-7
        assert (np.abs(deq - full) <= bound).all()


class TestServingDeltaRefresh:
    def test_refresh_from_delta(self, tmp_path):
        """Online serving refresh: full load once, then apply deltas in
        place of full reloads (the delta-lineage machinery consumed on the
        serving side)."""
        from tfplus_tpu import serving, checkpoint as ckpt
        t = kv.create(8, 512, seed=0)
        q1 = kv.encode_ids_np_to_device(np.arange(1, 50, dtype=np.int64))
        t = kv.insert(t, q1, jnp.ones((49, 8)))
        d = str(tmp_path / "srv")
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="u", var_name="emb",
                                embedding_dim=8)
        serving.export_for_serving(d, {"emb": t}, md)
        tables, _ = serving.load_for_serving(d)

        # trainer continues: update some rows + add new ones, delta-export
        t = kv.clear_deltalist(t)
        q2 = kv.encode_ids_np_to_device(np.arange(40, 80, dtype=np.int64))
        t = kv.insert(t, q2, jnp.full((40, 8), 2.0))
        delta_p = str(tmp_path / "delta-1")
        t = ckpt.save(delta_p, {"emb": t}, delta=True,
                      first_n=ckpt.FIRST_N_DELTA)["emb"]

        tables = serving.refresh_from_delta(tables, delta_p)
        got = np.asarray(kv.lookup_or_zeros(
            tables["emb"], kv.encode_ids_np_to_device(
                np.array([1, 45, 79], np.int64))))
        np.testing.assert_allclose(got[0], 1.0)   # untouched row kept
        np.testing.assert_allclose(got[1], 2.0)   # updated row refreshed
        np.testing.assert_allclose(got[2], 2.0)   # new row appeared

    def test_refresh_quantized(self, tmp_path):
        from tfplus_tpu import serving, checkpoint as ckpt
        from tfplus_tpu.kv import quant
        t = kv.create(4, 256, seed=0)
        q1 = kv.encode_ids_np_to_device(np.arange(1, 20, dtype=np.int64))
        t = kv.insert(t, q1, jnp.ones((19, 4)) * 3.0)
        d = str(tmp_path / "srvq")
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="u", var_name="emb",
                                embedding_dim=4)
        serving.export_for_serving(d, {"emb": t}, md)
        tables, _ = serving.load_for_serving(d, quantize=True)

        t = kv.clear_deltalist(t)
        q2 = kv.encode_ids_np_to_device(np.array([5, 99], np.int64))
        t = kv.insert(t, q2, jnp.full((2, 4), 7.0))
        delta_p = str(tmp_path / "deltaq-1")
        ckpt.save(delta_p, {"emb": t}, delta=True, first_n=ckpt.FIRST_N_DELTA)

        tables = serving.refresh_from_delta(tables, delta_p, quantize=True)
        qt = tables["emb"]
        assert isinstance(qt, quant.QuantKvTable)
        got = np.asarray(quant.lookup_or_zeros(
            qt, kv.encode_ids_np_to_device(np.array([1, 5, 99], np.int64))))
        np.testing.assert_allclose(got[0], 3.0, atol=0.05)
        np.testing.assert_allclose(got[1], 7.0, atol=0.1)
        np.testing.assert_allclose(got[2], 7.0, atol=0.1)


class TestPartitionerCompat:
    def test_local_fixed_size_partitioner(self):
        import tfplus_tpu
        shards = tfplus_tpu.get_kv_variable(
            "pshim_a", 8, capacity=256,
            partitioner=tfplus_tpu.fixed_size_partitioner(4))
        assert isinstance(shards, list) and len(shards) == 4

    def test_tf_style_closure(self):
        """A real tf.fixed_size_partitioner-shaped closure: does
        ``[1]*shape.ndims`` with ``min(N, shape.dims[axis].value)`` on the
        partitioned axis — the probe must recover N, not 1."""
        import tfplus_tpu

        def tf_like_partitioner(shape=None, dtype=None, num_shards=6, axis=0):
            parts = [1] * shape.ndims
            parts[axis] = min(num_shards, shape.dims[axis].value)
            return parts

        shards = tfplus_tpu.get_kv_variable(
            "pshim_b", 8, capacity=256, partitioner=tf_like_partitioner)
        assert isinstance(shards, list) and len(shards) == 6

    def test_bad_partitioner_raises(self):
        import tfplus_tpu
        import pytest as _pytest
        with _pytest.raises(ValueError, match="num_shards"):
            tfplus_tpu.get_kv_variable("pshim_c", 8, partitioner=object())


class TestServingRefreshRegressions:
    """Third-review findings pinned."""

    def _export_load(self, tmp_path, dim=4):
        from tfplus_tpu import serving
        t = kv.create(dim, 256, seed=0)
        q = kv.encode_ids_np_to_device(np.arange(1, 20, dtype=np.int64))
        t = kv.insert(t, q, jnp.ones((19, dim)))
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="u", var_name="emb",
                                embedding_dim=dim)
        d = str(tmp_path / "srv")
        serving.export_for_serving(d, {"emb": t}, md)
        return serving.load_for_serving(d)[0], t, q

    def test_trainer_delta_does_not_widen_serving_tables(self, tmp_path):
        """A delta written by a TRAINING job carries optimizer slot
        tensors; refreshing serving tables must NOT load them (they would
        multiply serving HBM by 1+k)."""
        from tfplus_tpu import serving, checkpoint as ckpt, train as tft
        tables, t, q = self._export_load(tmp_path)
        opt = tft.GroupAdamOptimizer()          # k=3 slots
        t = opt.init(kv.clear_deltalist(t))
        res = kv.lookup_or_insert(t, q)
        t = opt.apply(res.table, res.slot, jnp.ones((19, 4)) * 0.1,
                      lr=0.1, step=1)
        delta_p = str(tmp_path / "train-delta")
        ckpt.save(delta_p, {"emb": t}, delta=True,
                  first_n=ckpt.FIRST_N_DELTA)   # includes -slot- tensors
        before_cols = tables["emb"].payload.shape[1]
        tables = serving.refresh_from_delta(tables, delta_p)
        assert tables["emb"].payload.shape[1] == before_cols == 4
        assert tables["emb"].config.slot_layout == ()

    def test_quantize_flag_mismatch_raises(self, tmp_path):
        from tfplus_tpu import serving, checkpoint as ckpt
        from tfplus_tpu.kv import quant
        tables, t, q = self._export_load(tmp_path)
        t = kv.clear_deltalist(t)
        t = kv.insert(t, q[:1], jnp.full((1, 4), 9.0))
        delta_p = str(tmp_path / "d")
        ckpt.save(delta_p, {"emb": t}, delta=True, first_n=ckpt.FIRST_N_DELTA)
        qtables = {"emb": quant.quantize_table(tables["emb"])}
        with pytest.raises(ValueError, match="quantize"):
            serving.refresh_from_delta(qtables, delta_p)   # forgot the flag
        with pytest.raises(ValueError, match="quantize"):
            serving.refresh_from_delta(tables, delta_p, quantize=True)

    def test_quantized_refresh_with_slotted_delta(self, tmp_path):
        """quantize_table clears slot_layout, so refreshing a quantized
        table with a trainer (slotted) delta works."""
        from tfplus_tpu import serving, checkpoint as ckpt, train as tft
        from tfplus_tpu.kv import quant
        tables, t, q = self._export_load(tmp_path)
        qtables = {"emb": quant.quantize_table(tables["emb"])}
        assert qtables["emb"].config.slot_layout == ()
        opt = tft.GroupAdamOptimizer()
        t = opt.init(kv.clear_deltalist(t))
        res = kv.lookup_or_insert(t, q)
        t = opt.apply(res.table, res.slot, jnp.ones((19, 4)) * 0.1,
                      lr=0.1, step=1)
        delta_p = str(tmp_path / "qd")
        ckpt.save(delta_p, {"emb": t}, delta=True, first_n=ckpt.FIRST_N_DELTA)
        out = serving.refresh_from_delta(qtables, delta_p, quantize=True)
        assert out["emb"].payload.shape[1] == 4
        got = np.asarray(quant.lookup_or_zeros(out["emb"], q))
        want = np.asarray(kv.lookup_or_zeros(t, q))
        assert np.abs(got - want).max() < np.abs(want).max() / 100
