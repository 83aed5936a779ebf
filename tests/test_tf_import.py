"""TFPlus checkpoint migration: import a REAL TF TensorBundle written with
the reference's tensor contract (``<var>-keys/-values/-init_table/-blacklist/
-freq_keys/-freq_values``, kv_variable_ops.py:1458-1459) into KvTables.

The fixture checkpoint is produced by TensorFlow itself (tf.raw_ops.SaveV2 —
the exact op the reference's saver emits), so this exercises the genuine
on-disk format, not our own writer."""
import json

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from tfplus_tpu import kv  # noqa: E402
from tfplus_tpu.checkpoint import tf_import  # noqa: E402


def _save_v2(prefix, names, tensors):
    tf.raw_ops.SaveV2(prefix=prefix, tensor_names=names,
                      shape_and_slices=[""] * len(names),
                      tensors=[tf.constant(t) for t in tensors])


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """A reference-format checkpoint: one plain var, one 2-shard var with
    uint16 freqs + blacklist, one var with SaveV3's packed uint32 words,
    one m_v-style slot variable, one dense tensor."""
    prefix = str(tmp_path_factory.mktemp("tfckpt") / "model.ckpt-100")
    rng = np.random.RandomState(0)

    emb_keys = np.array([3, 11, 2**40, 7], np.int64)
    emb_vals = rng.randn(4, 8).astype(np.float32)
    pool = rng.randn(16, 8).astype(np.float32)

    # 2-shard partitioned variable (reference name/part_i layout)
    k0 = np.array([2, 4, 10], np.int64)        # even ids -> part_0 of 2
    k1 = np.array([1, 3, 9], np.int64)
    v0 = rng.randn(3, 4).astype(np.float32)
    v1 = rng.randn(3, 4).astype(np.float32)
    f0 = np.array([5, 6, 7], np.uint16)
    f1 = np.array([8, 9, 10], np.uint16)
    bl1 = np.array([3], np.int64)              # key 3 blacklisted

    # packed uint32 freq|day<<16 (SaveV3 freq_use_uint32)
    u_keys = np.array([21, 22], np.int64)
    u_vals = rng.randn(2, 4).astype(np.float32)
    u_meta = (np.array([17, 900], np.uint32)
              | (np.array([20000, 20001], np.uint32) << 16))

    slot_vals = rng.randn(4, 16).astype(np.float32)   # k=2 concat slot

    names, tensors = [], []

    def add(n, t):
        names.append(n)
        tensors.append(t)

    add("emb-keys", emb_keys)
    add("emb-values", emb_vals)
    add("emb-init_table", pool)
    add("emb-blacklist", np.zeros((0,), np.int64))
    add("emb-freq_keys", emb_keys)
    add("emb-freq_values", np.array([1, 2, 3, 4], np.uint16))

    add("wide/part_0-keys", k0)
    add("wide/part_0-values", v0)
    add("wide/part_0-init_table", np.zeros((0, 4), np.float32))
    add("wide/part_0-blacklist", np.zeros((0,), np.int64))
    add("wide/part_0-freq_keys", k0)
    add("wide/part_0-freq_values", f0)
    add("wide/part_1-keys", k1)
    add("wide/part_1-values", v1)
    add("wide/part_1-init_table", np.zeros((0, 4), np.float32))
    add("wide/part_1-blacklist", bl1)
    add("wide/part_1-freq_keys", k1)
    add("wide/part_1-freq_values", f1)

    add("packed-keys", u_keys)
    add("packed-values", u_vals)
    add("packed-freq_keys", u_keys)
    add("packed-freq_values", u_meta)

    add("emb/m_v-keys", emb_keys)
    add("emb/m_v-values", slot_vals)

    add("dense/w", np.arange(6, dtype=np.float32).reshape(2, 3))

    _save_v2(prefix, names, tensors)
    return {
        "prefix": prefix, "emb_keys": emb_keys, "emb_vals": emb_vals,
        "pool": pool, "k0": k0, "k1": k1, "v0": v0, "v1": v1,
        "f0": f0, "f1": f1, "u_keys": u_keys, "u_vals": u_vals,
        "u_meta": u_meta, "slot_vals": slot_vals,
    }


def enc(a):
    return kv.encode_ids_np_to_device(np.asarray(a, np.int64))


class TestDiscovery:
    def test_list_kv_variables(self, ckpt):
        infos = tf_import.list_kv_variables(ckpt["prefix"])
        assert set(infos) == {"emb", "wide", "packed", "emb/m_v"}
        assert infos["emb"]["num_shards"] == 1
        assert infos["emb"]["dim"] == 8
        assert infos["wide"]["num_shards"] == 2
        assert infos["wide"]["has_blacklist"]
        assert infos["packed"]["freq_dtype"] == np.uint32


class TestImport:
    def test_plain_variable(self, ckpt):
        (t,) = tf_import.import_kv_variable(ckpt["prefix"], "emb")
        got = np.asarray(kv.lookup_or_zeros(t, enc(ckpt["emb_keys"])))
        np.testing.assert_allclose(got, ckpt["emb_vals"], rtol=1e-6)
        # init pool replaced by the checkpoint's
        np.testing.assert_allclose(np.asarray(t.init_pool), ckpt["pool"],
                                   rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(kv.get_count(t, enc(ckpt["emb_keys"]))), [1, 2, 3, 4])

    def test_sharded_to_different_count(self, ckpt):
        """2 checkpoint shards -> 3 tables: elastic key%3 routing, freq and
        blacklist preserved."""
        shards = tf_import.import_kv_variable(ckpt["prefix"], "wide",
                                              num_shards=3, capacity=256)
        all_keys = np.concatenate([ckpt["k0"], ckpt["k1"]])
        all_vals = np.concatenate([ckpt["v0"], ckpt["v1"]])
        all_freq = np.concatenate([ckpt["f0"], ckpt["f1"]])
        for key, val, fr in zip(all_keys, all_vals, all_freq):
            s = int(key % 3)
            got = np.asarray(kv.lookup_or_zeros(shards[s], enc([key])))[0]
            if key == 3:   # blacklisted -> reads as zeros
                np.testing.assert_array_equal(got, 0.0)
            else:
                np.testing.assert_allclose(got, val, rtol=1e-6)
            assert int(np.asarray(
                kv.get_count(shards[s], enc([key])))[0]) == fr
            # and absent from the other shards
            for o in range(3):
                if o != s:
                    assert not bool(np.asarray(
                        kv.find(shards[o], enc([key])).found)[0])

    def test_packed_uint32_freq(self, ckpt):
        """SaveV3's freq_use_uint32 word restores both freq and day."""
        (t,) = tf_import.import_kv_variable(ckpt["prefix"], "packed")
        q = enc(ckpt["u_keys"])
        np.testing.assert_array_equal(np.asarray(kv.get_count(t, q)),
                                      [17, 900])
        days = np.asarray(kv.get_timestamp(t, q))
        np.testing.assert_array_equal(days, [20000 & 0x1FFF, 20001 & 0x1FFF])

    def test_import_checkpoint_with_templates(self, ckpt):
        out = tf_import.import_checkpoint(ckpt["prefix"], {
            "emb": kv.create(8, 64),
            "wide": [kv.create(4, 64), kv.create(4, 64)],
        })
        got = np.asarray(kv.lookup_or_zeros(out["emb"], enc(ckpt["emb_keys"])))
        np.testing.assert_allclose(got, ckpt["emb_vals"], rtol=1e-6)
        assert isinstance(out["wide"], list) and len(out["wide"]) == 2

    def test_attach_slot_rows(self, ckpt):
        (t,) = tf_import.import_kv_variable(ckpt["prefix"], "emb")
        t = tf_import.attach_slot_rows(t, ckpt["prefix"], "emb/m_v", "m_v")
        fr = kv.find(t, enc(ckpt["emb_keys"]))
        idx = np.asarray(fr.slot)
        got = np.asarray(kv.get_slot(t, "m_v"))[idx]
        np.testing.assert_allclose(got, ckpt["slot_vals"], rtol=1e-6)

    def test_read_dense(self, ckpt):
        w = tf_import.read_dense(ckpt["prefix"], "dense/w")
        np.testing.assert_array_equal(w, np.arange(6).reshape(2, 3))

    def test_missing_variable_raises(self, ckpt):
        with pytest.raises(KeyError, match="nope"):
            tf_import.import_kv_variable(ckpt["prefix"], "nope")


class TestExportRoundtrip:
    """Bidirectional migration: tables exported with tf_export are genuine
    TF TensorBundles (read back by tf.train.load_checkpoint) and round-trip
    through tf_import exactly."""

    def _table(self):
        t = kv.create(8, 256, seed=0)
        raw = np.array([3, 11, 2**40, 7, 9], np.int64)
        q = kv.encode_ids_np_to_device(raw)
        rows = np.arange(40, dtype=np.float32).reshape(5, 8)
        t = kv.insert(t, q, jnp.asarray(rows),
                      freq=jnp.array([5, 6, 7, 8, 9], jnp.uint32),
                      blacklist=jnp.array([False, True, False, False, False]),
                      day=20000)
        return t, raw, rows

    def test_roundtrip_via_tf(self, tmp_path):
        from tfplus_tpu.checkpoint import tf_export, tf_import
        t, raw, rows = self._table()
        prefix = str(tmp_path / "export.ckpt-1")
        tf_export.export_checkpoint(prefix, {"emb": t},
                                    freq_use_uint32=True,
                                    as_of_unix_day=20005)
        # genuine bundle: TF reads it directly
        reader = tf.train.load_checkpoint(prefix)
        shapes = reader.get_variable_to_shape_map()
        assert set(shapes) >= {"emb-keys", "emb-values", "emb-init_table",
                               "emb-blacklist", "emb-freq_keys",
                               "emb-freq_values"}
        assert shapes["emb-values"] == [5, 8]
        # round-trip through the importer
        (t2,) = tf_import.import_kv_variable(prefix, "emb")
        q = kv.encode_ids_np_to_device(raw)
        got = np.asarray(kv.lookup_or_zeros(t2, q))
        want = np.asarray(kv.lookup_or_zeros(t, q))
        np.testing.assert_allclose(got, want, rtol=1e-6)   # incl. blacklist 0s
        np.testing.assert_array_equal(np.asarray(kv.get_count(t2, q)),
                                      np.asarray(kv.get_count(t, q)))
        np.testing.assert_array_equal(np.asarray(kv.get_timestamp(t2, q)),
                                      np.asarray(kv.get_timestamp(t, q)))

    def test_sharded_export_part_naming(self, tmp_path):
        from tfplus_tpu.checkpoint import tf_export
        t0, _, _ = self._table()
        t1 = kv.create(8, 256, seed=1)
        prefix = str(tmp_path / "sharded.ckpt-1")
        tf_export.export_checkpoint(prefix, {"emb": [t0, t1]},
                                    dense={"dnn/w": np.eye(2, dtype=np.float32)})
        reader = tf.train.load_checkpoint(prefix)
        shapes = reader.get_variable_to_shape_map()
        assert "emb/part_0-keys" in shapes and "emb/part_1-keys" in shapes
        np.testing.assert_array_equal(reader.get_tensor("dnn/w"), np.eye(2))

    def test_inference_mode_first_n3(self, tmp_path):
        from tfplus_tpu.checkpoint import tf_export
        from tfplus_tpu.checkpoint.saver import FIRST_N_INFERENCE
        t, _, _ = self._table()
        prefix = str(tmp_path / "infer.ckpt-1")
        tf_export.export_checkpoint(prefix, {"emb": t},
                                    first_n=FIRST_N_INFERENCE)
        shapes = tf.train.load_checkpoint(prefix).get_variable_to_shape_map()
        assert "emb-init_table" in shapes
        assert "emb-blacklist" not in shapes and "emb-freq_values" not in shapes


class TestServingTFPlusFormat:
    def test_export_for_serving_tfplus_format(self, tmp_path):
        """format='tfplus': the serving checkpoint is a genuine TensorBundle
        an existing TFPlus ranking service reads by tensor name."""
        from tfplus_tpu import serving
        t = kv.create(4, 128, seed=0)
        q = kv.encode_ids_np_to_device(np.arange(1, 20, dtype=np.int64))
        t = kv.insert(t, q, jnp.ones((19, 4)))
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="item", var_name="item_emb",
                                embedding_dim=4)
        d = str(tmp_path / "srv")
        prefix = serving.export_for_serving(d, {"item_emb": t}, md,
                                            format="tfplus")
        reader = tf.train.load_checkpoint(prefix)
        shapes = reader.get_variable_to_shape_map()
        # the metadata's advertised tensor names exist in the bundle
        meta = json.loads(open(d + "/rank_service_embedding.json").read())
        col = meta[serving.RANK_SERVICE_COLLECTION][0]
        for name in col["embedding_var_keys"] + col["embedding_var_values"]:
            assert name in shapes, name
        keys = reader.get_tensor("item_emb-keys")
        assert sorted(keys.tolist()) == list(range(1, 20))


class TestMigrationFuzz:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_tables_roundtrip(self, tmp_path, seed):
        """Random tables (random shard counts, freqs, days, blacklists)
        through tf_export -> TF bundle -> tf_import: exact state recovery."""
        from tfplus_tpu.checkpoint import tf_export, tf_import
        rng = np.random.RandomState(seed)
        n_shards = int(rng.randint(1, 4))
        dim = int(rng.choice([4, 8, 16]))
        shards, all_ids = [], []
        for s in range(n_shards):
            t = kv.create(dim, 512, seed=seed * 10 + s)
            ids = np.unique(rng.randint(1, 10**6, rng.randint(5, 80))
                            .astype(np.int64))
            ids = ids[ids % n_shards == s]
            if len(ids):
                black = rng.rand(len(ids)) < 0.2
                t = kv.insert(
                    t, kv.encode_ids_np_to_device(ids),
                    jnp.asarray(rng.randn(len(ids), dim).astype(np.float32)),
                    freq=jnp.asarray(rng.randint(1, 60000, len(ids))
                                     .astype(np.uint32)),
                    blacklist=jnp.asarray(black), day=20000 + seed)
            shards.append(t)
            all_ids.append(ids)
        prefix = str(tmp_path / f"fz{seed}.ckpt")
        tf_export.export_checkpoint(
            prefix, {"emb": shards if n_shards > 1 else shards[0]},
            freq_use_uint32=bool(seed % 2), as_of_unix_day=20010 + seed)
        # import to a DIFFERENT shard count (elastic)
        n_want = int(rng.randint(1, 5))
        out = tf_import.import_kv_variable(prefix, "emb", num_shards=n_want,
                                           capacity=512)
        for s, ids in enumerate(all_ids):
            if not len(ids):
                continue
            for key in ids:
                q = kv.encode_ids_np_to_device(np.array([key], np.int64))
                got = np.asarray(kv.lookup_or_zeros(out[int(key) % n_want], q))
                want = np.asarray(kv.lookup_or_zeros(shards[s], q))
                np.testing.assert_allclose(got[0], want[0], rtol=1e-6,
                                           err_msg=f"id {key}")
                assert (int(np.asarray(kv.get_count(out[int(key) % n_want],
                                                    q))[0])
                        == int(np.asarray(kv.get_count(shards[s], q))[0]))
