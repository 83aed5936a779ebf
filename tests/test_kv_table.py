"""Engine-level tests for tfplus_tpu.kv.table.

Mirrors the reference's C++ gtest (kv_variable_test.cc:68-457: InitRandomValues,
Find, InsertOrUpdate, Import/ExportValues, ScatterUpdate, stats, Delete) and
the raw-op python tests (py_ut/tests/test_kv_variable_ops.py:63-439).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfplus_tpu import kv
from tfplus_tpu.utils import packing


def ids(*xs):
    return kv.encode_ids_np_to_device(np.array(xs, dtype=np.int64))


def make_table(dim=8, capacity=256, **kw):
    return kv.create(dim, capacity, seed=7, **kw)


class TestHashing:
    def test_encode_decode_roundtrip(self):
        raw = np.array([0, 1, 2**31, 2**40 + 17, 2**63 + 5], dtype=np.uint64)
        enc = kv.encode_ids_np_to_device(raw)
        assert enc.shape == (5, 2)
        dec = kv.decode_ids_np(np.asarray(enc))
        np.testing.assert_array_equal(dec, raw)

    def test_int32_encode(self):
        enc = kv.encode_ids(jnp.array([3, 5, 7], dtype=jnp.int32))
        assert enc.shape == (3, 2)
        np.testing.assert_array_equal(np.asarray(enc[:, 1]), 0)

    def test_shard_of_matches_mod(self):
        raw = np.random.RandomState(0).randint(0, 2**63, size=100, dtype=np.int64)
        enc = kv.encode_ids_np_to_device(raw)
        for ns in (1, 2, 3, 4, 5, 8, 7):
            got = np.asarray(kv.shard_of(enc, ns))
            want = (raw.astype(np.uint64) % np.uint64(ns)).astype(np.int32)
            np.testing.assert_array_equal(got, want, err_msg=f"ns={ns}")

    def test_hash_spread(self):
        raw = np.arange(10000, dtype=np.int64)
        enc = kv.encode_ids_np_to_device(raw)
        pos = np.asarray(kv.hashing.probe_start(enc, 16384))
        # sequential ids should spread: no slot should collect many keys
        _, counts = np.unique(pos, return_counts=True)
        assert counts.max() <= 8


class TestUnique:
    def test_unique_with_counts(self):
        q = ids(5, 3, 5, 5, 9, 3)
        r = kv.unique_with_counts(q)
        n_u = int(r.num_unique)
        assert n_u == 3
        uk = kv.decode_ids_np(np.asarray(r.unique_keys[:n_u]))
        assert set(uk.tolist()) == {3, 5, 9}
        # inverse maps every input position back to its id
        inv = np.asarray(r.inverse)
        all_u = kv.decode_ids_np(np.asarray(r.unique_keys))
        np.testing.assert_array_equal(all_u[inv], [5, 3, 5, 5, 9, 3])
        counts = {int(k): int(c) for k, c in
                  zip(uk, np.asarray(r.counts)[:n_u])}
        assert counts == {5: 3, 3: 2, 9: 1}

    def test_unique_with_invalid(self):
        q = ids(5, 3, 5)
        valid = jnp.array([True, False, True])
        r = kv.unique_with_counts(q, valid)
        assert int(r.num_unique) == 1
        assert int(np.asarray(r.counts)[0]) == 2

    def test_unique_all_same(self):
        q = ids(*([42] * 16))
        r = kv.unique_with_counts(q)
        assert int(r.num_unique) == 1
        assert int(np.asarray(r.counts)[0]) == 16

    def test_unique_all_distinct(self):
        q = ids(*range(32))
        r = kv.unique_with_counts(q)
        assert int(r.num_unique) == 32
        np.testing.assert_array_equal(np.asarray(r.counts), 1)


class TestLookupInsert:
    def test_insert_on_miss_and_find(self):
        t = make_table()
        q = ids(10, 20, 30)
        res = kv.lookup_or_insert(t, q)
        assert not bool(res.overflow)
        assert int(kv.size(res.table)) == 3
        # rows come from init pool: (pool[r1]+pool[r2])/2, deterministic per key
        again = kv.lookup_or_zeros(res.table, q)
        np.testing.assert_allclose(np.asarray(res.rows), np.asarray(again),
                                   rtol=1e-6)

    def test_init_value_semantics(self):
        t = make_table()
        q = ids(123)
        res = kv.lookup_or_insert(t, q)
        pool = np.asarray(t.init_pool)
        r1, r2 = kv.hashing.init_row_indices(q, pool.shape[0])
        want = (pool[int(r1[0])] + pool[int(r2[0])]) / 2
        np.testing.assert_allclose(np.asarray(res.rows[0]), want, rtol=1e-6)

    def test_lookup_or_zeros_on_miss(self):
        t = make_table()
        out = kv.lookup_or_zeros(t, ids(1, 2, 3))
        np.testing.assert_array_equal(np.asarray(out), 0.0)
        assert int(kv.size(t)) == 0  # no mutation

    def test_lookup_with_init_no_insert(self):
        t = make_table()
        out = kv.lookup_with_init(t, ids(7))
        assert np.abs(np.asarray(out)).sum() > 0
        assert int(kv.size(t)) == 0

    def test_frequency_counting(self):
        t = make_table()
        q = ids(10, 20)
        res = kv.lookup_or_insert(t, q, counts=jnp.array([3, 1], jnp.int32))
        t = res.table
        res = kv.lookup_or_insert(t, q, counts=jnp.array([2, 5], jnp.int32))
        counts = np.asarray(kv.get_count(res.table, q))
        np.testing.assert_array_equal(counts, [5, 6])
        assert int(kv.sum_freq(res.table)) == 11

    def test_freq_saturates_uint16(self):
        t = make_table()
        q = ids(1)
        res = kv.lookup_or_insert(t, q, counts=jnp.array([70000], jnp.int32))
        assert int(kv.get_count(res.table, q)[0]) == 0xFFFF

    def test_day_timestamp(self):
        t = make_table()
        q = ids(4)
        res = kv.lookup_or_insert(t, q, day=12345)
        # day lives on a 13-bit ring (8192 days; packing.py) so the flag
        # bits fit in the same word — comparisons are wraparound-safe
        assert int(kv.get_timestamp(res.table, q)[0]) == 12345 % 8192

    def test_many_keys_no_overflow(self):
        t = kv.create(4, 1 << 13, seed=1)
        raw = np.random.RandomState(3).randint(0, 2**62, 3000, dtype=np.int64)
        raw = np.unique(raw)
        res = kv.lookup_or_insert(t, kv.encode_ids_np_to_device(raw))
        assert not bool(res.overflow)
        assert int(kv.size(res.table)) == len(raw)
        # every key findable afterwards
        fr = kv.find(res.table, kv.encode_ids_np_to_device(raw))
        assert bool(jnp.all(fr.found))

    def test_duplicate_input_requires_dedup(self):
        # engine contract: lookup_or_insert takes deduped keys; dedup first
        t = make_table()
        q = ids(9, 9, 9)
        u = kv.unique_with_counts(q)
        res = kv.lookup_or_insert(t, u.unique_keys, counts=u.counts,
                                  valid=~kv.hashing.is_empty(u.unique_keys))
        assert int(kv.size(res.table)) == 1
        assert int(kv.get_count(res.table, ids(9))[0]) == 3


class TestScatter:
    def test_insert_then_scatter_ops(self):
        t = make_table(dim=4)
        q = ids(1, 2)
        rows = jnp.array([[1., 2., 3., 4.], [5., 6., 7., 8.]])
        t = kv.insert(t, q, rows)
        got = np.asarray(kv.lookup_or_zeros(t, q))
        np.testing.assert_allclose(got, np.asarray(rows))

        t2 = kv.scatter(t, q, jnp.ones((2, 4)), "add")
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t2, q)),
                                   np.asarray(rows) + 1)
        t3 = kv.scatter(t, q, 2 * jnp.ones((2, 4)), "mul")
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t3, q)),
                                   np.asarray(rows) * 2)
        t4 = kv.scatter(t, q, jnp.full((2, 4), 4.0), "min")
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t4, q)),
                                   np.minimum(np.asarray(rows), 4.0))
        t5 = kv.scatter(t, q, jnp.full((2, 4), 4.0), "max")
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t5, q)),
                                   np.maximum(np.asarray(rows), 4.0))
        t6 = kv.scatter(t, q, jnp.full((2, 4), 100.0), "update")
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t6, q)), 100.0)

    def test_scatter_inserts_on_miss(self):
        t = make_table(dim=4)
        t = kv.scatter(t, ids(77), jnp.zeros((1, 4)), "add")
        assert int(kv.size(t)) == 1


class TestDelete:
    def test_delete_and_reinsert(self):
        t = make_table()
        q = ids(1, 2, 3)
        t = kv.lookup_or_insert(t, q).table
        t, deleted = kv.delete(t, ids(2))
        assert bool(deleted[0])
        assert int(kv.size(t)) == 2
        np.testing.assert_array_equal(np.asarray(kv.lookup_or_zeros(t, ids(2))), 0.0)
        # other keys still findable (tombstone keeps probe chains intact)
        fr = kv.find(t, ids(1, 3))
        assert bool(jnp.all(fr.found))
        # reinsert reuses tombstone
        t2 = kv.lookup_or_insert(t, ids(2)).table
        assert int(kv.size(t2)) == 3

    def test_delete_missing_is_noop(self):
        t = make_table()
        t, deleted = kv.delete(t, ids(42))
        assert not bool(deleted[0])

    def test_delete_with_timestamp(self):
        t = make_table()
        t = kv.lookup_or_insert(t, ids(1), day=100).table
        t = kv.lookup_or_insert(t, ids(2), day=110).table
        t, evicted = kv.delete_with_timestamp(t, threshold_days=5, day=110)
        assert int(evicted.sum()) == 1
        fr = kv.find(t, ids(1, 2))
        np.testing.assert_array_equal(np.asarray(fr.found), [False, True])

    def test_compact_after_heavy_delete(self):
        t = kv.create(4, 256, seed=2)
        raw = np.arange(100, dtype=np.int64)
        t = kv.lookup_or_insert(t, kv.encode_ids_np_to_device(raw)).table
        t, _ = kv.delete(t, kv.encode_ids_np_to_device(raw[:90]))
        t = kv.compact(t)
        assert int(kv.size(t)) == 10
        fr = kv.find(t, kv.encode_ids_np_to_device(raw[90:]))
        assert bool(jnp.all(fr.found))


class TestGrow:
    def test_grow_preserves_contents(self):
        t = kv.create(4, 128, seed=3)
        raw = np.arange(80, dtype=np.int64) * 7 + 1
        q = kv.encode_ids_np_to_device(raw)
        t = kv.lookup_or_insert(t, q, counts=jnp.full((80,), 2, jnp.int32)).table
        before = np.asarray(kv.lookup_or_zeros(t, q))
        assert kv.needs_grow(t, incoming=50)
        t = kv.grow(t)
        assert t.capacity == 256
        assert int(kv.size(t)) == 80
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t, q)), before)
        np.testing.assert_array_equal(np.asarray(kv.get_count(t, q)), 2)

    def test_grow_moves_slots(self):
        t = kv.create(4, 128, seed=3)
        t = kv.ensure_slots(t, {"m_v": 2})
        q = ids(5)
        res = kv.lookup_or_insert(t, q)
        t = res.table
        t = kv.set_slot_rows(t, "m_v", res.slot[:1],
                             jnp.arange(8.0).reshape(1, 8))
        t = kv.grow(t)
        fr = kv.find(t, q)
        np.testing.assert_allclose(np.asarray(t.slots["m_v"][int(fr.slot[0])]),
                                   np.arange(8.0))


class TestDoublingRehash:
    """The round-5 bucket-split doubling rehash (kv/table._rehash_double):
    one sort + one scatter instead of the multi-round claim loop. Must be
    a row-exact rebuild: every live row findable at the new capacity with
    identical payload, meta (freq/day/flags) and slot state; tombstones
    compacted away."""

    def test_matches_generic_rehash_semantics(self):
        from tfplus_tpu.kv import table as kvt
        rng = np.random.RandomState(0)
        for seed in range(4):
            t = kv.create(8, 512, seed=seed)
            t = kv.ensure_slots(t, {"acc": 1})
            n = 300
            raw = rng.randint(1, 1 << 60, n).astype(np.uint64)
            raw = np.unique(raw)
            q = kv.encode_ids_np_to_device(raw)
            t = kv.lookup_or_insert(
                t, q, counts=jnp.full((len(raw),), 3, jnp.int32)).table
            # delete a third (tombstones must compact away on growth)
            dead = q[::3]
            t, _ = kvt.delete(t, dead)
            live = np.asarray(
                [i for i in range(len(raw)) if i % 3 != 0], np.int64)
            q_live = q[live]
            vals_before = np.asarray(kv.lookup_or_zeros(t, q_live))
            cnt_before = np.asarray(kv.get_count(t, q_live))
            size_before = int(kv.size(t))

            fast = kvt._rehash_double(t, t.capacity * 2)
            generic = kvt._rehash(t, t.capacity * 2)
            for out, name in ((fast, "fast"), (generic, "generic")):
                assert out.capacity == t.capacity * 2, name
                assert int(kv.size(out)) == size_before, name
                np.testing.assert_allclose(
                    np.asarray(kv.lookup_or_zeros(out, q_live)),
                    vals_before, err_msg=name)
                np.testing.assert_array_equal(
                    np.asarray(kv.get_count(out, q_live)), cnt_before,
                    err_msg=name)
                # deleted keys stay gone
                fr = kv.find(out, dead)
                assert not bool(np.asarray(fr.found).any()), name

    def test_chained_doublings_via_grow_to_fit(self):
        from tfplus_tpu.kv import table as kvt
        t = kv.create(4, 128, seed=1)
        q = kv.encode_ids_np_to_device(
            (np.arange(70, dtype=np.int64) * 13 + 5))
        t = kv.lookup_or_insert(t, q).table
        before = np.asarray(kv.lookup_or_zeros(t, q))
        t = kvt.grow_to_fit(t, incoming=600)     # needs 2 doublings
        assert t.capacity == 1024
        assert int(kv.size(t)) == 70
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(t, q)), before)


class TestDuplicateMissSafety:
    def test_duplicate_misses_claim_one_slot(self):
        """Duplicated keys in one batch must not claim two slots: twins
        probe in lockstep, the claim loser adopts the winner's slot."""
        t = make_table()
        ids = np.array([7, 7, 7, 9, 9, 3], np.uint64)
        q = kv.encode_ids_np_to_device(ids)
        res = kv.lookup_or_insert(t, q)
        assert int(kv.size(res.table)) == 3
        sl = np.asarray(res.slot)
        assert sl[0] == sl[1] == sl[2]
        assert sl[3] == sl[4]
        t2 = kv.insert(make_table(), q, jnp.ones((6, make_table().dim)))
        assert int(kv.size(t2)) == 3


class TestBlacklist:
    def test_blacklist_reads_zero(self):
        t = make_table(dim=4)
        q = ids(1)
        t = kv.insert(t, q, jnp.ones((1, 4)),
                      blacklist=jnp.array([True]))
        np.testing.assert_array_equal(np.asarray(kv.lookup_or_zeros(t, q)), 0.0)
        # still counted as a live row
        assert int(kv.size(t)) == 1

    def test_scatter_clears_blacklist(self):
        t = make_table(dim=4)
        q = ids(1)
        t = kv.insert(t, q, jnp.ones((1, 4)), blacklist=jnp.array([True]))
        t = kv.scatter(t, q, jnp.full((1, 4), 3.0), "update")
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t, q)), 3.0)


class TestExportImport:
    def test_export_import_roundtrip(self):
        t = make_table(dim=4, capacity=128)
        raw = np.array([3, 11, 2**40], dtype=np.int64)
        q = kv.encode_ids_np_to_device(raw)
        rows = jnp.arange(12.0).reshape(3, 4)
        t = kv.insert(t, q, rows, freq=jnp.array([5, 6, 7], jnp.uint32), day=9)
        ex = kv.export_arrays(t)
        assert set(ex["keys"].tolist()) == {3, 11, 2**40}
        assert ex["values"].shape == (3, 4)
        assert ex["init_table"].shape == t.init_pool.shape

        t2 = make_table(dim=4, capacity=128)
        t2 = kv.import_arrays(t2, ex)
        np.testing.assert_allclose(np.asarray(kv.lookup_or_zeros(t2, q)),
                                   np.asarray(kv.lookup_or_zeros(t, q)))
        np.testing.assert_array_equal(np.asarray(kv.get_count(t2, q)),
                                      np.asarray(kv.get_count(t, q)))
        np.testing.assert_array_equal(np.asarray(kv.get_timestamp(t2, q)),
                                      np.asarray(kv.get_timestamp(t, q)))

    def test_export_cutoff(self):
        t = make_table(dim=4)
        q = ids(1, 2)
        rows = jnp.array([[0.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]])
        t = kv.insert(t, q, rows)
        ex = kv.export_arrays(t, enable_cutoff=True, cutoff_value=1e-20)
        assert set(ex["keys"].tolist()) == {2}

    def test_blacklist_survives_roundtrip(self):
        t = make_table(dim=4)
        q = ids(1, 2)
        t = kv.insert(t, q, jnp.ones((2, 4)),
                      blacklist=jnp.array([True, False]))
        ex = kv.export_arrays(t)
        assert ex["blacklist"].tolist() == [1]
        t2 = kv.import_arrays(make_table(dim=4), ex)
        out = np.asarray(kv.lookup_or_zeros(t2, q))
        np.testing.assert_array_equal(out[0], 0.0)
        np.testing.assert_array_equal(out[1], 1.0)

    def test_import_grows_when_small(self):
        t = kv.create(4, 32, seed=0)
        raw = np.arange(100, dtype=np.int64)
        big = kv.create(4, 256, seed=0)
        big = kv.lookup_or_insert(big, kv.encode_ids_np_to_device(raw)).table
        ex = kv.export_arrays(big)
        t = kv.import_arrays(t, ex)
        assert int(kv.size(t)) == 100
        assert t.capacity >= 128

    def test_delta_export(self):
        t = make_table(dim=4)
        t = kv.insert(t, ids(1, 2), jnp.ones((2, 4)))
        ex = kv.export_arrays(t, delta=True)
        assert set(ex["keys"].tolist()) == {1, 2}
        t = ex["table"]  # deltalist cleared
        ex2 = kv.export_arrays(t, delta=True)
        assert ex2["keys"].size == 0
        # new touch re-enters the deltalist
        t = kv.scatter(t, ids(2), jnp.ones((1, 4)), "add")
        ex3 = kv.export_arrays(t, delta=True)
        assert set(ex3["keys"].tolist()) == {2}
        # full export unaffected
        assert set(kv.export_arrays(t)["keys"].tolist()) == {1, 2}

    def test_delta_import_upsert(self):
        t = make_table(dim=4)
        t = kv.insert(t, ids(1, 2), jnp.ones((2, 4)))
        delta = {"keys": np.array([2, 3], np.uint64),
                 "values": np.array([[5.0] * 4, [6.0] * 4], np.float32)}
        t = kv.import_arrays(t, delta, clear=False,
                             delete_keys=np.array([1], np.uint64))
        out = np.asarray(kv.lookup_or_zeros(t, ids(1, 2, 3)))
        np.testing.assert_array_equal(out[0], 0.0)
        np.testing.assert_array_equal(out[1], 5.0)
        np.testing.assert_array_equal(out[2], 6.0)


class TestJit:
    def test_lookup_jits_and_donates(self):
        t = make_table(dim=8, capacity=256)

        @jax.jit
        def step(t, q):
            res = kv.lookup_or_insert(t, q)
            return res.rows, res.table

        q = ids(5, 6, 7)
        rows, t = step(t, q)
        rows2, t = step(t, q)
        np.testing.assert_allclose(np.asarray(rows), np.asarray(rows2), rtol=1e-6)
        assert int(kv.size(t)) == 3


class TestHalfPrecisionTables:
    """Half-width value dtypes halve table HBM; rows/payload stay in the
    narrow dtype, checkpoints upcast values to f32 (reference format
    contract). The reference registers BOTH half kernels
    (kv_variable_ops.cc:153-156 — Eigen::half) — cover bfloat16 AND
    float16 (VERDICT r4 missing #4)."""

    @pytest.mark.parametrize("vdt", ["bfloat16", "float16"])
    def test_half_train_and_roundtrip(self, vdt):
        import jax.numpy as jnp
        from tfplus_tpu import train

        dtype = jnp.dtype(vdt)
        t = kv.create(8, 512, value_dtype=dtype)
        opt = train.AdagradOptimizer()
        t = opt.init(t)
        q = kv.encode_ids_np_to_device(np.arange(50, dtype=np.int64))
        u = kv.unique_with_counts(q)
        res = kv.lookup_or_insert(t, u.unique_keys, counts=u.counts)
        assert res.rows.dtype == dtype
        t = opt.apply(res.table, res.slot,
                      jnp.ones((50, 8), jnp.float32) * 0.1, lr=0.1, step=1)
        assert t.payload.dtype == dtype
        ex = kv.export_arrays(t)
        assert ex["values"].dtype == np.float32
        t2 = opt.init(kv.create(8, 512, value_dtype=dtype))
        t2 = kv.import_arrays(t2, ex)
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(t2, q), np.float32),
            np.asarray(kv.lookup_or_zeros(t, q), np.float32))

    def test_fp16_grow_preserves_rows(self):
        import jax.numpy as jnp
        t = kv.create(4, 64, value_dtype=jnp.float16, max_probes=4)
        q = kv.encode_ids_np_to_device(np.arange(1, 40, dtype=np.int64))
        res = kv.lookup_or_insert(t, q)
        t = res.table
        before = np.asarray(res.rows, np.float32)
        t = kv.grow(t, t.capacity * 2)
        assert t.payload.dtype == jnp.float16
        np.testing.assert_array_equal(
            np.asarray(kv.lookup_or_zeros(t, q), np.float32), before)


class TestImportNeverLosesRows:
    def test_bucket_collision_import_grows(self):
        """A user-facing insert may drop placements on bucket overflow (by
        contract), but a checkpoint restore must NEVER lose rows: import
        grows (dispersing the colliding buckets) and retries."""
        from collections import defaultdict
        from tfplus_tpu.kv import hashing
        import jax.numpy as jnp

        cap = 512
        ids = np.arange(1, 300_000, dtype=np.int64)
        b1, b2 = hashing.bucket_choices(hashing.encode_ids(ids), cap)
        groups = defaultdict(list)
        b1 = np.asarray(b1); b2 = np.asarray(b2)
        for i in range(len(ids)):
            groups[(int(b1[i]), int(b2[i]))].append(int(ids[i]))
        members = max(groups.values(), key=len)
        assert len(members) >= 36, "collision search failed"
        collide = np.asarray(members[:40], np.int64)

        t = kv.insert(kv.create(8, cap, seed=0),
                      kv.encode_ids(collide), jnp.ones((40, 8)))
        assert int(kv.size(t)) < 40          # the documented drop contract

        data = {"keys": collide.astype(np.uint64),
                "values": np.arange(40 * 8, dtype=np.float32).reshape(40, 8)}
        t2 = kv.import_arrays(kv.create(8, cap, seed=1), data)
        assert int(kv.size(t2)) == 40
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(t2, kv.encode_ids(collide))),
            data["values"])


class TestAdviceFixes:
    def test_max_probes_validated(self):
        """Probe rounds beyond the two candidate buckets would place keys in
        slots find() never scans (lost rows) — rejected at construction."""
        with pytest.raises(ValueError, match="max_probes"):
            kv.create(4, 64, max_probes=33)
        with pytest.raises(ValueError, match="max_probes"):
            kv.create(4, 64, max_probes=0)
        kv.create(4, 64, max_probes=32)  # boundary ok

    def test_sum_freq_exceeds_int32(self):
        """Σfreq must not overflow int32 (the reference returns 64-bit)."""
        n = 40_000
        t = kv.create(4, 1 << 16, seed=0)
        q = kv.encode_ids_np_to_device(np.arange(1, n + 1, dtype=np.int64))
        t = kv.insert(t, q, jnp.zeros((n, 4)),
                      freq=jnp.full((n,), 65535, jnp.uint32))
        n_live = int(kv.size(t))           # a few rows may drop on overflow
        total = kv.sum_freq(t)
        assert total == n_live * 65535     # ≈2.62e9 > 2**31
        assert total > 2**31

    def test_export_reconstructs_unix_day(self):
        """The in-table day is a 13-bit ring; the exported reference word
        must carry the FULL unix day (today − ring age), not the ring."""
        t = make_table(dim=4)
        q = ids(1, 2)
        # stamped 5 days before "today" = unix day 20005
        t = kv.insert(t, q, jnp.ones((2, 4)), day=20000)
        ex = kv.export_arrays(t, as_of_unix_day=20005)
        days = np.asarray(ex["meta"]) >> 16
        np.testing.assert_array_equal(days, [20000, 20000])
        # and the round-trip preserves the ring timestamp
        t2 = kv.import_arrays(make_table(dim=4), ex)
        np.testing.assert_array_equal(np.asarray(kv.get_timestamp(t2, q)),
                                      np.asarray(kv.get_timestamp(t, q)))


class TestReviewRound3:
    """Core-engine review findings (pinned)."""

    def test_insert_preserves_existing_freq_and_day(self):
        """The reference's InsertOrUpdate writes the VALUE only
        (kv_variable.h:458-464): upserting a hot row must not reset its
        frequency (enter_threshold would re-filter it) or its last-touch
        day (TTL eviction would reap it)."""
        t = make_table(enter_threshold=0)
        q = ids(7)
        # build freq=5, day=100 via counted lookups at day 100
        res = kv.lookup_or_insert(t, q, counts=jnp.array([5], jnp.int32),
                                  day=100)
        t = res.table
        assert int(kv.get_count(t, q)[0]) == 5
        t = kv.insert(t, q, jnp.ones((1, 8)) * 3.0)     # hot-patch value
        assert int(kv.get_count(t, q)[0]) == 5, "freq reset by upsert"
        assert int(kv.get_timestamp(t, q)[0]) == 100, "day reset by upsert"
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(t, q)), 3.0)
        # NEW rows still stamp freq=1 / the given day
        t = kv.insert(t, ids(8), jnp.ones((1, 8)), day=200)
        assert int(kv.get_count(t, ids(8))[0]) == 1
        assert int(kv.get_timestamp(t, ids(8))[0]) == 200

    def test_dual_stream_delta_deletions(self):
        """With support_prediction_delta, a deletion must reach BOTH delta
        streams (the reference copies train_deltalist_ into
        prediction_deltalist_ on export, dynamic_save.hpp:186-191); the
        shared-ring design used to let the first stream's export wipe the
        other stream's deletions."""
        t = make_table(support_prediction_delta=True)
        q = ids(1, 2, 3)
        t = kv.insert(t, q, jnp.ones((3, 8)))
        t, _ = kv.delete(t, ids(2))
        out_t = kv.export_arrays(t, delta=True, deltalist="train")
        assert list(out_t["delete_keys"]) == [2]
        t = out_t["table"]
        # the pred stream STILL sees the deletion afterwards
        out_p = kv.export_arrays(t, delta=True, deltalist="pred")
        assert list(out_p["delete_keys"]) == [2]
        t = out_p["table"]
        # both consumed -> ring compacted empty; later deletions start fresh
        assert int(jax.device_get(t.deleted_count)) == 0
        t, _ = kv.delete(t, ids(3))
        out_t2 = kv.export_arrays(t, delta=True, deltalist="train")
        assert list(out_t2["delete_keys"]) == [3]

    def test_single_stream_delta_unchanged(self):
        """Default (support_prediction_delta off): the ring clears on any
        delta export — the reference with the flag off."""
        t = make_table()
        q = ids(1, 2)
        t = kv.insert(t, q, jnp.ones((2, 8)))
        t, _ = kv.delete(t, ids(1))
        out = kv.export_arrays(t, delta=True, deltalist="train")
        assert list(out["delete_keys"]) == [1]
        t = out["table"]
        assert int(jax.device_get(t.deleted_count)) == 0
        out2 = kv.export_arrays(t, delta=True, deltalist="pred")
        assert list(out2["delete_keys"]) == []
