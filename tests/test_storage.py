"""Hybrid storage tier tests (kv/storage.py).

Reference analogue: StorageTableInterface / MemStorageTable / TableManager
tier indirection (hybrid_embedding/storage_table.h:41-196,
table_manager.h:45-544). The OSS drop ships the memory tier only; our second
tier is host DRAM, so these tests pin the tier-move invariants: a key lives
in exactly one tier, rows migrate with full payload (values + optimizer
slots) and packed meta intact, and checkpoints see the union.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfplus_tpu import kv, optim
from tfplus_tpu.kv import storage
from tfplus_tpu.utils import packing


def ids(*xs):
    return kv.encode_ids_np_to_device(np.array(xs, dtype=np.int64))


def u64(*xs):
    return np.array(xs, dtype=np.uint64)


def lookup_freqs(table, raw):
    return np.asarray(jax.device_get(kv.get_count(table, ids(*raw))))


class TestHostStorageTier:
    def test_put_take_roundtrip(self):
        t = storage.HostStorageTier(dim=4, payload_width=4)
        pay = np.arange(12, dtype=np.float32).reshape(3, 4)
        meta = np.array([1, 2, 3], np.uint32)
        t.put(u64(10, 20, 30), pay, meta)
        assert t.size == 3 and 20 in t and 99 not in t
        found, p, m = t.take(u64(20, 99, 10))
        np.testing.assert_array_equal(found, [True, False, True])
        np.testing.assert_array_equal(p[0], pay[1])
        np.testing.assert_array_equal(p[2], pay[0])
        assert m[0] == 2 and m[2] == 1
        assert t.size == 1  # take removes

    def test_upsert_overwrites(self):
        t = storage.HostStorageTier(dim=2, payload_width=2)
        t.put(u64(5), np.ones((1, 2), np.float32), np.array([7], np.uint32))
        t.put(u64(5), np.full((1, 2), 9.0, np.float32),
              np.array([8], np.uint32))
        assert t.size == 1
        _, p, m = t.lookup_rows(u64(5))
        assert p[0, 0] == 9.0 and m[0] == 8

    def test_arena_growth_and_recycle(self):
        t = storage.HostStorageTier(dim=2, payload_width=2)
        n = 5000  # > initial arena
        keys = np.arange(n, dtype=np.uint64)
        t.put(keys, np.random.randn(n, 2).astype(np.float32),
              np.arange(n, dtype=np.uint32))
        assert t.size == n
        t.delete(keys[:100])
        assert t.size == n - 100
        t.put(keys[:50], np.zeros((50, 2), np.float32),
              np.zeros((50,), np.uint32))
        assert t.size == n - 50

    def test_capacity_bound(self):
        t = storage.HostStorageTier(dim=2, payload_width=2, capacity=2)
        t.put(u64(1, 2), np.zeros((2, 2), np.float32),
              np.zeros((2,), np.uint32))
        with pytest.raises(RuntimeError):
            t.put(u64(3), np.zeros((1, 2), np.float32),
                  np.zeros((1,), np.uint32))

    def test_ensure_width_preserves_rows(self):
        t = storage.HostStorageTier(dim=2, payload_width=2)
        t.put(u64(1), np.array([[1.0, 2.0]], np.float32),
              np.array([0], np.uint32))
        t.ensure_width(6)
        _, p, _ = t.lookup_rows(u64(1))
        np.testing.assert_array_equal(p[0], [1, 2, 0, 0, 0, 0])


class TestSpillPrefetch:
    def _warm_table(self, dim=8, capacity=256):
        """Table with hot keys (freq 5) and cold keys (freq 1)."""
        table = kv.create(dim, capacity, seed=3)
        hot = np.arange(0, 8, dtype=np.int64)
        cold = np.arange(100, 108, dtype=np.int64)
        for _ in range(5):
            table = kv.lookup_or_insert(table, ids(*hot), day=10).table
        table = kv.lookup_or_insert(table, ids(*cold), day=10).table
        return table, hot, cold

    def test_spill_by_min_freq(self):
        table, hot, cold = self._warm_table()
        tier = storage.HostStorageTier(8, table.payload.shape[1])
        table, n = storage.spill(table, tier, min_freq=2)
        assert n == len(cold)
        assert tier.size == len(cold)
        # device no longer has the cold rows...
        z = np.asarray(jax.device_get(kv.lookup_or_zeros(table, ids(*cold))))
        np.testing.assert_array_equal(z, 0)
        # ...but still has the hot ones
        assert (lookup_freqs(table, hot) == 5).all()

    def test_spill_preserves_values_and_meta(self):
        dim = 4
        table = kv.create(dim, 256, seed=1)
        rows = np.arange(8, dtype=np.float32).reshape(2, 4)
        table = kv.insert(table, ids(7, 8), jnp.asarray(rows), day=42,
                          freq=jnp.array([3, 4], jnp.uint32))
        tier = storage.HostStorageTier(dim, table.payload.shape[1])
        table, n = storage.spill(table, tier, min_freq=100)  # spill all
        assert n == 2
        found, p, m = tier.lookup_rows(u64(7, 8))
        assert found.all()
        np.testing.assert_allclose(p[:, :dim], rows)
        np.testing.assert_array_equal(m & packing.FREQ_MASK, [3, 4])
        np.testing.assert_array_equal((m >> 16) & packing.DAY_MASK, [42, 42])

    def test_prefetch_restores_rows(self):
        table, hot, cold = self._warm_table()
        want = np.asarray(jax.device_get(
            kv.lookup_or_zeros(table, ids(*cold))))
        tier = storage.HostStorageTier(8, table.payload.shape[1])
        table, _ = storage.spill(table, tier, min_freq=2)
        table, n = storage.prefetch(table, tier, ids(*cold))
        assert n == len(cold) and tier.size == 0
        got = np.asarray(jax.device_get(kv.lookup_or_zeros(table, ids(*cold))))
        np.testing.assert_allclose(got, want)
        # freq survived the round trip
        assert (lookup_freqs(table, cold) == 1).all()

    def test_prefetch_unknown_ids_noop(self):
        table, hot, cold = self._warm_table()
        tier = storage.HostStorageTier(8, table.payload.shape[1])
        table, _ = storage.spill(table, tier, min_freq=2)
        table, n = storage.prefetch(table, tier, ids(5555, 6666))
        assert n == 0 and tier.size == len(cold)

    def test_spill_max_live_evicts_coldest(self):
        table, hot, cold = self._warm_table()
        tier = storage.HostStorageTier(8, table.payload.shape[1])
        table, n = storage.spill(table, tier, max_live=len(hot))
        assert n == len(cold)
        # all spilled keys are the cold (freq-1) ones
        spilled = set(int(k) for k in tier.live_rows()[0])
        assert spilled == set(int(c) for c in cold)

    def test_spill_by_age(self):
        dim = 4
        table = kv.create(dim, 256, seed=1)
        table = kv.lookup_or_insert(table, ids(1, 2), day=10).table
        table = kv.lookup_or_insert(table, ids(3, 4), day=50).table
        tier = storage.HostStorageTier(dim, table.payload.shape[1])
        table, n = storage.spill(table, tier, older_than_days=20, day=50)
        assert n == 2
        assert set(int(k) for k in tier.live_rows()[0]) == {1, 2}

    def test_spill_preserves_optimizer_slots(self):
        dim = 4
        opt = optim.SparseOptimizer(optim.rules.Adagrad())
        table = opt.init(kv.create(dim, 256, seed=2))
        res = kv.lookup_or_insert(table, ids(1, 2, 3))
        g = jnp.ones((3, dim)) * 0.5
        table = opt.apply(res.table, res.slot, g, lr=0.1, step=1)
        slot_before = np.asarray(jax.device_get(
            kv.get_slot(table, opt.slot_name)[
                jnp.where(kv.find(table, ids(1, 2, 3)).found,
                          kv.find(table, ids(1, 2, 3)).slot, 0)]))
        tier = storage.HostStorageTier(dim, table.payload.shape[1])
        table, _ = storage.spill(table, tier, min_freq=100)
        table, n = storage.prefetch(table, tier, ids(1, 2, 3))
        assert n == 3
        fr = kv.find(table, ids(1, 2, 3))
        slot_after = np.asarray(jax.device_get(
            kv.get_slot(table, opt.slot_name)[
                jnp.where(fr.found, fr.slot, 0)]))
        np.testing.assert_allclose(slot_after, slot_before)

    def test_prefetch_grows_table(self):
        dim = 4
        table = kv.create(dim, 32, seed=1)
        tier = storage.HostStorageTier(dim, dim)
        n = 64
        tier.put(np.arange(n, dtype=np.uint64),
                 np.random.randn(n, dim).astype(np.float32),
                 np.ones((n,), np.uint32))
        table, promoted = storage.prefetch(table, tier,
                                           np.arange(n, dtype=np.uint64))
        assert promoted == n
        assert table.capacity > 32
        assert int(jax.device_get(kv.size(table))) == n


class TestHybridCheckpoint:
    def test_export_union(self):
        dim = 4
        table = kv.create(dim, 256, seed=5)
        table = kv.lookup_or_insert(table, ids(1, 2, 3, 4)).table
        tier = storage.HostStorageTier(dim, table.payload.shape[1])
        table, _ = storage.spill(table, tier, max_live=2)
        ex = storage.export_hybrid_arrays(table, tier)
        assert set(ex["keys"].astype(np.int64)) == {1, 2, 3, 4}
        assert ex["values"].shape == (4, dim)
        assert ex["meta"].shape == (4,)

    def test_delta_export_includes_tier_rows(self):
        dim = 4
        table = kv.create(dim, 256, seed=5)
        table = kv.lookup_or_insert(table, ids(1, 2, 3, 4)).table
        tier = storage.HostStorageTier(dim, table.payload.shape[1])
        # spill 2 touched rows, then delta-export: both tiers contribute
        table, _ = storage.spill(table, tier, max_live=2)
        ex = storage.export_hybrid_arrays(table, tier, delta=True)
        assert set(ex["keys"].astype(np.int64)) == {1, 2, 3, 4}
        table = ex["table"]
        # second delta: nothing pending anywhere (both deltalists cleared)
        ex2 = storage.export_hybrid_arrays(table, tier, delta=True)
        assert ex2["keys"].size == 0

    def test_restore_hybrid_split(self):
        dim = 4
        table = kv.create(dim, 256, seed=5)
        # freq gradient: key k looked up k+1 times
        for k in range(4):
            for _ in range(k + 1):
                table = kv.lookup_or_insert(table, ids(k)).table
        tier0 = storage.HostStorageTier(dim, table.payload.shape[1])
        ex = storage.export_hybrid_arrays(table, tier0)
        template = kv.create(dim, 256, seed=5)
        tier = storage.HostStorageTier(dim, dim)
        restored = storage.restore_hybrid_split(template, tier, ex,
                                                max_live=2)
        assert int(jax.device_get(kv.size(restored))) == 2
        assert tier.size == 2
        # hot rows (highest freq = keys 2, 3) on device
        fr = kv.find(restored, ids(2, 3))
        assert np.asarray(jax.device_get(fr.found)).all()
        # cold rows promotable with exact values
        want = {int(k): v for k, v in
                zip(ex["keys"].astype(np.int64), ex["values"])}
        restored, n = storage.prefetch(restored, tier, u64(0, 1))
        assert n == 2
        got = np.asarray(jax.device_get(kv.lookup_or_zeros(restored, ids(0, 1))))
        np.testing.assert_allclose(got[0], want[0])
        np.testing.assert_allclose(got[1], want[1])

    def test_restore_hybrid_split_with_slots(self):
        dim = 4
        opt = optim.SparseOptimizer(optim.rules.Adagrad())
        table = opt.init(kv.create(dim, 256, seed=2))
        res = kv.lookup_or_insert(table, ids(1, 2, 3, 4))
        table = opt.apply(res.table, res.slot, jnp.ones((4, dim)),
                          lr=0.1, step=1)
        tier0 = storage.HostStorageTier(dim, table.payload.shape[1])
        ex = storage.export_hybrid_arrays(table, tier0)
        slots = {opt.slot_name: ex[f"slot-{opt.slot_name}"]}
        template = opt.init(kv.create(dim, 256, seed=2))
        tier = storage.HostStorageTier(dim, dim)
        restored = storage.restore_hybrid_split(template, tier, ex,
                                                max_live=2, slots=slots)
        restored, _ = storage.prefetch(
            restored, tier, ex["keys"].astype(np.uint64))
        q = kv.encode_ids_np_to_device(ex["keys"])
        fr = kv.find(restored, q)
        assert np.asarray(jax.device_get(fr.found)).all()
        got = np.asarray(jax.device_get(
            kv.get_slot(restored, opt.slot_name)[
                jnp.where(fr.found, fr.slot, 0)]))
        np.testing.assert_allclose(got, ex[f"slot-{opt.slot_name}"],
                                   rtol=1e-6)


class TestHybridTableProtocol:
    def test_train_loop_with_budget(self):
        """Standard protocol: prefetch(ids) -> jitted step -> maybe_spill.
        The device live count respects the budget while the logical table
        keeps every row."""
        dim = 8
        opt = optim.SparseOptimizer(optim.rules.Adagrad())
        ht = storage.HybridTable(opt.init(kv.create(dim, 512, seed=0)),
                                 max_live=64)

        @jax.jit
        def step(table, q, step_no):
            res = kv.lookup_or_insert(table, q)
            # toy loss: pull rows toward zero
            g = res.rows * 0.1
            return opt.apply(res.table, res.slot, g, lr=0.5, step=step_no)

        rng = np.random.RandomState(0)
        seen = set()
        for s in range(1, 9):
            raw = rng.randint(0, 400, size=32).astype(np.int64)
            seen.update(int(x) for x in np.unique(raw))
            q = kv.encode_ids_np_to_device(np.unique(raw))
            ht.prefetch(np.unique(raw).astype(np.uint64))
            ht.table = step(ht.table, q, s)
            ht.maybe_spill()
            dev_live = int(jax.device_get(kv.size(ht.table)))
            assert dev_live <= 64
        assert ht.logical_size == len(seen)
        st = ht.stats()
        assert st["logical_size"] == len(seen)

    def test_rows_keep_training_across_spills(self):
        """A row spilled and later promoted continues training from its
        exact state: two runs — one with spill/prefetch churn, one without —
        produce identical values."""
        dim = 4
        opt = optim.SparseOptimizer(optim.rules.Adam())

        def run(churn: bool):
            table = opt.init(kv.create(dim, 256, seed=9))
            tier = storage.HostStorageTier(dim, table.payload.shape[1])
            q = ids(11, 22, 33)
            for s in range(1, 6):
                if churn:
                    table, _ = storage.prefetch(
                        table, tier, u64(11, 22, 33))
                res = kv.lookup_or_insert(table, q)
                table = opt.apply(res.table, res.slot,
                                  jnp.full((3, dim), 0.25), lr=0.1, step=s)
                if churn:
                    table, _ = storage.spill(table, tier, max_live=0)
            if churn:
                table, _ = storage.prefetch(table, tier, u64(11, 22, 33))
            return np.asarray(jax.device_get(
                kv.lookup_or_zeros(table, q)))

        np.testing.assert_allclose(run(True), run(False), rtol=1e-6)


class TestAsyncPrefetcher:
    """Overlapped prefetch: tier extraction on a worker thread, device
    promotion between steps; drain() pushes staged rows back for export."""

    def _spilled(self):
        table = kv.create(8, 256, seed=0)
        cold = [10, 11, 12]
        hot = [1, 2]
        q = ids(*(cold + hot))
        rows = np.arange(5 * 8, dtype=np.float32).reshape(5, 8)
        table = kv.insert(table, q, jnp.asarray(rows),
                          freq=jnp.asarray([1, 1, 1, 9, 9], jnp.uint32))
        tier = storage.HostStorageTier(8, table.payload.shape[1])
        table, n = storage.spill(table, tier, min_freq=2)
        assert n == 3
        return table, tier, cold

    def test_submit_apply(self):
        table, tier, cold = self._spilled()
        want_tier_rows = tier.size
        pf = storage.AsyncPrefetcher(tier)
        pf.submit(np.asarray(cold + [9999], np.uint64))   # 9999 = miss, ok
        table, n = pf.apply(table)
        assert n == 3 and tier.size == want_tier_rows - 3
        got = np.asarray(kv.lookup_or_zeros(table, ids(*cold)))
        assert np.abs(got).sum() > 0
        # double-submit without apply is an error
        pf.submit(np.asarray([1], np.uint64))
        with pytest.raises(RuntimeError):
            pf.submit(np.asarray([2], np.uint64))
        pf.drain()

    def test_drain_returns_rows_to_tier(self):
        table, tier, cold = self._spilled()
        pf = storage.AsyncPrefetcher(tier)
        pf.submit(np.asarray(cold, np.uint64))
        assert pf.drain() == 3
        assert tier.size == 3                      # back in the tier
        table, n = storage.prefetch(table, tier, ids(*cold))
        assert n == 3

    def test_hybrid_wrapper_protocol(self):
        table, tier, cold = self._spilled()
        ht = storage.HybridTable(table, min_freq=2)
        ht.tier = tier                              # adopt the spilled tier
        ht.prefetch_async(np.asarray(cold, np.uint64))
        # (device step would run here, overlapped)
        assert ht.apply_prefetch() == 3
        got = np.asarray(kv.lookup_or_zeros(ht.table, ids(*cold)))
        assert np.abs(got).sum() > 0


class TestNpIndexVectorized:
    """The tier's key index is a vectorized numpy hash table — no per-key
    Python loops (round-1 weak spot: spilling 10⁵ rows stalled the input
    pipeline). Fuzz it against a Python dict."""

    def test_fuzz_against_dict(self):
        from tfplus_tpu.kv.storage import _NpIndex
        rng = np.random.RandomState(0)
        idx = _NpIndex(cap=64)        # force many rehashes
        ref = {}
        for round_i in range(30):
            keys = rng.randint(1, 5000, 400).astype(np.uint64)
            keys = np.unique(keys)
            vals = rng.randint(0, 1 << 30, len(keys)).astype(np.int64)
            op = round_i % 3
            if op in (0, 1):
                idx.put(keys, vals)
                ref.update(zip(keys.tolist(), vals.tolist()))
            else:
                found, got = idx.pop(keys)
                for k, f, v in zip(keys.tolist(), found, got):
                    if k in ref:
                        assert f and v == ref.pop(k)
                    else:
                        assert not f
            assert idx.live == len(ref)
            probe = rng.randint(1, 6000, 500).astype(np.uint64)
            found, got = idx.get(probe)
            for k, f, v in zip(probe.tolist(), found, got):
                if k in ref:
                    assert f and v == ref[k]
                else:
                    assert not f

    def test_bulk_spill_prefetch_100k(self):
        """100k-row tier moves complete quickly (vectorized, not 100k dict
        hits) and round-trip exactly."""
        import time
        from tfplus_tpu.kv.storage import HostStorageTier
        n = 100_000
        tier = HostStorageTier(dim=8)
        ids = np.arange(1, n + 1, dtype=np.uint64)
        pay = np.arange(n * 8, dtype=np.float32).reshape(n, 8)
        meta = np.arange(n, dtype=np.uint32)
        t0 = time.time()
        tier.put(ids, pay, meta)
        found, p2, m2 = tier.take(ids)
        dt = time.time() - t0
        assert found.all()
        np.testing.assert_array_equal(p2, pay)
        np.testing.assert_array_equal(m2, meta)
        assert tier.size == 0
        assert dt < 5.0, f"bulk tier moves too slow: {dt:.2f}s for {n} rows"


class TestQuantizedServing:
    """Int8 row-quantized serving tables (kv/quant.py) — beyond-reference
    memory capability: 4x less HBM per vocabulary at serving time."""

    def _trained(self, dim=16, n=200):
        from tfplus_tpu import train as tft
        t = kv.create(dim, 1024, seed=0)
        opt = tft.AdagradOptimizer()
        t = opt.init(t)
        ids = np.arange(1, n + 1, dtype=np.int64) * 3
        q = kv.encode_ids_np_to_device(ids)
        res = kv.lookup_or_insert(t, q)
        rng = np.random.RandomState(0)
        t = opt.apply(res.table, res.slot,
                      jnp.asarray(rng.randn(n, dim).astype(np.float32)),
                      lr=0.5, step=1)
        return t, q

    def test_dequantized_lookup_close_and_4x_smaller(self):
        from tfplus_tpu.kv import quant
        t, q = self._trained()
        qt = quant.quantize_table(t)
        full = np.asarray(kv.lookup_or_zeros(t, q), np.float32)
        deq = np.asarray(quant.lookup_or_zeros(qt, q))
        # symmetric int8: |err| <= max|row|/254 per element
        bound = np.abs(full).max(axis=1, keepdims=True) / 254.0 + 1e-7
        assert (np.abs(deq - full) <= bound).all()
        values_bytes = t.capacity * t.dim * 4
        assert qt.payload.nbytes <= values_bytes // 4
        assert quant.max_quant_error(t) <= np.abs(full).max() / 200

    def test_unknown_and_blacklisted_read_zero(self):
        from tfplus_tpu.kv import quant
        t, q = self._trained()
        bl = kv.encode_ids_np_to_device(np.array([3], np.int64))
        t = kv.insert(t, bl, jnp.ones((1, 16)), blacklist=jnp.array([True]))
        qt = quant.quantize_table(t)
        probe = kv.encode_ids_np_to_device(
            np.array([3, 999_999], np.int64))   # blacklisted, absent
        out = np.asarray(quant.lookup_or_zeros(qt, probe))
        np.testing.assert_array_equal(out, 0.0)

    def test_jits_and_shards_like_a_table(self):
        """Quantized lookup works under jit (static shapes, pure gather)."""
        from tfplus_tpu.kv import quant
        t, q = self._trained()
        qt = quant.quantize_table(t)
        f = jax.jit(lambda qt, q: quant.lookup_or_zeros(qt, q))
        np.testing.assert_allclose(np.asarray(f(qt, q)),
                                   np.asarray(quant.lookup_or_zeros(qt, q)))
