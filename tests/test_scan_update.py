"""scan_update kernel tests (interpreter mode): streaming optimizer
application must match the scatter path exactly, including metadata
(freq/day/touch), group-lasso blacklist bits, and the frequency filter."""
import numpy as np, jax, jax.numpy as jnp
from tfplus_tpu import kv, train as tft
from tfplus_tpu.ops import scan_update
from tfplus_tpu.utils import packing


def test_scan_update_full_semantics():

    C, D, N = 2048, 8, 300
    rng = np.random.RandomState(0)
    opt = tft.AdagradOptimizer()
    t = kv.create(D, C, seed=0)
    t = opt.init(t)
    ids = kv.encode_ids_np_to_device(
        rng.choice(10**6, N, replace=False).astype(np.int64))
    t = kv.insert(t, ids, jnp.asarray(rng.randn(N, D).astype(np.float32)),
                  freq=jnp.full((N,), 4, jnp.uint32), day=100)
    res = kv.lookup_or_insert(t, ids, day=100)
    t = res.table
    slot = res.slot
    grads = jnp.asarray(rng.randn(N, D).astype(np.float32))
    counts = jnp.asarray(rng.randint(1, 4, N).astype(np.int32))

    # reference: scatter-path apply
    t_ref = opt.apply(t, slot, grads, lr=0.1, step=3)

    # scan path
    po, meta = scan_update.scan_apply(
        t.payload, t.meta, slot, grads, None,
        opt.rule, dim=D, lr=0.1, step=3, day=105, enter_threshold=0,
        interpret=True)

    np.testing.assert_allclose(np.asarray(po), np.asarray(t_ref.payload),
                               rtol=1e-5, atol=1e-6)
    print("values+state match scatter path")

    # meta: freq +1 per touched row, day=105, touch bits set
    fr = kv.find(t, ids)
    sl = np.asarray(fr.slot)
    m = np.asarray(meta)[sl]
    assert np.all((m & 0xFFFF) == 6), (m & 0xFFFF)[:5]  # 4 insert +1 lookup +1 scan
    assert np.all(((m >> 16) & 0x1FFF) == 105)
    assert np.all(m & np.uint32(1 << 30)), "touch_train set"
    print("meta/flags OK")

    # group adam blacklist flows through
    opt2 = tft.GroupAdamOptimizer(l21_regularization_strength=100.0)
    t2 = kv.create(D, C, seed=0); t2 = opt2.init(t2)
    t2 = kv.insert(t2, ids, jnp.full((N, D), 0.01))
    res2 = kv.lookup_or_insert(t2, ids)
    t2 = res2.table
    tiny = jnp.full((N, D), 1e-6)
    ref2 = opt2.apply(t2, res2.slot, tiny, lr=0.01, step=1)
    po2, meta2 = scan_update.scan_apply(
        t2.payload, t2.meta, res2.slot, tiny,
        None, opt2.rule, dim=D, lr=0.01, step=1, day=0, enter_threshold=0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(po2)[:, :D], np.asarray(ref2.values),
                               rtol=1e-5, atol=1e-7)
    sl2 = np.asarray(kv.find(t2, ids).slot)
    assert np.all(np.asarray(meta2)[sl2] & np.uint32(1 << 29)), "blacklist bits set"
    print("group adam blacklist OK")

    # freq filter: thr=10 > freq -> untouched rows
    po3, _ = scan_update.scan_apply(
        t.payload, t.meta, slot, grads, None,
        opt.rule, dim=D, lr=0.1, step=3, day=105, enter_threshold=10,
        interpret=True)
    np.testing.assert_allclose(np.asarray(po3), np.asarray(t.payload))
    print("freq filter OK")
    print("ALL SCAN TESTS PASSED")


def test_scan_rejects_bf16_tables():
    """The scan kernel's out payload is aliased to the input, so it cannot
    change dtype; bf16 tables must get a clear error, not silent corruption."""
    import pytest
    opt = tft.AdagradOptimizer()
    t = opt.init(kv.create(8, 512, value_dtype=jnp.bfloat16))
    ids = kv.encode_ids_np_to_device(np.arange(1, 9, dtype=np.int64))
    res = kv.lookup_or_insert(t, ids)
    with pytest.raises(ValueError, match="float32"):
        opt.apply(res.table, res.slot, jnp.ones((8, 8), jnp.float32),
                  lr=0.1, step=1, use_scan=True)


def test_calibration_gated_routing(monkeypatch):
    """apply(use_scan=None) routes to the scan kernel ONLY when a
    calibration run measured it faster for this table shape (PERF.md:
    remote-compile variance makes static routing untrustworthy)."""
    import pytest
    from tfplus_tpu.ops import scan_update as su
    opt = tft.AdagradOptimizer()
    t = opt.init(kv.create(8, 1024, seed=0))
    ids = kv.encode_ids_np_to_device(np.arange(1, 600, dtype=np.int64))
    res = kv.lookup_or_insert(t, ids)
    n = 599

    # default: no calibration -> scatter path everywhere
    assert su.routed(res.table, n, opt.rule) is False

    # calibrate measures both paths and caches a decision for the shape
    su._CALIB_CACHE.clear()
    out = su.calibrate(res.table, n, opt, reps=1)
    assert set(out) >= {"scatter_s", "scan_s", "use_scan", "key"}
    assert out["key"] in su._CALIB_CACHE

    # off-TPU the gate stays closed regardless of the cache...
    su._CALIB_CACHE[out["key"]] = True
    assert su.routed(res.table, n, opt.rule) is False
    # ...and opens on TPU for calibrated shapes (suitability respected)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    want = su.suitable(res.table.capacity, n, 8, 1, False)
    assert su.routed(res.table, n, opt.rule) is want
    # bf16 tables never route to the scan kernel (aliased f32 output)
    tb = tft.AdagradOptimizer().init(
        kv.create(8, 1024, value_dtype=jnp.bfloat16))
    assert su.routed(tb, n, opt.rule) is False
    su._CALIB_CACHE.clear()
