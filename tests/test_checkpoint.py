"""Checkpoint tests: bundle integrity, logical-tensor contract, saver modes,
delta lineage, elastic repartition. Mirrors the reference's checkpoint
behaviours (SURVEY.md §3.4/3.5, dynamic_save/restore, checkpoint_manager)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tfplus_tpu import kv, train as tft
from tfplus_tpu import checkpoint as ckpt
from tfplus_tpu.checkpoint import bundle, saver


def enc(arr):
    return kv.encode_ids_np_to_device(np.asarray(arr, dtype=np.int64))


def make_table(dim=4, capacity=256, n_rows=10, seed=0, slot=None):
    t = kv.create(dim, capacity, seed=seed)
    ids = np.arange(1, n_rows + 1, dtype=np.int64) * 3
    rows = np.arange(n_rows * dim, dtype=np.float32).reshape(n_rows, dim)
    t = kv.insert(t, enc(ids), jnp.asarray(rows),
                  freq=jnp.full((n_rows,), 7, jnp.uint32), day=5)
    if slot:
        t = kv.ensure_slots(t, {slot: 2})
    return t, ids, rows


class TestBundle:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "b")
        with bundle.BundleWriter(p, num_shards=2) as w:
            w.add("a", np.arange(10, dtype=np.float32))
            w.add("b", np.arange(6, dtype=np.int32).reshape(2, 3))
            w.add_header("c", np.float64, (4,))
            w.append_segment(np.array([1.0, 2.0]))
            w.append_segment(np.array([3.0, 4.0]))
            w.end_segment()
        r = bundle.BundleReader(p)
        assert set(r.keys()) == {"a", "b", "c"}
        np.testing.assert_array_equal(r.lookup("b"),
                                      np.arange(6).reshape(2, 3))
        np.testing.assert_array_equal(r.lookup("c"), [1.0, 2.0, 3.0, 4.0])

    def test_crc_detects_corruption(self, tmp_path):
        p = str(tmp_path / "b")
        with bundle.BundleWriter(p) as w:
            w.add("x", np.arange(100, dtype=np.float32))
        fn = bundle.data_filename(p, 0, 1)
        with open(fn, "r+b") as f:
            f.seek(13)
            f.write(b"\xFF")
        with pytest.raises(IOError, match="CRC"):
            bundle.BundleReader(p).lookup("x")

    def test_partial_row_read(self, tmp_path):
        p = str(tmp_path / "b")
        arr = np.arange(20, dtype=np.float32).reshape(5, 4)
        with bundle.BundleWriter(p) as w:
            w.add("t", arr)
        r = bundle.BundleReader(p)
        np.testing.assert_array_equal(r.lookup_slice("t", 2, 2), arr[2:4])

    def test_bad_stream_length_raises(self, tmp_path):
        p = str(tmp_path / "b")
        w = bundle.BundleWriter(p)
        w.add_header("x", np.float32, (4,))
        w.append_segment(np.array([1.0], np.float32))
        with pytest.raises(ValueError, match="bytes"):
            w.end_segment()

    def test_big_endian_input_canonicalised(self, tmp_path):
        """Writer byte-swaps BE arrays to the LE on-disk contract
        (reference byte_swap.{h,cc} portability)."""
        p = str(tmp_path / "b")
        vals = np.arange(6, dtype=">f4").reshape(2, 3)
        stream = np.arange(4, dtype=">i4")
        with bundle.BundleWriter(p) as w:
            w.add("x", vals)
            w.add_header("y", np.dtype(">i4"), (4,))
            w.append_segment(stream)
            w.end_segment()
        r = bundle.BundleReader(p)
        # index declares little-endian; reads come back native
        assert r.dtype("x") == np.dtype("<f4")
        assert r.dtype("y") == np.dtype("<i4")
        got = r.lookup("x")
        assert got.dtype.isnative
        np.testing.assert_array_equal(got, vals.astype("<f4"))
        np.testing.assert_array_equal(r.lookup("y"), [0, 1, 2, 3])
        np.testing.assert_array_equal(r.lookup_slice("x", 1, 1),
                                      vals[1:2].astype("<f4"))

    def test_legacy_big_endian_bundle_reads_native(self, tmp_path):
        """A bundle whose index declares BE data (written on a BE host by a
        pre-canonicalisation writer) reads back native via byte swap."""
        import json
        import zlib
        p = str(tmp_path / "b")
        arr = np.array([[1, 2], [300, 70000]], dtype=">i4")
        buf = arr.tobytes()
        with open(bundle.data_filename(p, 0, 1), "wb") as f:
            f.write(buf)
        index = {"version": 1, "num_shards": 1, "tensors": {
            "t": {"shard": 0, "offset": 0, "dtype": ">i4",
                  "shape": [2, 2], "nbytes": len(buf),
                  "crc32": zlib.crc32(buf) & 0xFFFFFFFF}}}
        with open(bundle.index_filename(p), "w") as f:
            json.dump(index, f)
        got = bundle.BundleReader(p).lookup("t")
        assert got.dtype.isnative
        np.testing.assert_array_equal(got, [[1, 2], [300, 70000]])


class TestSaverContract:
    def test_logical_tensor_names(self, tmp_path):
        t, ids, rows = make_table()
        p = str(tmp_path / "c")
        saver.save(p, {"emb": t})
        r = bundle.BundleReader(p)
        for suffix in ("-keys", "-values", "-init_table", "-blacklist",
                       "-freq_keys", "-freq_values"):
            assert "emb" + suffix in r, suffix

    def test_inference_mode_first_n3(self, tmp_path):
        """set_tfplus_saver_mode(0) → only keys/values/init_table."""
        t, *_ = make_table()
        p = str(tmp_path / "c")
        saver.save(p, {"emb": t}, first_n=saver.FIRST_N_INFERENCE)
        r = bundle.BundleReader(p)
        assert "emb-init_table" in r
        assert "emb-blacklist" not in r and "emb-freq_values" not in r

    def test_full_roundtrip_with_dense(self, tmp_path):
        t, ids, rows = make_table()
        dense = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
        p = str(tmp_path / "c")
        saver.save(p, {"emb": t}, dense)
        t2, dense2 = saver.restore(
            p, {"emb": kv.create(4, 256, seed=9)},
            {"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))})
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(t2["emb"], enc(ids))), rows)
        np.testing.assert_array_equal(np.asarray(kv.get_count(t2["emb"], enc(ids))), 7)
        np.testing.assert_array_equal(np.asarray(kv.get_timestamp(t2["emb"], enc(ids))), 5)
        np.testing.assert_allclose(np.asarray(dense2["w"]),
                                   np.arange(6.0).reshape(2, 3))

    def test_optimizer_slots_roundtrip(self, tmp_path):
        """Train-resume: slot state must survive save/restore."""
        t, ids, rows = make_table()
        opt = tft.AdamOptimizer()
        t = opt.init(t)
        res = kv.lookup_or_insert(t, enc(ids))
        g = jnp.ones((len(ids), 4))
        t = opt.apply(res.table, res.slot, g, lr=0.01, step=1)
        p = str(tmp_path / "c")
        saver.save(p, {"emb": t})
        t2, _ = saver.restore(p, {"emb": opt.init(kv.create(4, 256, seed=9))})
        t2 = t2["emb"]
        fr1 = kv.find(t, enc(ids))
        fr2 = kv.find(t2, enc(ids))
        s1 = np.asarray(t.slots["m_v"])[np.asarray(fr1.slot)]
        s2 = np.asarray(t2.slots["m_v"])[np.asarray(fr2.slot)]
        np.testing.assert_allclose(s2, s1, rtol=1e-6)
        # resumed training continues identically
        res1 = kv.lookup_or_insert(t, enc(ids))
        res2 = kv.lookup_or_insert(t2, enc(ids))
        a = opt.apply(res1.table, res1.slot, g, lr=0.01, step=2)
        b = opt.apply(res2.table, res2.slot, g, lr=0.01, step=2)
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(a, enc(ids))),
            np.asarray(kv.lookup_or_zeros(b, enc(ids))), rtol=1e-6)


class TestHalfValueDtypeRoundtrip:
    """value_dtype=float16 through the full saver contract (the reference
    registers half kernels, kv_variable_ops.cc:153-156): on-disk values
    are f32 (reference bundle format), storage stays half, slot state
    survives, resumed training continues identically (VERDICT r4 #4)."""

    def test_fp16_save_restore_with_slots(self, tmp_path):
        t = kv.create(4, 256, seed=0, value_dtype=jnp.float16)
        ids = np.arange(1, 11, dtype=np.int64) * 3
        rows = (np.arange(40, dtype=np.float32).reshape(10, 4) / 7.0)
        t = kv.insert(t, enc(ids), jnp.asarray(rows, jnp.float16),
                      freq=jnp.full((10,), 7, jnp.uint32), day=5)
        opt = tft.AdamOptimizer()
        t = opt.init(t)
        res = kv.lookup_or_insert(t, enc(ids))
        g = jnp.ones((len(ids), 4))
        t = opt.apply(res.table, res.slot, g, lr=0.01, step=1)
        p = str(tmp_path / "c")
        saver.save(p, {"emb": t})
        t2, _ = saver.restore(
            p, {"emb": opt.init(kv.create(4, 256, seed=9,
                                          value_dtype=jnp.float16))})
        t2 = t2["emb"]
        assert t2.payload.dtype == jnp.float16
        np.testing.assert_array_equal(
            np.asarray(kv.lookup_or_zeros(t2, enc(ids)), np.float32),
            np.asarray(kv.lookup_or_zeros(t, enc(ids)), np.float32))
        np.testing.assert_array_equal(
            np.asarray(kv.get_count(t2, enc(ids))), 8)  # 7 + 1 lookup
        # resumed training continues identically
        r1 = kv.lookup_or_insert(t, enc(ids))
        r2 = kv.lookup_or_insert(t2, enc(ids))
        a = opt.apply(r1.table, r1.slot, g, lr=0.01, step=2)
        b = opt.apply(r2.table, r2.slot, g, lr=0.01, step=2)
        np.testing.assert_array_equal(
            np.asarray(kv.lookup_or_zeros(a, enc(ids)), np.float32),
            np.asarray(kv.lookup_or_zeros(b, enc(ids)), np.float32))


class TestSharded:
    def _sharded_tables(self, n_shards, n_rows=40):
        ids = np.arange(1, n_rows + 1, dtype=np.uint64)
        rows = np.random.RandomState(0).randn(n_rows, 4).astype(np.float32)
        shards = [kv.create(4, 256, seed=i) for i in range(n_shards)]
        assign = ids % n_shards
        for i in range(n_shards):
            sel = assign == i
            shards[i] = kv.insert(shards[i], enc(ids[sel].astype(np.int64)),
                                  jnp.asarray(rows[sel]))
        return shards, ids, rows

    def lookup_all(self, shards, ids):
        out = np.zeros((len(ids), 4), np.float32)
        assign = ids % len(shards)
        for i, s in enumerate(shards):
            sel = assign == i
            if sel.sum():
                out[sel] = np.asarray(
                    kv.lookup_or_zeros(s, enc(ids[sel].astype(np.int64))))
        return out

    @pytest.mark.parametrize("m,n", [(2, 4), (4, 2), (3, 5), (4, 1), (1, 3)])
    def test_repartition_m_to_n(self, tmp_path, m, n):
        shards, ids, rows = self._sharded_tables(m)
        p = str(tmp_path / "c")
        saver.save(p, {"emb": shards})
        templates = [kv.create(4, 256, seed=7) for _ in range(n)]
        out, _ = saver.restore(p, {"emb": templates})
        got = self.lookup_all(out["emb"], ids)
        np.testing.assert_allclose(got, rows, rtol=1e-6)

    def test_same_shard_count_normal_path(self, tmp_path):
        shards, ids, rows = self._sharded_tables(3)
        p = str(tmp_path / "c")
        saver.save(p, {"emb": shards})
        out, _ = saver.restore(p, {"emb": [kv.create(4, 256) for _ in range(3)]})
        np.testing.assert_allclose(self.lookup_all(out["emb"], ids), rows,
                                   rtol=1e-6)


class TestManagerDelta:
    def test_full_delta_lineage(self, tmp_path):
        t, ids, rows = make_table()
        mgr = ckpt.CheckpointManager(str(tmp_path / "ckpts"))
        tabs = mgr.save({"emb": t}, step=1, full=True)
        # touch two rows, delta snapshot
        t = tabs["emb"]
        t = kv.scatter(t, enc(ids[:2]), jnp.full((2, 4), 100.0), "update")
        tabs = mgr.save({"emb": t}, step=2, full=False)
        t = tabs["emb"]
        # another delta with a delete
        t, _ = kv.delete(t, enc(ids[2:3]))
        t = kv.scatter(t, enc(ids[3:4]), jnp.full((1, 4), 7.0), "update")
        mgr.save({"emb": t}, step=3, full=False)

        restored, _, step = mgr.restore({"emb": kv.create(4, 256, seed=3)})
        assert step == 3
        got = np.asarray(kv.lookup_or_zeros(restored["emb"], enc(ids)))
        want = rows.copy()
        want[:2] = 100.0
        want[3] = 7.0
        np.testing.assert_allclose(got[:2], want[:2])
        np.testing.assert_allclose(got[3], want[3])
        np.testing.assert_allclose(got[4:], want[4:])
        # the deleted key was recorded in the delta's delete list
        np.testing.assert_allclose(got[2], 0.0)

    def test_delta_before_full_rejected(self, tmp_path):
        t, *_ = make_table()
        mgr = ckpt.CheckpointManager(str(tmp_path / "ckpts"))
        with pytest.raises(ValueError, match="delta"):
            mgr.save({"emb": t}, step=1, full=False)

    def test_delta_only_writes_touched(self, tmp_path):
        t, ids, rows = make_table()
        mgr = ckpt.CheckpointManager(str(tmp_path / "ckpts"))
        tabs = mgr.save({"emb": t}, step=1, full=True)
        t = kv.scatter(tabs["emb"], enc(ids[:1]), jnp.ones((1, 4)), "add")
        mgr.save({"emb": t}, step=2, full=False)
        r = bundle.BundleReader(os.path.join(str(tmp_path / "ckpts"),
                                             "ckpt-delta-2"))
        assert r.shape("emb-keys")[0] == 1  # only the touched row


class TestAsyncSave:
    """save_async: export/device_get happen synchronously (returned tables
    carry cleared delta bits), the bundle write runs in a background thread
    with the atomic index publish preserved."""

    def test_async_roundtrip(self, tmp_path):
        from tfplus_tpu import train
        t = kv.create(8, 1024)
        opt = train.AdamOptimizer()
        t = opt.init(t)
        ids = kv.encode_ids_np_to_device(np.arange(200, dtype=np.int64))
        t = kv.lookup_or_insert(t, ids).table
        p = str(tmp_path / "ck")
        tabs, handle = saver.save_async(p, {"emb": t})
        # continue training while the write runs
        more = kv.encode_ids_np_to_device(np.arange(200, 250, dtype=np.int64))
        t2 = kv.lookup_or_insert(tabs["emb"], more).table
        assert handle.result(timeout=120) == p
        assert handle.done()
        restored, _ = saver.restore(p, {"emb": opt.init(kv.create(8, 1024))})
        assert int(kv.size(restored["emb"])) == 200
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(restored["emb"], ids)),
            np.asarray(kv.lookup_or_zeros(t, ids)))
        assert int(kv.size(t2)) == 250

    def test_async_write_error_surfaces(self, tmp_path):
        t = kv.create(8, 256)
        bad = str(tmp_path / "no_dir" / "deep" / "x" / "ck")
        import os
        os.makedirs(os.path.dirname(bad))
        os.chmod(os.path.dirname(bad), 0o500)
        try:
            tabs, handle = saver.save_async(bad, {"emb": t})
            try:
                handle.result(timeout=60)
                raised = False
            except Exception:
                raised = True
            assert raised or os.access(os.path.dirname(bad), os.W_OK)
        finally:
            os.chmod(os.path.dirname(bad), 0o700)


class TestManagerBackgroundSave:
    def test_background_lineage(self, tmp_path):
        mgr = ckpt.CheckpointManager(str(tmp_path))
        t = kv.create(8, 512)
        t = kv.lookup_or_insert(
            t, kv.encode_ids_np_to_device(np.arange(50, dtype=np.int64))).table
        tabs = mgr.save({"emb": t}, step=1, full=True, background=True)
        # lineage not committed until the write lands
        tabs2 = kv.lookup_or_insert(
            tabs["emb"], kv.encode_ids_np_to_device(
                np.arange(50, 80, dtype=np.int64))).table
        mgr.wait()
        assert mgr.latest()["full"]["step"] == 1
        # delta on top, also background; restore joins it automatically
        mgr.save({"emb": tabs2}, step=2, full=False, background=True)
        restored, _, step = mgr.restore({"emb": kv.create(8, 512)})
        assert step == 2
        assert int(kv.size(restored["emb"])) == 80


class TestCrashSafety:
    def test_interrupted_write_keeps_previous_lineage(self, tmp_path):
        """A checkpoint that died mid-write (data file present, no index —
        the atomic publish never happened) must be invisible: restore uses
        the previous intact lineage."""
        mgr = ckpt.CheckpointManager(str(tmp_path))
        t = kv.create(8, 512)
        t = kv.lookup_or_insert(
            t, kv.encode_ids_np_to_device(np.arange(30, dtype=np.int64))).table
        mgr.save({"emb": t}, step=1, full=True)
        # simulate a crash mid-write of ckpt-full-2: data shard, no index
        with open(str(tmp_path / "ckpt-full-2.data-00000-of-00001"), "wb") as f:
            f.write(b"\x00" * 100)
        restored, _, step = mgr.restore({"emb": kv.create(8, 512)})
        assert step == 1
        assert int(kv.size(restored["emb"])) == 30

    def test_corrupt_tensor_detected_by_crc(self, tmp_path):
        p = str(tmp_path / "ck")
        t = kv.create(8, 512)
        t = kv.lookup_or_insert(
            t, kv.encode_ids_np_to_device(np.arange(30, dtype=np.int64))).table
        saver.save(p, {"emb": t})
        # flip bytes in the middle of the data shard
        fn = p + ".data-00000-of-00001"
        blob = bytearray(open(fn, "rb").read())
        blob[len(blob) // 2] ^= 0xFF
        open(fn, "wb").write(bytes(blob))
        with pytest.raises(Exception, match="(?i)crc|checksum|corrupt"):
            saver.restore(p, {"emb": kv.create(8, 512)})


class TestMultihost:
    """Coordinator-free multi-host checkpointing: each process writes its own
    bundle with globally-numbered shards; restore unions them (any process
    count x any target shard count, elastic re-mod included)."""

    def test_two_process_roundtrip_and_elastic(self, tmp_path):
        opt = tft.AdagradOptimizer()
        all_ids = np.arange(200, dtype=np.int64)
        shard4 = [opt.init(kv.create(8, 512, seed=i)) for i in range(4)]
        for g in range(4):
            mine = all_ids[all_ids % 4 == g]
            shard4[g] = kv.insert(
                shard4[g], kv.encode_ids_np_to_device(mine),
                np.full((mine.size, 8), float(g + 1), np.float32))
        p = str(tmp_path / "mh")
        for proc in range(2):     # 2 procs x 2 local shards
            saver.save_multihost(
                p, {"emb": shard4[proc * 2:(proc + 1) * 2]},
                {"w": np.ones(3, np.float32)} if proc == 0 else None,
                process_id=proc, num_processes=2)
        tmpl4 = [opt.init(kv.create(8, 512, seed=9)) for _ in range(4)]
        out, dense = saver.restore_multihost(
            p, {"emb": tmpl4}, {"w": np.zeros(3, np.float32)})
        for g in range(4):
            mine = all_ids[all_ids % 4 == g]
            got = kv.lookup_or_zeros(out["emb"][g],
                                     kv.encode_ids_np_to_device(mine))
            np.testing.assert_allclose(np.asarray(got), float(g + 1))
        np.testing.assert_allclose(np.asarray(dense["w"]), 1.0)
        # elastic 4 -> 3
        tmpl3 = [opt.init(kv.create(8, 512, seed=7)) for _ in range(3)]
        out3, _ = saver.restore_multihost(p, {"emb": tmpl3})
        assert sum(int(kv.size(s)) for s in out3["emb"]) == 200


class TestNeedFullImport:
    """A delta whose deletion log overflowed has a TRUNCATED delete list;
    replaying it would resurrect deleted rows (reference: FullOrDeltaImport
    honours need_full_import, ops/kv_variable_ops.cc:576-604)."""

    def _overflowed(self, t):
        import dataclasses
        import jax.numpy as jnp
        return dataclasses.replace(t, deleted_overflow=jnp.ones((), bool))

    def test_restore_refuses_overflowed_delta(self, tmp_path):
        t, ids, _ = make_table()
        t = self._overflowed(t)
        p = str(tmp_path / "d")
        saver.save(p, {"t": t}, delta=True, first_n=saver.FIRST_N_DELTA)
        with pytest.raises(ValueError, match="need_full_import"):
            saver.restore(p, {"t": kv.create(4, 256)}, delta=True)

    def test_repartition_refuses_overflowed_delta(self, tmp_path):
        t, ids, _ = make_table()
        t = self._overflowed(t)
        p = str(tmp_path / "d2")
        saver.save(p, {"t": [t, make_table()[0]]}, delta=True,
                   first_n=saver.FIRST_N_DELTA)
        with pytest.raises(ValueError, match="need_full_import"):
            saver.restore(p, {"t": [kv.create(4, 256)] * 3}, delta=True)

    def test_manager_escalates_to_full(self, tmp_path):
        from tfplus_tpu.checkpoint.manager import CheckpointManager
        mgr = CheckpointManager(str(tmp_path))
        t, ids, _ = make_table()
        t = mgr.save({"t": t}, step=1, full=True)["t"]
        t = mgr.save({"t": t}, step=2, full=False)["t"]   # clean delta ok
        assert len(mgr.latest()["deltas"]) == 1
        t = self._overflowed(t)
        t = mgr.save({"t": t}, step=3, full=False)["t"]   # escalates
        lineage = mgr.latest()
        assert lineage["full"]["step"] == 3
        assert lineage["deltas"] == []
        # the escalated full checkpoint restores cleanly
        out, _, step = mgr.restore({"t": kv.create(4, 256)})
        assert step == 3
        got = np.asarray(kv.lookup_or_zeros(out["t"], enc(ids)))
        assert got.shape == (len(ids), 4)


class _MeterWriter(bundle.BundleWriter):
    """BundleWriter that records the biggest single host buffer handed to it
    for payload tensors (values/slots) — the streaming-save memory proof."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.max_payload_buf = 0
        self._payload_stream = False

    def add(self, name, array, shard=None):
        if "-values" in name or "-slot-" in name:
            raise AssertionError(
                f"payload tensor {name} written with one-shot add() — "
                "must stream")
        super().add(name, array, shard)

    def add_header(self, name, dtype, shape, shard=None):
        self._payload_stream = "-values" in name or "-slot-" in name
        super().add_header(name, dtype, shape, shard)

    def append_segment(self, a):
        if self._payload_stream:
            nb = a.nbytes if hasattr(a, "nbytes") else len(a)
            self.max_payload_buf = max(self.max_payload_buf, nb)
        super().append_segment(a)


class _MeterReader(bundle.BundleReader):
    """BundleReader that forbids whole-tensor reads of payload tensors and
    records the biggest streamed chunk."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.max_payload_buf = 0

    def lookup(self, name, verify=True):
        if "-values" in name or "-slot-" in name:
            raise AssertionError(
                f"payload tensor {name} read with one-shot lookup() — "
                "must stream")
        return super().lookup(name, verify)

    def stream(self, name, chunk_rows, verify=True):
        for start, rows in super().stream(name, chunk_rows, verify):
            if "-values" in name or "-slot-" in name:
                self.max_payload_buf = max(self.max_payload_buf, rows.nbytes)
            yield start, rows


class TestStreamingBudget:
    """Saving/restoring/repartitioning must hold peak payload host buffers
    to the chunk budget — a table bigger than host RAM must work
    (reference: dynamic_save.hpp:302-310 streaming export,
    tensor_bundle.cc:597-607 partial restore)."""

    CHUNK = 256          # rows per chunk
    DIM = 32

    def _big_table(self, seed=0, offset=0):
        n = 3000
        t = kv.create(self.DIM, 8192, seed=seed)
        opt = tft.AdagradOptimizer()
        t = opt.init(t)
        ids = np.arange(1, n + 1, dtype=np.int64) * 14 + offset
        q = enc(ids)
        res = kv.lookup_or_insert(t, q)
        t = opt.apply(res.table, res.slot,
                      jnp.ones((n, self.DIM)) * 0.01, lr=0.1, step=1)
        return t, ids

    def test_save_restore_bounded(self, tmp_path):
        t, ids = self._big_table()
        budget = self.CHUNK * self.DIM * 4
        p = str(tmp_path / "big")
        w = _MeterWriter(p)
        saver.save_table(w, "emb", t, chunk_rows=self.CHUNK)
        w.close()
        assert 0 < w.max_payload_buf <= budget
        # full values tensor is 12x the budget — proves it was chunked
        assert bundle.BundleReader(p).shape("emb-values")[0] * self.DIM * 4 \
            > 10 * budget

        r = _MeterReader(p)
        t2 = saver.restore_table(r, "emb", kv.create(self.DIM, 8192),
                                 chunk_rows=self.CHUNK)
        assert 0 < r.max_payload_buf <= budget * 2  # slot k=1 wider rows ok
        q = enc(ids)
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(t2, q)),
            np.asarray(kv.lookup_or_zeros(t, q)), rtol=1e-6)
        # slot state restored too
        sname = t.config.slot_layout[0][0]
        fr2 = kv.find(t2, q)
        fr1 = kv.find(t, q)
        np.testing.assert_allclose(
            np.asarray(kv.get_slot(t2, sname))[np.asarray(fr2.slot)],
            np.asarray(kv.get_slot(t, sname))[np.asarray(fr1.slot)],
            rtol=1e-6)

    def test_freq_keys_aliased_not_duplicated(self, tmp_path):
        t, ids = self._big_table()
        p = str(tmp_path / "alias")
        saver.save(p, {"emb": t})
        r = bundle.BundleReader(p)
        assert r._index["emb-freq_keys"].get("alias") == "emb-keys"
        np.testing.assert_array_equal(r.lookup("emb-freq_keys"),
                                      r.lookup("emb-keys"))

    def test_repartition_bounded(self, tmp_path):
        # disjoint key sets: each key lives in exactly one source shard,
        # as a real mod-routed checkpoint guarantees
        t0, ids0 = self._big_table(seed=0)
        t1, ids1 = self._big_table(seed=1, offset=7)
        p = str(tmp_path / "rep")
        w = _MeterWriter(p)
        saver.save_table(w, "emb/part_0", t0, chunk_rows=self.CHUNK)
        saver.save_table(w, "emb/part_1", t1, chunk_rows=self.CHUNK)
        w.add("emb-num_shards", np.array([2], np.int32))
        w.close()

        from tfplus_tpu.checkpoint import repartition
        r = _MeterReader(p)
        shards = repartition.restore_repartitioned(
            r, "emb", [kv.create(self.DIM, 8192) for _ in range(3)], 2,
            chunk_rows=self.CHUNK)
        assert 0 < r.max_payload_buf <= self.CHUNK * self.DIM * 4 * 2
        for key in list(ids0[:50]) + list(ids1[:50]):
            s = int(key % 3)
            got = np.asarray(kv.lookup_or_zeros(shards[s], enc([key])))[0]
            src = t0 if key in ids0 else t1
            want = np.asarray(kv.lookup_or_zeros(src, enc([key])))[0]
            np.testing.assert_allclose(got, want, rtol=1e-6)


class TestManagerReviewFindings:
    """Round-3 persistence review findings (pinned)."""

    def test_dense_restored_from_last_delta(self, tmp_path):
        """restore() must replay DENSE state through the deltas too — the
        last delta carries the freshest DNN weights; taking dense from the
        full checkpoint resumed training with weights stale by the whole
        delta window."""
        mgr = ckpt.CheckpointManager(str(tmp_path / "ck"))
        t = kv.create(4, 256, seed=0)
        q = kv.encode_ids_np_to_device(np.arange(1, 9, dtype=np.int64))
        t = kv.insert(t, q, jnp.ones((8, 4)))
        dense = {"w": jnp.full((3,), 1.0)}
        t = mgr.save({"emb": t}, dense, step=1, full=True)["emb"]
        t = kv.scatter(t, q, jnp.ones((8, 4)), "add")
        dense = {"w": jnp.full((3,), 2.0)}               # dense moved on
        t = mgr.save({"emb": t}, dense, step=2, full=False)["emb"]
        out, dense2, step = mgr.restore({"emb": kv.create(4, 256)},
                                        {"w": jnp.zeros((3,))})
        assert step == 2
        np.testing.assert_allclose(np.asarray(dense2["w"]), 2.0)
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(out["emb"], q)), 2.0)

    def test_delta_without_dense_keeps_previous(self, tmp_path):
        """A tables-only delta must not clobber (or crash on) the dense
        restored so far."""
        mgr = ckpt.CheckpointManager(str(tmp_path / "ck"))
        t = kv.create(4, 256, seed=0)
        q = kv.encode_ids_np_to_device(np.arange(1, 5, dtype=np.int64))
        t = kv.insert(t, q, jnp.ones((4, 4)))
        t = mgr.save({"emb": t}, {"w": jnp.full((2,), 5.0)},
                     step=1, full=True)["emb"]
        t = mgr.save({"emb": t}, None, step=2, full=False)["emb"]
        _, dense2, step = mgr.restore({"emb": kv.create(4, 256)},
                                      {"w": jnp.zeros((2,))})
        assert step == 2
        np.testing.assert_allclose(np.asarray(dense2["w"]), 5.0)

    def test_failed_background_save_escalates_to_full(self, tmp_path):
        """A failed background save already cleared the live tables' touch
        bits, so the touched window exists nowhere on disk: the next save
        MUST be full even if the caller asks for a delta."""
        mgr = ckpt.CheckpointManager(str(tmp_path / "ck"))
        t = kv.create(4, 256, seed=0)
        q = kv.encode_ids_np_to_device(np.arange(1, 9, dtype=np.int64))
        t = kv.insert(t, q, jnp.ones((8, 4)))
        t = mgr.save({"emb": t}, step=1, full=True)["emb"]
        t = kv.scatter(t, q, jnp.ones((8, 4)), "add")

        class _FailingHandle:
            def result(self):
                raise IOError("disk full (injected)")

        import tfplus_tpu.checkpoint.saver as real_saver
        orig = real_saver.save_async
        try:
            real_saver.save_async = lambda *a, **k: (a[1], _FailingHandle())
            t = mgr.save({"emb": t}, step=2, full=False,
                         background=True)["emb"]
        finally:
            real_saver.save_async = orig
        with pytest.raises(IOError, match="injected"):
            mgr.wait()
        # retry as a delta: silently escalated to FULL
        t = mgr.save({"emb": t}, step=3, full=False)["emb"]
        st = mgr.latest()
        assert st["full"]["step"] == 3 and st["deltas"] == []
        out, _, step = mgr.restore({"emb": kv.create(4, 256)})
        assert step == 3
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(out["emb"], q)), 2.0)

    def test_low_first_n_full_save_resets_delta_baseline(self, tmp_path):
        """first_n < TRAIN full exports must still consume the deletion
        log — a permanent overflow used to force-escalate every later
        delta to full, forever."""
        mgr = ckpt.CheckpointManager(str(tmp_path / "ck"),
                                     first_n=saver.FIRST_N_TRAIN)
        t = kv.create(4, 256, seed=0)
        ids64 = np.arange(1, 4500, dtype=np.int64)
        q = kv.encode_ids_np_to_device(ids64)
        t = kv.grow_to_fit(t, incoming=4500)
        t = kv.insert(t, q, jnp.ones((4499, 4)))
        t, _ = kv.delete(t, q)          # 4499 > 4096-entry ring: overflow
        import jax
        assert bool(jax.device_get(t.deleted_overflow))
        t = mgr.save({"emb": t}, step=1, full=False)["emb"]   # escalates
        assert mgr.latest()["full"]["step"] == 1
        # the full export consumed the ring: the NEXT delta is a delta
        t = kv.insert(t, kv.encode_ids_np_to_device(
            np.array([9001], np.int64)), jnp.ones((1, 4)))
        t = mgr.save({"emb": t}, step=2, full=False)["emb"]
        assert [d["step"] for d in mgr.latest()["deltas"]] == [2]
