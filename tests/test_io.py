"""IO layer tests: filesystem registry (OSS URI parity), bundle-over-FS, and
the native C++ helpers (built on demand; parity vs Python fallbacks)."""
import os

import numpy as np
import pytest

from tfplus_tpu.io import filesystem as fsys
from tfplus_tpu.io import native
from tfplus_tpu.checkpoint import bundle


class TestFilesystem:
    def test_local_roundtrip(self, tmp_path):
        fs, p = fsys.get_filesystem(str(tmp_path / "a" / "b.bin"))
        with fs.open(p, "wb") as f:
            f.write(b"hello")
        assert fs.exists(p)
        with fs.open(p, "rb") as f:
            assert f.read() == b"hello"
        assert fs.size(p) == 5

    def test_ram_fs(self):
        fs, p = fsys.get_filesystem("ram://bucket/x.bin")
        with fs.open(p, "wb") as f:
            f.write(b"data")
        fs2, p2 = fsys.get_filesystem("ram://bucket/x.bin")
        with fs2.open(p2, "rb") as f:
            assert f.read() == b"data"

    def test_unknown_scheme_raises(self):
        with pytest.raises(ValueError, match="no filesystem"):
            fsys.get_filesystem("s4://nope/x")

    def test_custom_registration(self):
        class MyFS(fsys.MemFileSystem):
            pass

        fsys.register_filesystem("myfs", MyFS())
        fs, _ = fsys.get_filesystem("myfs://y")
        assert isinstance(fs, MyFS)

    def test_oss_uri_credentials(self):
        """The reference's in-URI credential contract
        (oss_file_system.cc: oss://bucket\\x01id=..\\x02key=..\\x02host=..)."""
        bucket, obj, creds = fsys.parse_oss_uri(
            "oss://mybkt\x01id=AK123\x02key=SK456\x02host=oss-cn.example"
            "/dir/obj.bin")
        assert bucket == "mybkt"
        assert creds["id"] == "AK123" and creds["key"] == "SK456"
        assert creds["host"].startswith("oss-cn")

    def test_oss_uri_env_fallback(self):
        os.environ["OSS_ACCESS_ID"] = "ENVID"
        try:
            b, o, creds = fsys.parse_oss_uri("oss://bkt/obj")
            assert b == "bkt" and o == "obj" and creds["id"] == "ENVID"
        finally:
            del os.environ["OSS_ACCESS_ID"]

    def test_bundle_over_ram_fs(self):
        with bundle.BundleWriter("ram://ckpt/test") as w:
            w.add("x", np.arange(10, dtype=np.float32))
        r = bundle.BundleReader("ram://ckpt/test")
        np.testing.assert_array_equal(r.lookup("x"), np.arange(10))


class TestNative:
    def test_builds_and_loads(self):
        assert native.available(), "native lib should build (g++ present)"

    def test_fingerprint_matches_python(self):
        for s in [b"", b"a", b"hello world", b"\x00\xff" * 100]:
            lib_fp = native.fingerprint64(s, algo="fnv")
            # python fallback reference (legacy fnv ids)
            h = 0xCBF29CE484222325
            for byte in s:
                h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            assert lib_fp == h, s

    def test_fingerprint_batch(self):
        strs = [b"user_123", b"item_456", b""]
        out = native.fingerprint64_batch(strs)
        assert out.tolist() == [native.fingerprint64(s) for s in strs]

    def test_crc32_matches_zlib(self):
        import zlib
        for n in (0, 1, 7, 8, 9, 1000, 65537):
            data = np.random.RandomState(n % 97).bytes(n)
            assert native.crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF), n
        # seeded/streaming
        a, b = b"hello ", b"world"
        assert native.crc32(b, native.crc32(a)) == (zlib.crc32(a + b) & 0xFFFFFFFF)

    def test_parse_criteo(self):
        from tfplus_tpu.data import criteo as pycriteo
        lines = []
        rng = np.random.RandomState(0)
        for i in range(10):
            ints = [str(rng.randint(0, 100)) if rng.rand() > 0.2 else ""
                    for _ in range(13)]
            cats = ["%08x" % rng.randint(0, 2**31) if rng.rand() > 0.2 else ""
                    for _ in range(26)]
            lines.append("\t".join([str(i % 2)] + ints + cats))
        blob = ("\n".join(lines) + "\n").encode()
        out = native.parse_criteo_batch(blob, 10)
        assert out is not None
        numeric, cats_out, labels, consumed = out
        assert numeric.shape == (10, 13) and cats_out.shape == (10, 26)
        assert consumed == len(blob)
        np.testing.assert_array_equal(labels, [i % 2 for i in range(10)])
        # parity with the python parser
        import io as _io
        import tempfile
        with tempfile.NamedTemporaryFile("wb", suffix=".txt", delete=False) as f:
            f.write(blob)
            path = f.name
        py_batches = list(pycriteo.batches(path, 10))
        os.unlink(path)
        np.testing.assert_allclose(py_batches[0]["numeric"], numeric, rtol=1e-6)
        np.testing.assert_array_equal(py_batches[0]["categorical"], cats_out)

    def test_parse_criteo_partial_line(self):
        blob = b"1\t" + b"\t".join(b"1" for _ in range(39)) + b"\nincomplete"
        out = native.parse_criteo_batch(blob, 10)
        numeric, cats, labels, consumed = out
        assert len(labels) == 1
        assert consumed == blob.index(b"incomplete")


class TestCriteoLoader:
    """Native multithreaded loader (tfp_loader_*) vs the one-shot parser."""

    def _mkfile(self, tmp_path, n=3000, trailing_newline=False):
        rng = np.random.RandomState(7)
        lines = []
        for _ in range(n):
            ints = ["" if rng.rand() < .2 else str(rng.randint(0, 1000))
                    for _ in range(13)]
            cats = ["" if rng.rand() < .1
                    else format(rng.randint(0, 1 << 32), "08x")
                    for _ in range(26)]
            lines.append("\t".join([str(rng.randint(0, 2))] + ints + cats))
        p = tmp_path / "criteo.tsv"
        p.write_text("\n".join(lines) + ("\n" if trailing_newline else ""))
        return str(p), n

    def test_matches_parser_totals(self, tmp_path):
        if not native.available():
            pytest.skip("native lib unavailable")
        path, n = self._mkfile(tmp_path)
        rn, rc, rl, _ = native.parse_criteo_batch(
            open(path, "rb").read() + b"\n", n + 10)
        tot, s_lab, s_cat = 0, 0.0, 0
        with native.CriteoLoader(path, 256, threads=4) as L:
            for numeric, cats, labels in L:
                tot += len(labels)
                s_lab += float(labels.sum())
                s_cat += int(cats.astype(np.int64).sum())
        assert tot == n == len(rl)
        assert abs(s_lab - float(rl.sum())) < 1e-3
        assert s_cat == int(rc.astype(np.int64).sum())

    def test_single_thread_order_and_trailing_newline(self, tmp_path):
        if not native.available():
            pytest.skip("native lib unavailable")
        path, n = self._mkfile(tmp_path, n=500, trailing_newline=True)
        rn, rc, rl, _ = native.parse_criteo_batch(
            open(path, "rb").read(), n + 10)
        with native.CriteoLoader(path, 200, threads=1) as L:
            batches = list(L)
        got_l = np.concatenate([b[2] for b in batches])
        got_c = np.concatenate([b[1] for b in batches])
        np.testing.assert_array_equal(got_l, rl)
        np.testing.assert_array_equal(got_c, rc)

    def test_missing_file(self):
        if not native.available():
            pytest.skip("native lib unavailable")
        with pytest.raises(FileNotFoundError):
            native.CriteoLoader("/nonexistent/file.tsv", 64)


class TestBinaryCriteoCache:
    """Pre-tokenized binary cache (round-5 input-pipeline fix): parse+hash
    once, steady-state epochs read memmapped slices (data/criteo.py)."""

    def _mkfile(self, tmp_path, n=3000):
        rng = np.random.RandomState(11)
        lines = []
        for _ in range(n):
            ints = ["" if rng.rand() < .2 else str(rng.randint(0, 1000))
                    for _ in range(13)]
            cats = ["" if rng.rand() < .1
                    else format(rng.randint(0, 1 << 32), "08x")
                    for _ in range(26)]
            lines.append("\t".join([str(rng.randint(0, 2))] + ints + cats))
        p = tmp_path / "criteo.tsv"
        p.write_text("\n".join(lines))   # no trailing newline on purpose
        return str(p), n

    def test_build_matches_parser_and_keeps_tail(self, tmp_path):
        from tfplus_tpu.data import criteo
        path, n = self._mkfile(tmp_path, n=2500)
        cache = criteo.BinaryCriteoCache(
            criteo.build_binary_cache(path, str(tmp_path / "bin")))
        assert cache.rows == n   # the final newline-less row is kept
        if native.available():
            rn, rc, rl, _ = native.parse_criteo_batch(
                open(path, "rb").read() + b"\n", n + 10)
            np.testing.assert_array_equal(np.asarray(cache.label), rl)
            np.testing.assert_array_equal(np.asarray(cache.categorical), rc)
            np.testing.assert_allclose(np.asarray(cache.numeric), rn,
                                       rtol=1e-6)

    def test_idempotent_rebuild_and_batches(self, tmp_path):
        from tfplus_tpu.data import criteo
        path, n = self._mkfile(tmp_path, n=1000)
        d = criteo.build_binary_cache(path, str(tmp_path / "bin"))
        stamp = (tmp_path / "bin" / "categorical.npy").stat().st_mtime_ns
        criteo.build_binary_cache(path, d)    # no-op: same source
        assert (tmp_path / "bin" /
                "categorical.npy").stat().st_mtime_ns == stamp
        cache = criteo.BinaryCriteoCache(d)
        got = list(cache.batches(256))
        assert len(got) == n // 256           # short tail dropped
        assert got[0]["categorical"].shape == (256, 26)
        # loop=True wraps around; max_batches bounds it
        looped = list(cache.batches(256, max_batches=9, loop=True))
        assert len(looped) == 9
        np.testing.assert_array_equal(looped[0]["categorical"],
                                      looped[len(got)]["categorical"])

    def test_batches_match_tsv_iterator(self, tmp_path):
        from tfplus_tpu.data import criteo
        path, n = self._mkfile(tmp_path, n=1024)
        # newline-terminate: the LIVE iterator can't see a newline-less
        # tail row (the cache build can), which would skew the comparison
        with open(path, "a") as f:
            f.write("\n")
        cache = criteo.BinaryCriteoCache(
            criteo.build_binary_cache(path, str(tmp_path / "bin")))
        live = list(criteo.batches(path, 512))
        cached = list(cache.batches(512))
        assert len(live) == len(cached) == 2
        for a, b in zip(live, cached):
            np.testing.assert_array_equal(a["categorical"],
                                          b["categorical"])
            np.testing.assert_allclose(a["numeric"], b["numeric"],
                                       rtol=1e-6)
            np.testing.assert_array_equal(a["label"], b["label"])


class TestProgressBar:
    def test_draws_and_completes(self):
        import io
        from tfplus_tpu.utils.progress import ProgressBar
        buf = io.StringIO()
        with ProgressBar("restore", total=3, stream=buf, enabled=True) as bar:
            for _ in range(3):
                bar.update(1)
        out = buf.getvalue()
        assert "restore" in out and "100.0%" in out

    def test_disabled_is_silent(self):
        import io
        from tfplus_tpu.utils.progress import ProgressBar
        buf = io.StringIO()
        bar = ProgressBar("x", total=5, stream=buf, enabled=False)
        bar.update(5)
        bar.done()
        assert buf.getvalue() == ""


class TestCriteoTrainingIntegration:
    def test_tsv_through_native_loader_into_training(self, tmp_path):
        """The real-data path end to end: a Criteo-format TSV through the
        native reader/parser pool into DCN training (loss must drop)."""
        import jax.numpy as jnp
        import optax
        from tfplus_tpu import kv, train as tft
        from tfplus_tpu.data import criteo
        from tfplus_tpu.models import DCN, init_state, make_train_step

        rng = np.random.RandomState(0)
        path = tmp_path / "train.txt"
        with open(path, "w") as f:
            for _ in range(4000):
                label = rng.randint(0, 2)
                nums = "\t".join(
                    str(rng.randint(0, 100)) if rng.rand() > .2 else ""
                    for _ in range(13))
                cats = "\t".join(
                    format(rng.randint(0, 1 << 20), "08x")
                    if rng.rand() > .2 else "" for _ in range(26))
                f.write(f"{label}\t{nums}\t{cats}\n")

        model = DCN(uniform_dim=8, dnn_hidden=(32, 16), capacity=1 << 12)
        opt = tft.AdagradOptimizer()
        tx = optax.adam(5e-3)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=5e-2)
        losses = []
        for b in criteo.batches(str(path), 512, 7, threads=4):
            batch = {
                "ids": {f"C{i+1}": kv.encode_ids_np_to_device(
                    b["categorical"][:, i]) for i in range(26)},
                "features": jnp.asarray(b["numeric"]),
                "labels": jnp.asarray(b["label"]),
            }
            state, loss, _ = step(state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        assert sum(int(kv.size(t)) for t in state.tables.values()) > 1000


class TestNativeBatcherProgress:
    def test_long_lines_do_not_spin(self, tmp_path):
        """A chunk smaller than batch_size complete lines must force further
        reads instead of re-parsing the same buffer forever."""
        if not native.available():
            pytest.skip("native lib unavailable")
        from tfplus_tpu.data.criteo import _batches_native
        rng = np.random.RandomState(3)
        lines = []
        for _ in range(7):
            ints = [str(rng.randint(0, 1000)) for _ in range(13)]
            cats = [format(rng.randint(0, 1 << 32), "08x") for _ in range(26)]
            lines.append("\t".join(["1"] + ints + cats))
        p = tmp_path / "c.tsv"
        p.write_text("\n".join(lines) + "\n")
        # chunk far smaller than the ~300-byte lines: every parse starts short
        got = list(_batches_native(str(p), 3, None, chunk_bytes=64))
        assert len(got) == 2          # 7 rows -> two full batches of 3
        assert all(len(b["label"]) == 3 for b in got)


class TestFarmhashFingerprint64:
    """String-key routing parity: farmhash Fingerprint64 (the reference's
    utility.h:96-112 ModKeyImpl) — C++, pure-Python fallback, and TF's own
    farmhash64 must all agree bit-for-bit."""

    CASES = [b"", b"a", b"abc", b"hello world", b"0123456789abcdef",
             b"0123456789abcdef0123456789", b"x" * 50, b"y" * 64,
             b"z" * 65, bytes(range(200)), b"q" * 1000, b"user_12345"]

    def test_cpp_matches_python(self):
        from tfplus_tpu.io.native import _farmhash64_py, fingerprint64
        for s in self.CASES:
            assert fingerprint64(s) == _farmhash64_py(s), s[:12]

    def test_matches_tensorflow_farmhash(self):
        tf = pytest.importorskip("tensorflow")
        from tfplus_tpu.io.native import fingerprint64
        vals = tf.fingerprint(tf.constant(list(self.CASES)),
                              method="farmhash64").numpy()
        for s, v in zip(self.CASES, vals):
            want = int.from_bytes(v.tobytes(), "little")
            assert fingerprint64(s) == want, s[:12]

    def test_batch_and_legacy_fnv(self):
        from tfplus_tpu.io.native import (fingerprint64,
                                          fingerprint64_batch)
        got = fingerprint64_batch([b"abc", b"hello world", "user_1"])
        assert int(got[0]) == fingerprint64(b"abc")
        assert int(got[2]) == fingerprint64(b"user_1")
        # legacy fnv ids stay available (round-1 checkpoints, criteo tags)
        assert fingerprint64(b"abc", algo="fnv") != fingerprint64(b"abc")
        h = 0xCBF29CE484222325
        for b in b"abc":
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        assert fingerprint64(b"abc", algo="fnv") == h


class TestMovieLensLoader:
    def test_u_data_parse_and_fallback(self, tmp_path):
        from tfplus_tpu.data import movielens
        p = tmp_path / "u.data"
        rows = [(1, 10, 5, 874965758), (2, 20, 3, 876893171),
                (943, 1682, 1, 888640250)]
        p.write_text("\n".join("\t".join(map(str, r)) for r in rows) + "\n")
        d = movielens.load(str(p), shuffle_seed=None)
        np.testing.assert_array_equal(d["user_id"], [1, 2, 943])
        np.testing.assert_array_equal(d["movie_id"], [10, 20, 1682])
        np.testing.assert_array_equal(d["rating"], [5.0, 3.0, 1.0])
        assert d["rating"].dtype == np.float32
        # absent file -> synthetic stream with the same columns
        syn = movielens.load_or_synthetic(1000, path=str(tmp_path / "nope"))
        assert set(syn) >= {"user_id", "movie_id", "rating"}
        assert len(syn["rating"]) == 1000

class TestPackedFeed:
    """One-buffer batch packing (data/feed.py): a multi-array batch pytree
    travels host->device as a single int32 buffer and unpacks device-side
    inside the jitted step (one transfer RPC per batch on fabric rigs)."""

    def _batch(self, n=8):
        rng = np.random.RandomState(0)
        return {
            "ids": {"A": rng.randint(0, 1 << 30, (n, 2)).astype(np.int32),
                    "B": rng.randint(0, 1 << 30, (n, 2)).astype(np.int32)},
            "features": rng.randn(n, 3).astype(np.float32),
            "labels": rng.randint(0, 2, (n,)).astype(np.float32),
        }

    def test_roundtrip_exact_under_jit(self):
        import jax
        import jax.numpy as jnp
        from tfplus_tpu.data import make_packed_feed
        b = self._batch()
        pack, unpack = make_packed_feed(b)
        flat = pack(b)
        assert flat.dtype == np.int32 and flat.ndim == 1

        got = jax.device_get(jax.jit(unpack)(jnp.asarray(flat)))
        for k in ("A", "B"):
            np.testing.assert_array_equal(got["ids"][k], b["ids"][k])
        np.testing.assert_array_equal(got["features"], b["features"])
        np.testing.assert_array_equal(got["labels"], b["labels"])

    def test_shape_and_dtype_guards(self):
        import jax.numpy as jnp
        from tfplus_tpu.data import make_packed_feed
        b = self._batch()
        pack, unpack = make_packed_feed(b)
        wrong = dict(b, labels=b["labels"][:4])
        with pytest.raises(ValueError):
            pack(wrong)
        with pytest.raises(ValueError):
            unpack(jnp.zeros((3,), jnp.int32))
        with pytest.raises(ValueError):
            make_packed_feed({"x": np.zeros((2,), np.int64)})

    def test_feeds_a_real_train_step(self):
        import jax.numpy as jnp
        import optax
        from tfplus_tpu.data import make_packed_feed
        from tfplus_tpu import train as tft
        from tfplus_tpu.kv import hashing
        from tfplus_tpu.models import DCN, init_state, make_train_step

        n_tab, bs = 2, 32
        rng = np.random.RandomState(1)

        def encode(ids_i64):
            u = ids_i64.astype(np.uint64)
            lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32).astype(np.int32)
            hi = (u >> np.uint64(32)).astype(np.uint32).astype(np.int32)
            return np.stack([lo, hi], axis=-1)

        def host_batch():
            return {
                "ids": {f"C{i+1}": encode(
                    rng.randint(1, 500, (bs,)).astype(np.int64))
                    for i in range(n_tab)},
                "features": rng.randn(bs, 13).astype(np.float32),
                "labels": rng.randint(0, 2, (bs,)).astype(np.float32),
            }

        model = DCN(embedding_dims=[8] * n_tab, num_numeric=13,
                    dnn_hidden=(16,), cross_layers=1, capacity=1024)
        opt = tft.AdagradOptimizer(learning_rate=0.05)
        tx = optax.adam(1e-3)
        state = init_state(model, opt, tx, seed=0)
        step = make_train_step(model, opt, tx, sparse_lr=0.05)

        pack, unpack = make_packed_feed(host_batch())
        losses = []
        s = state
        for _ in range(4):
            import jax
            s, loss, _ = step(s, unpack(jnp.asarray(pack(host_batch()))))
            losses.append(float(loss))
        assert np.all(np.isfinite(losses))
