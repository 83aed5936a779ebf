"""dfs:// backend tests — the full checkpoint stack over a genuine
WebHDFS-style HTTP wire (reference: dfs/kernels/dfs/dfs_file_system.{h,cc}
over the zdfs SDK + REGISTER_FILE_SYSTEM("dfs")). The emulator enforces
the protocol's two-step CREATE/APPEND datanode redirect and pseudo-auth,
so the client under test is the same code that would talk to a real
WebHDFS-compatible endpoint (HDFS, Alluxio, Ozone HttpFS)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tfplus_tpu import kv, train as tft
from tfplus_tpu import checkpoint as ckpt
from tfplus_tpu.checkpoint import bundle, saver
from tfplus_tpu.io import register_dfs
from tfplus_tpu.io.dfs import DfsClient, DfsError, parse_dfs_path
from tfplus_tpu.io.dfs_emulator import DfsEmulator

USERS = {"alice"}


@pytest.fixture()
def dfs():
    with DfsEmulator(users=USERS) as host:
        register_dfs()
        yield host


def uri(host, path):
    return f"dfs://alice@{host}/{path}"


class TestPathContract:
    def test_parse(self):
        c, u, p = parse_dfs_path("alice@nn1:9870/a/b/c")
        assert (c, u, p) == ("nn1:9870", "alice", "/a/b/c")

    def test_cluster_and_path_required(self):
        # ParseDfsPath: cluster or file_path can not be empty
        with pytest.raises(ValueError):
            parse_dfs_path("cluster-only")
        with pytest.raises(ValueError):
            parse_dfs_path("/no/cluster")

    def test_env_user(self, monkeypatch):
        monkeypatch.setenv("DFS_USER", "bob")
        _, u, _ = parse_dfs_path("nn1/a")
        assert u == "bob"


class TestClient:
    def test_create_open_append_ranged(self, dfs):
        c = DfsClient(dfs, "alice")
        c.create("/d/f.bin", b"0123456789")
        assert c.open("/d/f.bin") == b"0123456789"
        assert c.open("/d/f.bin", offset=2, length=4) == b"2345"
        c.append("/d/f.bin", b"AB")
        assert c.open("/d/f.bin", offset=8) == b"89AB"
        st = c.status("/d/f.bin")
        assert st["type"] == "FILE" and st["length"] == 12

    def test_overwrite_false_raises(self, dfs):
        c = DfsClient(dfs, "alice")
        c.create("/x", b"1")
        with pytest.raises(DfsError):
            c.create("/x", b"2", overwrite=False)
        c.create("/x", b"2", overwrite=True)
        assert c.open("/x") == b"2"

    def test_append_missing_404(self, dfs):
        c = DfsClient(dfs, "alice")
        with pytest.raises(FileNotFoundError):
            c.append("/nope", b"z")

    def test_unknown_user_rejected(self, dfs):
        c = DfsClient(dfs, "mallory")
        with pytest.raises(DfsError, match="403"):
            c.create("/evil", b"x")
        with pytest.raises(DfsError, match="403"):
            c.open("/d")

    def test_list_mkdirs_delete(self, dfs):
        c = DfsClient(dfs, "alice")
        c.mkdirs("/a/b")
        c.create("/a/b/one", b"1")
        c.create("/a/b/two", b"2")
        names = sorted(e["pathSuffix"] for e in c.list("/a/b"))
        assert names == ["one", "two"]
        # non-empty dir refuses non-recursive delete (DeleteDir semantics)
        with pytest.raises(DfsError):
            c.delete("/a/b", recursive=False)
        assert c.delete("/a/b", recursive=True)
        assert c.status("/a/b") is None
        assert c.status("/a/b/one") is None

    def test_rename_moves_subtree(self, dfs):
        c = DfsClient(dfs, "alice")
        c.create("/r/src/f1", b"1")
        c.create("/r/src/sub/f2", b"2")
        c.rename("/r/src", "/r/dst")
        assert c.status("/r/src") is None
        assert c.open("/r/dst/f1") == b"1"
        assert c.open("/r/dst/sub/f2") == b"2"


class TestFileSystemSurface:
    def test_streamed_write_chunks(self, dfs):
        """Writes stream out in bounded chunks (CREATE + APPENDs), not one
        spooled blob — DfsWritableFile::Append's 1 MB loop."""
        from tfplus_tpu.io import get_filesystem
        fs, p = get_filesystem(uri(dfs, "big/blob"))
        data = bytes(range(256)) * (5 * 4096)       # 5 MB
        with fs.open(p, "wb") as f:
            mv = memoryview(data)
            for off in range(0, len(data), 700_000):
                f.write(mv[off:off + 700_000])
        with fs.open(p, "rb") as f:
            assert f.read() == data
        assert fs.size(p) == len(data)

    def test_append_mode(self, dfs):
        from tfplus_tpu.io import get_filesystem
        fs, p = get_filesystem(uri(dfs, "log/x"))
        with fs.open(p, "wb") as f:
            f.write(b"one")
        with fs.open(p, "ab") as f:
            f.write(b"two")
        with fs.open(p, "rb") as f:
            assert f.read() == b"onetwo"

    def test_empty_file_created(self, dfs):
        from tfplus_tpu.io import get_filesystem
        fs, p = get_filesystem(uri(dfs, "e/empty"))
        with fs.open(p, "wb"):
            pass
        assert fs.exists(p) and fs.size(p) == 0

    def test_listdir_rename_remove(self, dfs):
        from tfplus_tpu.io import get_filesystem
        fs, base = get_filesystem(uri(dfs, "fsops"))
        with fs.open(base + "/a", "wb") as f:
            f.write(b"A")
        fs.makedirs(base + "/sub")
        assert fs.listdir(base) == ["a", "sub"]
        fs.rename(base + "/a", base + "/b")
        assert fs.listdir(base) == ["b", "sub"]
        fs.remove(base + "/b")
        assert fs.listdir(base) == ["sub"]


class TestBundleOverDfs:
    def test_bundle_roundtrip_ranged(self, dfs):
        p = uri(dfs, "ck/bundle")
        with bundle.BundleWriter(p, num_shards=2) as w:
            w.add("a", np.arange(100, dtype=np.float32))
            w.add("b", np.arange(6, dtype=np.int32).reshape(2, 3))
        r = bundle.BundleReader(p)
        np.testing.assert_array_equal(r.lookup("a"), np.arange(100))
        np.testing.assert_array_equal(r.lookup("b"),
                                      np.arange(6).reshape(2, 3))
        np.testing.assert_array_equal(
            r.lookup_slice("a", 10, 5), np.arange(10, 15, dtype=np.float32))
        got = np.concatenate([c for _, c in r.stream("a", 16)])
        np.testing.assert_array_equal(got, np.arange(100))

    def test_checkpoint_save_restore_elastic(self, dfs):
        t = kv.create(8, 512, seed=0)
        opt = tft.AdagradOptimizer()
        t = opt.init(t)
        ids = np.arange(1, 300, dtype=np.int64)
        q = kv.encode_ids_np_to_device(ids)
        res = kv.lookup_or_insert(t, q)
        t = opt.apply(res.table, res.slot, jnp.ones((299, 8)) * 0.1,
                      lr=0.1, step=1)
        p = uri(dfs, "ckpts/model-1")
        t = ckpt.save(p, {"emb": t}, chunk_rows=64)["emb"]
        out, _ = ckpt.restore(p, {"emb": kv.create(8, 512)})
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(out["emb"], q)),
            np.asarray(kv.lookup_or_zeros(t, q)), rtol=1e-6)
        shards, _ = ckpt.restore(p, {"emb": [kv.create(8, 256)] * 3})
        assert sum(int(kv.size(s)) for s in shards["emb"]) == 299


class TestManagerOverDfs:
    def test_lineage_on_dfs(self, dfs):
        from tfplus_tpu.checkpoint.manager import CheckpointManager
        d = uri(dfs, "mgr")
        mgr = CheckpointManager(d, max_to_keep=1)
        t = kv.create(4, 256, seed=0)
        q = kv.encode_ids_np_to_device(np.arange(1, 30, dtype=np.int64))
        t = kv.insert(t, q, jnp.ones((29, 4)))
        t = mgr.save({"emb": t}, step=1, full=True)["emb"]
        t = kv.scatter(t, q, jnp.ones((29, 4)), "add")
        t = mgr.save({"emb": t}, step=2, full=False)["emb"]
        mgr2 = CheckpointManager(d)
        out, _, step = mgr2.restore({"emb": kv.create(4, 256)})
        assert step == 2
        np.testing.assert_allclose(
            np.asarray(kv.lookup_or_zeros(out["emb"], q)), 2.0)


class TestMultihostOverDfs:
    def test_union_restore(self, dfs):
        base = uri(dfs, "mh/run1")
        total_want = 0
        for pid in range(2):
            local = []
            for i in range(2):
                g = pid * 2 + i
                t = kv.create(4, 128, seed=g)
                ids = np.arange(g, 40, 4, dtype=np.int64) * 4 + g
                t = kv.insert(t, kv.encode_ids_np_to_device(ids),
                              jnp.full((len(ids), 4), float(g + 1)))
                total_want += len(ids)
                local.append(t)
            saver.save_multihost(base, {"emb": local},
                                 process_id=pid, num_processes=2)
        tables, _ = saver.restore_multihost(
            base, {"emb": [kv.create(4, 128) for _ in range(4)]})
        assert sum(int(kv.size(s)) for s in tables["emb"]) == total_want


class TestServingOverDfs:
    def test_export_load_serving(self, dfs):
        from tfplus_tpu import serving
        t = kv.create(4, 256, seed=0)
        q = kv.encode_ids_np_to_device(np.arange(1, 20, dtype=np.int64))
        t = kv.insert(t, q, jnp.ones((19, 4)) * 3.0)
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="u", var_name="emb",
                                embedding_dim=4)
        d = uri(dfs, "srv/exp1")
        serving.export_for_serving(d, {"emb": t}, md)
        tables, meta = serving.load_for_serving(d)
        got = np.asarray(kv.lookup_or_zeros(tables["emb"], q))
        np.testing.assert_allclose(got, 3.0)


class TestTransientFailureRetry:
    """Idempotent-op retry (reads, CREATE overwrite, MKDIRS, DELETE,
    namenode redirect legs) — APPEND deliberately never retries (a lost
    response after a partial apply would duplicate bytes)."""

    def test_read_retries_past_503_and_drop(self):
        srv = DfsEmulator(users=USERS)
        with srv as host:
            c = DfsClient(host, "alice")
            c.mkdirs("/d")
            c.create("/d/f", b"payload")
            srv.fail_next(3)
            assert c.open("/d/f") == b"payload"
            srv.fail_next(2, mode="drop")
            assert c.status("/d/f")["length"] == 7
            srv.fail_next(2)
            assert [e["pathSuffix"] for e in c.list("/d")] == ["f"]

    def test_create_retries_namenode_leg(self):
        """The two-step write's namenode leg carries no body — always
        replayable; CREATE(overwrite) itself replays safely too."""
        srv = DfsEmulator(users=USERS)
        with srv as host:
            c = DfsClient(host, "alice")
            c.mkdirs("/d")
            srv.fail_next(2)
            c.create("/d/g", b"abc")
            assert c.open("/d/g") == b"abc"

    def test_append_does_not_retry(self):
        """A 503 on APPEND surfaces immediately — blind replay could
        duplicate bytes after a server-side partial apply."""
        srv = DfsEmulator(users=USERS)
        with srv as host:
            c = DfsClient(host, "alice")
            c.mkdirs("/d")
            c.create("/d/h", b"base")
            # aim the fault at the DATANODE (payload) leg — the namenode
            # redirect leg is legitimately retryable
            srv.fail_next(1, only_step2=True)
            with pytest.raises(DfsError, match="503|injected"):
                c.append("/d/h", b"-more")
            assert c.open("/d/h") == b"base"     # nothing duplicated

    def test_checkpoint_survives_flaky_namenode(self):
        srv = DfsEmulator(users=USERS)
        with srv as host:
            register_dfs()
            t = kv.create(8, 256, seed=0)
            ids = kv.encode_ids_np_to_device(np.arange(1, 50, dtype=np.int64))
            t = kv.insert(t, ids, jnp.full((49, 8), 1.5))
            base = f"dfs://alice@{host}/flaky/ck"
            srv.fail_next(2)
            saver.save_multihost(base, {"emb": [t]}, process_id=0,
                                 num_processes=1)
            srv.fail_next(2, mode="drop")
            tables, _ = saver.restore_multihost(
                base, {"emb": [kv.create(8, 256)]})
            got = np.asarray(kv.lookup_or_zeros(tables["emb"][0], ids))
            np.testing.assert_allclose(got, 1.5)

    def test_rename_hidden_success_recovery(self):
        """A replayed RENAME whose first attempt applied answers
        boolean=false; if dst exists and src is gone the publish DID
        happen and rename() must not raise. When dst is absent too, the
        refusal is genuine and must surface."""
        srv = DfsEmulator(users=USERS)
        with srv as host:
            c = DfsClient(host, "alice")
            c.mkdirs("/d")
            c.create("/d/index.tmp", b"idx")
            c.rename("/d/index.tmp", "/d/index")
            # replay (the hidden-success shape): src gone, dst present
            c.rename("/d/index.tmp", "/d/index")      # no raise
            assert c.open("/d/index") == b"idx"
            with pytest.raises((DfsError, FileNotFoundError)):
                c.rename("/d/nope", "/d/also-nope")

    def test_delete_hidden_success_recovery(self):
        srv = DfsEmulator(users=USERS)
        with srv as host:
            c = DfsClient(host, "alice")
            c.mkdirs("/d")
            c.create("/d/x", b"v")
            assert c.delete("/d/x") is True
            # replay: already gone -> still reported deleted
            assert c.delete("/d/x") is True
