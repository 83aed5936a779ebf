"""Mesh-sharded serving (round-3 verdict #5): shard-parallel
``lookup_or_zeros`` under shard_map for f32 AND int8 tables, template-free
mesh loading of a serving export, and per-shard online delta refresh.
Reference surface: per-PS-shard serving addressing
(common/ranking_utils.py:100-146)."""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfplus_tpu import kv, serving, train as tft
from tfplus_tpu import parallel as par
from tfplus_tpu.kv import quant
from tfplus_tpu.parallel import serving as msrv

NDEV = 8
DIM = 16


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= NDEV
    return par.make_mesh(NDEV)


def train_single(steps=3, vocab=3000, seed=0):
    """A trained single table + the ids it saw."""
    opt = tft.AdamOptimizer(learning_rate=0.01)
    t = opt.init(kv.create(DIM, 8192, seed=3))
    rng = np.random.RandomState(seed)
    seen = []
    for s in range(1, steps + 1):
        ids = rng.randint(0, vocab, 512).astype(np.int64)
        seen.append(ids)
        u = kv.unique_with_counts(kv.encode_ids_np_to_device(ids))
        res = kv.lookup_or_insert(t, u.unique_keys, counts=u.counts)
        t = opt.apply(res.table, res.slot, res.rows * 0.1 + 0.01,
                      lr=0.01, step=s)
    return t, np.unique(np.concatenate(seen))


def split_by_owner(table, num_shards, *, capacity=2048):
    """Shard a trained table by key % S (the checkpoint/exchange routing)."""
    ex = kv.export_arrays(table)
    keys = ex["keys"]
    owner = keys % num_shards
    shards = []
    for i in range(num_shards):
        m = owner == i
        s = kv.create(DIM, capacity, seed=3)
        s = kv.import_arrays(s, {"keys": keys[m], "values": ex["values"][m]},
                             clear=False)
        shards.append(s)
    return shards


class TestShardedServingLookup:
    def test_f32_matches_single_table(self, mesh):
        t, ids = train_single()
        stacked = msrv.stack_shards(split_by_owner(t, NDEV), mesh)
        lookup = msrv.make_serving_lookup(stacked, mesh)
        probe = np.concatenate([ids[:NDEV * 40],
                                np.full(8, 10**9, np.int64)])  # + unknowns
        probe = probe[:len(probe) - len(probe) % NDEV]
        got = np.asarray(lookup(jnp.asarray(kv.encode_ids(probe))))
        want = np.asarray(kv.lookup_or_zeros(
            t, kv.encode_ids_np_to_device(probe)))
        np.testing.assert_array_equal(got, want)

    def test_int8_bitexact_vs_single_quantized(self, mesh):
        """The verdict's bar: an 8-shard QUANTIZED serving lookup matches
        the single-table dequantized result bit-for-bit."""
        t, ids = train_single()
        qshards = [quant.quantize_table(s)
                   for s in split_by_owner(t, NDEV)]
        stacked = msrv.stack_shards(qshards, mesh)
        lookup = msrv.make_serving_lookup(stacked, mesh)
        probe = np.concatenate([ids[:NDEV * 40],
                                np.full(8, 10**9, np.int64)])
        probe = probe[:len(probe) - len(probe) % NDEV]
        got = np.asarray(lookup(jnp.asarray(kv.encode_ids(probe))))
        want = np.asarray(quant.lookup_or_zeros(
            quant.quantize_table(t), kv.encode_ids_np_to_device(probe)))
        np.testing.assert_array_equal(got, want)   # BIT-exact

    def test_overflow_surfaces_instead_of_dropping(self, mesh):
        t, ids = train_single()
        stacked = msrv.stack_shards(split_by_owner(t, NDEV), mesh)
        # hot-shard probe: every id owned by shard 0, bucket capacity 4
        hot = (np.arange(1, 1 + NDEV * 16, dtype=np.int64)) * NDEV
        lookup = msrv.make_serving_lookup(stacked, mesh, bucket_capacity=4)
        with pytest.raises(RuntimeError, match="bucket_capacity >= "):
            lookup(jnp.asarray(kv.encode_ids(hot)))
        # re-issue at the surfaced requirement: every id answered
        lookup16 = msrv.make_serving_lookup(stacked, mesh,
                                            bucket_capacity=16)
        got = np.asarray(lookup16(jnp.asarray(kv.encode_ids(hot))))
        want = np.asarray(kv.lookup_or_zeros(
            t, kv.encode_ids_np_to_device(hot)))
        np.testing.assert_array_equal(got, want)


class TestMeshLoadAndRefresh:
    def _export(self, d, t):
        md = serving.RankingMetadata()
        md.add_embedding_column(column_name="user", var_name="user_emb",
                                embedding_dim=DIM)
        serving.export_for_serving(d, {"user_emb": t}, md,
                                   enable_cutoff=False)

    def test_load_sharded_and_query(self, mesh):
        t, ids = train_single()
        with tempfile.TemporaryDirectory() as d:
            self._export(d, t)
            tables, md = msrv.load_for_serving_sharded(d, mesh)
            lookup = msrv.make_serving_lookup(tables["user_emb"], mesh)
            probe = ids[:NDEV * 32]
            got = np.asarray(lookup(jnp.asarray(kv.encode_ids(probe))))
            want = np.asarray(kv.lookup_or_zeros(
                t, kv.encode_ids_np_to_device(probe)))
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_load_sharded_quantized(self, mesh):
        t, ids = train_single()
        with tempfile.TemporaryDirectory() as d:
            self._export(d, t)
            tables, _ = msrv.load_for_serving_sharded(d, mesh,
                                                      quantize=True)
            lookup = msrv.make_serving_lookup(tables["user_emb"], mesh)
            probe = ids[:NDEV * 32]
            got = np.asarray(lookup(jnp.asarray(kv.encode_ids(probe))))
            want = np.asarray(kv.lookup_or_zeros(
                t, kv.encode_ids_np_to_device(probe)))
            tol = np.abs(want).max() / 120.0 + 1e-6
            np.testing.assert_allclose(got, want, atol=float(tol))

    def test_delta_refresh_applies_per_shard(self, mesh):
        """Train → full export → mesh load; train MORE → delta save with
        the mesh's shard count → per-shard refresh; refreshed mesh answers
        with the post-delta rows (f32 and int8)."""
        from tfplus_tpu.checkpoint import saver as cksaver
        opt = tft.AdamOptimizer(learning_rate=0.01)
        t, ids = train_single()
        with tempfile.TemporaryDirectory() as d:
            self._export(d, t)
            f32_tables, _ = msrv.load_for_serving_sharded(d, mesh)
            q_tables, _ = msrv.load_for_serving_sharded(d, mesh,
                                                        quantize=True)

            # trainer side: clear deltalist, keep training, delta-save
            # into the MESH's shard layout (key % NDEV)
            t2 = kv.clear_deltalist(t)
            rng = np.random.RandomState(9)
            new_ids = rng.randint(4000, 5000, 256).astype(np.int64)
            u = kv.unique_with_counts(kv.encode_ids_np_to_device(new_ids))
            res = kv.lookup_or_insert(t2, u.unique_keys, counts=u.counts)
            t2 = opt.apply(res.table, res.slot, res.rows * 0.2 + 0.05,
                           lr=0.01, step=10)
            # export the REAL deltalist and shard the touched rows by owner
            ex = kv.export_arrays(t2, delta=True)
            prefix = os.path.join(d, "delta-1")
            shard_deltas = []
            for i in range(NDEV):
                m = ex["keys"] % NDEV == i
                s = kv.create(DIM, 2048, seed=3)
                s = kv.import_arrays(
                    s, {"keys": ex["keys"][m], "values": ex["values"][m]},
                    clear=False)
                shard_deltas.append(s)
            cksaver.save(prefix, {"user_emb": shard_deltas},
                         first_n=cksaver.FIRST_N_INFERENCE,
                         enable_cutoff=False)

            for tabs, qz in ((f32_tables, False), (q_tables, True)):
                refreshed = msrv.refresh_sharded_from_delta(
                    tabs, prefix, mesh, quantize=qz)
                lookup = msrv.make_serving_lookup(refreshed["user_emb"],
                                                  mesh)
                probe = np.concatenate([np.unique(new_ids)[:NDEV * 16],
                                        ids[:NDEV * 16]])
                probe = probe[:len(probe) - len(probe) % NDEV]
                got = np.asarray(lookup(jnp.asarray(kv.encode_ids(probe))))
                want = np.asarray(kv.lookup_or_zeros(
                    t2, kv.encode_ids_np_to_device(probe)))
                tol = (np.abs(want).max() / 120.0 + 1e-6) if qz else 1e-6
                np.testing.assert_allclose(
                    got, want, atol=float(tol),
                    err_msg=f"quantize={qz} refresh mismatch")
