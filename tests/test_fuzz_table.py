"""Differential fuzz: random op sequences on a KvTable vs a python dict
model. Catches cross-op interactions (delete→reinsert over tombstones,
grow/compact mid-sequence, freq saturation, TTL eviction, blacklist reads)
that single-op tests can't.

The model never replicates init-pool math: inserts carry explicit rows, and
for lookup_or_insert misses the model ADOPTS the engine's returned row, so
comparisons stay exact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfplus_tpu import kv

DIM = 8


def enc(ids_np):
    return kv.encode_ids_np_to_device(np.asarray(ids_np, np.int64))


class Model:
    def __init__(self):
        self.rows = {}     # id -> np[DIM]
        self.freq = {}     # id -> int (saturating uint16)
        self.day = {}      # id -> int
        self.black = set()

    def upsert(self, i, row, day, blacklist=False, bump=0, set_freq=None):
        self.rows[i] = np.array(row, np.float32)
        if set_freq is not None:
            self.freq[i] = set_freq          # insert() PACKS fresh meta
        else:
            self.freq[i] = min(self.freq.get(i, 0) + bump, 0xFFFF)
        self.day[i] = day
        if blacklist:
            self.black.add(i)
        else:
            self.black.discard(i)

    def expect_row(self, i):
        if i not in self.rows or i in self.black:
            return np.zeros(DIM, np.float32)
        return self.rows[i]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_op_sequence(seed):
    rng = np.random.RandomState(seed)
    t = kv.create(DIM, 256, max_probes=16, seed=seed)   # small: forces grow
    m = Model()
    universe = rng.choice(100_000, 600, replace=False)
    day = 1

    for step in range(30):
        op = rng.choice(
            ["insert", "lookup_insert", "scatter_add", "scatter_update",
             "delete", "ttl", "compact"],
            p=[0.25, 0.25, 0.15, 0.1, 0.1, 0.05, 0.1])
        ids_np = np.unique(rng.choice(universe, rng.randint(1, 40)))
        q = enc(ids_np)

        if op == "insert":
            rows = rng.randn(len(ids_np), DIM).astype(np.float32)
            if kv.needs_grow(t, len(ids_np)):
                t = kv.grow(t)
            t = kv.insert(t, q, jnp.asarray(rows), day=day)
            # bucket overflow can drop NEW keys even under the load-factor
            # threshold (both candidate buckets full) — the engine's
            # documented contract; mirror it via a find
            placed = np.asarray(jax.device_get(kv.find(t, q).found))
            for j, i in enumerate(ids_np):
                if placed[j]:
                    # insert updates the VALUE only for existing rows
                    # (reference InsertOrUpdate, kv_variable.h:458-464):
                    # freq and last-touch day are PRESERVED; new rows
                    # stamp freq=1 and the given day
                    ii = int(i)
                    if ii in m.rows:
                        keep_day, keep_freq = m.day[ii], m.freq[ii]
                        m.upsert(ii, rows[j], keep_day, set_freq=keep_freq)
                    else:
                        m.upsert(ii, rows[j], day, set_freq=1)

        elif op == "lookup_insert":
            if kv.needs_grow(t, len(ids_np)):
                t = kv.grow(t)
            res = kv.lookup_or_insert(t, q, day=day)
            t = res.table
            got = np.asarray(jax.device_get(res.rows))
            placed = np.asarray(jax.device_get(res.slot)) >= 0
            for j, i in enumerate(ids_np):
                i = int(i)
                if not placed[j]:
                    continue                      # bucket overflow: dropped
                if i in m.black:
                    # blacklisted rows read zeros but keep stored value
                    m.freq[i] = min(m.freq.get(i, 0) + 1, 0xFFFF)
                    m.day[i] = day
                elif i in m.rows:
                    m.freq[i] = min(m.freq[i] + 1, 0xFFFF)
                    m.day[i] = day
                else:
                    m.upsert(i, got[j], day, bump=1)   # adopt engine init

        elif op in ("scatter_add", "scatter_update"):
            upd = rng.randn(len(ids_np), DIM).astype(np.float32)
            if kv.needs_grow(t, len(ids_np)):
                t = kv.grow(t)
            t = kv.scatter(t, q, jnp.asarray(upd),
                           "add" if op == "scatter_add" else "update",
                           day=day)
            placed = np.asarray(jax.device_get(kv.find(t, q).found))
            after = np.asarray(jax.device_get(kv.lookup_or_zeros(t, q)))
            for j, i in enumerate(ids_np):
                i = int(i)
                if not placed[j]:
                    continue                      # bucket overflow: dropped
                if i in m.rows and i not in m.black:
                    base = m.rows[i]
                    new = base + upd[j] if op == "scatter_add" else upd[j]
                elif i in m.black:
                    # blacklisted rows read as zeros into the op
                    new = upd[j] if op == "scatter_update" else upd[j] + 0.0
                else:
                    # miss: engine inserts an init-pool row FIRST, then
                    # applies the op — adopt its result
                    new = after[j]
                # scatter clears the blacklist bit (reactivation)
                m.upsert(i, new, day, blacklist=False, bump=1)

        elif op == "delete":
            present = [i for i in ids_np if int(i) in m.rows]
            if present:
                t, _ = kv.delete(t, enc(present))
                for i in present:
                    i = int(i)
                    m.rows.pop(i, None); m.freq.pop(i, None)
                    m.day.pop(i, None); m.black.discard(i)

        elif op == "ttl":
            thresh = 2
            t, _ = kv.delete_with_timestamp(t, thresh, day=day)
            dead = [i for i, d in m.day.items() if (day - d) > thresh]
            for i in dead:
                m.rows.pop(i, None); m.freq.pop(i, None)
                m.day.pop(i, None); m.black.discard(i)
            day += 1

        elif op == "compact":
            t = kv.compact(t)

        day += int(rng.rand() < 0.3)

        # --- invariants after every op --------------------------------
        assert int(jax.device_get(kv.size(t))) == len(m.rows), (step, op)

    # final deep check: every model key reads back exactly; absent keys zero
    all_ids = sorted(m.rows)
    if all_ids:
        got = np.asarray(jax.device_get(kv.lookup_or_zeros(t, enc(all_ids))))
        want = np.stack([m.expect_row(i) for i in all_ids])
        np.testing.assert_allclose(got, want, rtol=1e-6, err_msg="row values")
        cnt = np.asarray(jax.device_get(kv.get_count(t, enc(all_ids))))
        np.testing.assert_array_equal(
            cnt, np.array([m.freq[i] for i in all_ids], cnt.dtype))
    absent = [int(i) for i in universe if int(i) not in m.rows][:20]
    gz = np.asarray(jax.device_get(kv.lookup_or_zeros(t, enc(absent))))
    np.testing.assert_allclose(gz, 0.0)


@pytest.mark.parametrize("seed", [10, 11])
def test_checkpoint_lineage_fuzz(seed, tmp_path, ckpt_dir=None):
    """Random train/full/delta/crash-restore sequences: after every restore
    the table must equal the dict model that tracked only COMMITTED state
    (mutations since the last save are lost, exactly like a real crash).
    ``ckpt_dir`` overrides the lineage directory (oss:// integration fuzz)."""
    from tfplus_tpu import checkpoint as ckpt

    rng = np.random.RandomState(seed)
    mgr = ckpt.CheckpointManager(ckpt_dir or str(tmp_path / f"s{seed}"),
                                 max_to_keep=3)
    t = kv.create(DIM, 512, seed=seed)
    committed = {}        # id -> row, as of the last save
    live = {}             # id -> row, current
    universe = rng.choice(50_000, 300, replace=False)
    step = 0
    have_full = False
    day = 1
    days = {}           # id -> last-touch day (for TTL through deltas)
    committed_days = {}  # day snapshot at the last save (restored rows carry
                         # their packed per-row day, so the model must too)

    for _ in range(25):
        op = rng.choice(["mutate", "full", "delta", "crash_restore"],
                        p=[0.55, 0.15, 0.2, 0.1])
        if op == "mutate":
            ids_np = np.unique(rng.choice(universe, rng.randint(1, 30)))
            rows = rng.randn(len(ids_np), DIM).astype(np.float32)
            if kv.needs_grow(t, len(ids_np)):
                t = kv.grow(t)
            t = kv.insert(t, enc(ids_np), jnp.asarray(rows), day=day)
            placed = np.asarray(jax.device_get(kv.find(t, enc(ids_np)).found))
            for j, i in enumerate(ids_np):
                if placed[j]:
                    live[int(i)] = rows[j]
                    days[int(i)] = day
            # occasional deletes exercise the delta deletion log
            if rng.rand() < 0.3 and live:
                dead = rng.choice(sorted(live), min(5, len(live)),
                                  replace=False)
                t, _ = kv.delete(t, enc(dead))
                for i in dead:
                    live.pop(int(i), None); days.pop(int(i), None)
            # occasional TTL evictions also flow through the deletion log
            if rng.rand() < 0.2:
                day += 3
                t, _ = kv.delete_with_timestamp(t, 2, day=day)
                for i in [i for i, d in days.items() if (day - d) > 2]:
                    live.pop(i, None); days.pop(i, None)
            day += int(rng.rand() < 0.4)
        elif op == "full" or (op == "delta" and not have_full):
            step += 1
            out = mgr.save({"emb": t}, step=step, full=True)
            t = out["emb"]
            committed = dict(live)
            committed_days = dict(days)
            have_full = True
        elif op == "delta":
            step += 1
            out = mgr.save({"emb": t}, step=step, full=False)
            t = out["emb"]
            committed = dict(live)
            committed_days = dict(days)
        elif op == "crash_restore" and have_full:
            # crash: lose everything since the last save, restore lineage
            restored, _, _ = mgr.restore({"emb": kv.create(DIM, 512,
                                                           seed=seed + 1)})
            t = restored["emb"]
            live = dict(committed)
            days = dict(committed_days)
            assert int(jax.device_get(kv.size(t))) == len(live)
            if live:
                ids_s = sorted(live)
                got = np.asarray(jax.device_get(
                    kv.lookup_or_zeros(t, enc(ids_s))))
                want = np.stack([live[i] for i in ids_s])
                np.testing.assert_allclose(got, want, rtol=1e-6)

    if have_full:
        restored, _, _ = mgr.restore({"emb": kv.create(DIM, 512, seed=99)})
        assert int(jax.device_get(kv.size(restored["emb"]))) == len(committed)


@pytest.mark.parametrize("seed", [20, 21])
def test_hybrid_storage_fuzz(seed):
    """Random insert/spill/prefetch/async-prefetch sequences on a
    HybridTable: no row is ever lost or duplicated across the tiers, values
    survive round trips, and the tier-aware export always sees every row."""
    from tfplus_tpu.kv import storage

    rng = np.random.RandomState(seed)
    t = kv.create(DIM, 512, seed=seed)
    ht = storage.HybridTable(t, max_live=300)
    vals = {}          # id -> row (ground truth, wherever the row lives)
    universe = rng.choice(30_000, 400, replace=False)

    for step in range(20):
        op = rng.choice(["insert", "spill", "prefetch", "async", "export"],
                        p=[0.45, 0.2, 0.15, 0.1, 0.1])
        if op == "insert":
            ids_np = np.unique(rng.choice(universe, rng.randint(1, 40)))
            rows = rng.randn(len(ids_np), DIM).astype(np.float32)
            if kv.needs_grow(ht.table, len(ids_np)):
                ht.table = kv.grow(ht.table)
            # inserting an id that lives in the HOST tier must not fork it:
            # promote first (the documented between-step protocol)
            ht.prefetch(ids_np.astype(np.uint64))
            ht.table = kv.insert(ht.table, enc(ids_np), jnp.asarray(rows))
            placed = np.asarray(jax.device_get(
                kv.find(ht.table, enc(ids_np)).found))
            for j, i in enumerate(ids_np):
                if placed[j]:
                    vals[int(i)] = rows[j]
        elif op == "spill":
            ht.maybe_spill()
        elif op == "prefetch":
            if vals:
                pick = rng.choice(sorted(vals), min(20, len(vals)),
                                  replace=False)
                ht.prefetch(pick.astype(np.uint64))
        elif op == "async":
            if vals:
                pick = rng.choice(sorted(vals), min(20, len(vals)),
                                  replace=False)
                ht.prefetch_async(pick.astype(np.uint64))
                ht.apply_prefetch()
        elif op == "export":
            ex = storage.export_hybrid_arrays(ht.table, ht.tier)
            keys = set(np.asarray(ex["keys"]).astype(np.int64).tolist())
            assert keys == set(vals), (step, len(keys), len(vals))

        # invariant: logical size == model size (no loss, no forks)
        assert ht.logical_size == len(vals), (step, op)

    # every row readable with its exact value, wherever it lives
    ids_s = sorted(vals)
    got = np.zeros((len(ids_s), DIM), np.float32)
    fr = kv.find(ht.table, enc(ids_s))
    found = np.asarray(jax.device_get(fr.found))
    dev_rows = np.asarray(jax.device_get(
        kv.lookup_or_zeros(ht.table, enc(ids_s))))
    host_found, host_rows, _ = ht.tier.lookup_rows(
        np.asarray(ids_s, np.uint64))
    for j, i in enumerate(ids_s):
        assert found[j] != host_found[j], (i, "must live in exactly one tier")
        got[j] = dev_rows[j] if found[j] else host_rows[j][:DIM]
    np.testing.assert_allclose(
        got, np.stack([vals[i] for i in ids_s]), rtol=1e-6)


def test_multi_table_isolation_fuzz():
    """Logical tables packed into one physical table (kv.multi tag packing)
    must stay perfectly isolated even with fully-overlapping raw id ranges."""
    from tfplus_tpu.kv import multi

    rng = np.random.RandomState(5)
    mt = multi.MultiTable(DIM, 1 << 12)
    names = ["users", "items", "ads"]
    model = {n: {} for n in names}
    for n in names:
        mt.register(n)

    for step in range(15):
        name = names[rng.randint(3)]
        ids_np = np.unique(rng.randint(0, 500, rng.randint(1, 30)))
        rows = rng.randn(len(ids_np), DIM).astype(np.float32)
        if kv.needs_grow(mt.table, len(ids_np)):
            mt.table = kv.grow(mt.table)
        q = mt.tag(name, jnp.asarray(ids_np.astype(np.int32)))
        mt.table = kv.insert(mt.table, q, jnp.asarray(rows))
        for j, i in enumerate(ids_np):
            model[name][int(i)] = rows[j]

    # per-table reads are isolated despite identical raw id ranges
    for name in names:
        ids_s = sorted(model[name])
        if not ids_s:
            continue
        q = mt.tag(name, jnp.asarray(np.asarray(ids_s, np.int32)))
        got = np.asarray(jax.device_get(kv.lookup_or_zeros(mt.table, q)))
        np.testing.assert_allclose(
            got, np.stack([model[name][i] for i in ids_s]), rtol=1e-6,
            err_msg=name)

    # export_split separates the logical tables exactly
    split = mt.export_split()
    for name in names:
        assert set(split[name]["keys"].astype(np.int64).tolist()) == \
            set(model[name]), name
    assert int(jax.device_get(kv.size(mt.table))) == \
        sum(len(v) for v in model.values())


def test_checkpoint_lineage_fuzz_chunked(tmp_path, monkeypatch):
    """The lineage fuzz again, with the saver's chunk budget forced tiny so
    every save/restore/repartition in the sequence exercises the CHUNKED
    streaming path (multi-segment writes, lookup-slice restores) instead of
    the single-chunk fast case small tests otherwise hit."""
    from tfplus_tpu.checkpoint import saver as _saver
    monkeypatch.setattr(_saver, "DEFAULT_CHUNK_BYTES", 256)  # ~16 rows/chunk
    test_checkpoint_lineage_fuzz(12, tmp_path)
