"""2D (row x col) table sharding: lookups/updates over a ("row","col") mesh
must reproduce a single full-width table exactly — including GroupAdam's
l21 blacklist decisions, which span column shards via a psum'd group norm.
Runs on 8 fake CPU devices (tests/conftest.py) as 2x4 and 4x2 meshes.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tfplus_tpu import kv, train
from tfplus_tpu.kv import table as kvt
from tfplus_tpu.parallel import sharded2d as s2


DIM = 16
CAP = 256


def full_pool(seed=3):
    rng = np.random.RandomState(seed)
    return (rng.rand(kvt.DEFAULT_INIT_POOL_ROWS, DIM).astype(np.float32)
            - 0.5) * 0.1


def make_ref_table(opt=None):
    t = kv.create(DIM, CAP * 4, initializer=jnp.asarray(full_pool()), seed=0)
    if opt is not None:
        t = opt.init(t)
    return t


def make_2d(R, C, opt=None):
    t = s2.create_sharded_2d(DIM, CAP, R, C, initializer=full_pool(), seed=0)
    if opt is not None:
        t = s2.init_optimizer_sharded_2d(opt, t)
    return t


def run_2d(R, C, ids_np, steps=1, opt=None, lr=0.1, l21=False):
    """Jit a 2D train/lookup step over an RxC mesh; returns (rows per step,
    final stacked table)."""
    mesh = s2.make_mesh_2d(R, C)
    opt2 = s2.for_col_axis(opt) if opt is not None else None
    t = make_2d(R, C, opt)
    tspec = jax.tree_util.tree_map(lambda _: P("row", "col"), t)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(tspec, P(("row", "col"))),
                       out_specs=(P(("row", "col")), tspec),
                       check_vma=False)
    def step_fn(tab, ids):
        rows, state, tab = s2.sharded_lookup_2d(tab, ids,
                                                defer_meta=opt is not None)
        if opt is not None:
            g = rows * 0.5 + 0.01           # deterministic synthetic grads
            tab = s2.sharded_apply_grads_2d(opt2, tab, state, g,
                                            lr=lr, step=1)
        return rows, tab

    jstep = jax.jit(step_fn)
    ids = kv.encode_ids_np_to_device(ids_np)
    outs = []
    for _ in range(steps):
        rows, t = jstep(t, ids)
        outs.append(np.asarray(jax.device_get(rows)))
    return outs, t


def run_ref(ids_np, steps=1, opt=None, lr=0.1):
    t = make_ref_table(opt)
    ids = kv.encode_ids_np_to_device(ids_np)
    outs = []
    for _ in range(steps):
        u = kv.unique_with_counts(ids)
        res = kv.lookup_or_insert(t, u.unique_keys, counts=u.counts)
        rows = res.rows[u.inverse]
        outs.append(np.asarray(jax.device_get(rows)))
        t = res.table
        if opt is not None:
            # same synthetic grads, summed over duplicate positions
            g = rows * 0.5 + 0.01
            ug = jax.ops.segment_sum(g, u.inverse,
                                     num_segments=ids_np.shape[0])
            t = opt.apply(t, res.slot, ug, lr=lr, step=1)
    return outs, t


@pytest.mark.parametrize("R,C", [(2, 4), (4, 2)])
def test_lookup_matches_single_table(R, C):
    rng = np.random.RandomState(0)
    ids_np = rng.randint(0, 1000, 64).astype(np.int64)
    got, t2d = run_2d(R, C, ids_np)
    want, _ = run_ref(ids_np)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-6)
    # headers identical across col ranks (lockstep invariant)
    hdr = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves({"h": t2d.header})[0]))
    for r in range(R):
        for c in range(1, C):
            np.testing.assert_array_equal(hdr[r, c], hdr[r, 0])


@pytest.mark.parametrize("R,C", [(2, 4)])
def test_groupadam_train_matches_single_table(R, C):
    """The acid test: l21 > 0 makes every column shard's update depend on
    the FULL row norm (psum over col) and must blacklist identically."""
    rng = np.random.RandomState(1)
    ids_np = rng.randint(0, 200, 64).astype(np.int64)
    opt = train.GroupAdamOptimizer(l21_regularization_strength=0.05)
    got, t2d = run_2d(R, C, ids_np, steps=3, opt=opt)
    want, tref = run_ref(ids_np, steps=3, opt=opt)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
    # post-update values identical too (incl. zeroed/blacklisted rows)
    q = kv.encode_ids_np_to_device(ids_np)
    ref_rows = np.asarray(kv.lookup_or_zeros(tref, q))
    combined = s2.combine_col_shards(t2d)
    merged = []
    for r in range(R):
        merged.append(combined[r])
    # read each id from its owner row shard
    owner = kv.shard_of(q, R)
    rows2d = np.zeros_like(ref_rows)
    for r in range(R):
        m = np.asarray(owner) == r
        if m.any():
            sub = kv.encode_ids_np_to_device(ids_np[m])
            rows2d[m] = np.asarray(kv.lookup_or_zeros(merged[r], sub))
    np.testing.assert_allclose(rows2d, ref_rows, rtol=1e-5, atol=1e-6)
    # the l21 branch must actually fire: some rows blacklisted, identically
    # on the reference and the merged 2D shards
    def n_black(t):
        m = np.asarray(jax.device_get(t.meta)).view(np.uint32)
        return int(((m & np.uint32(kvt.FLAG_BLACKLIST)) != 0).sum())

    assert n_black(tref) > 0, "test grads never triggered the l21 blacklist"
    assert sum(n_black(t) for t in merged) == n_black(tref)


def test_combine_col_shards_roundtrip():
    """combine_col_shards folds [R, C] payload slices back into full-dim
    row-shard tables with the correct [values | m | v | linear] layout."""
    R, C = 2, 4
    rng = np.random.RandomState(2)
    ids_np = rng.randint(0, 500, 128).astype(np.int64)
    opt = train.AdamOptimizer()
    got, t2d = run_2d(R, C, ids_np, steps=2, opt=opt)
    combined = s2.combine_col_shards(t2d)
    assert combined[0].config.dim == DIM
    assert combined[0].payload.shape[-1] == DIM * (1 + opt.rule.slot_width)
    want, tref = run_ref(ids_np, steps=2, opt=opt)
    q = kv.encode_ids_np_to_device(ids_np)
    owner = np.asarray(kv.shard_of(q, R))
    ref_rows = np.asarray(kv.lookup_or_zeros(tref, q))
    for r in range(R):
        m = owner == r
        if m.any():
            sub = kv.encode_ids_np_to_device(ids_np[m])
            np.testing.assert_allclose(
                np.asarray(kv.lookup_or_zeros(combined[r], sub)),
                ref_rows[m], rtol=1e-5, atol=1e-6)


def test_fuzz_multi_step_zipf():
    """3 random zipf-skewed GroupAdam steps on a 2x4 mesh must track the
    single full-width table exactly (dup-heavy batches stress owner-side
    dedup and the col-lockstep headers)."""
    rng = np.random.RandomState(7)
    opt = train.GroupAdamOptimizer(l21_regularization_strength=0.02)
    seqs = [(rng.zipf(1.4, 64) % 300).astype(np.int64) for _ in range(3)]

    mesh = s2.make_mesh_2d(2, 4)
    opt2 = s2.for_col_axis(opt)
    t2d = make_2d(2, 4, opt)
    tspec = jax.tree_util.tree_map(lambda _: P("row", "col"), t2d)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(tspec, P(("row", "col")), P()),
                       out_specs=(P(("row", "col")), tspec),
                       check_vma=False)
    def step2d(tab, ids, s):
        rows, state, tab = s2.sharded_lookup_2d(tab, ids, defer_meta=True)
        g = rows * 0.3 + 0.05
        tab = s2.sharded_apply_grads_2d(opt2, tab, state, g, lr=0.1, step=s)
        return rows, tab

    tref = make_ref_table(opt)
    jstep = jax.jit(step2d)
    for s, ids_np in enumerate(seqs, start=1):
        rows2d, t2d = jstep(t2d, kv.encode_ids_np_to_device(ids_np),
                            jnp.int32(s))
        u = kv.unique_with_counts(kv.encode_ids(ids_np))
        res = kv.lookup_or_insert(tref, u.unique_keys, counts=u.counts)
        rows1 = res.rows[u.inverse]
        np.testing.assert_allclose(np.asarray(rows2d), np.asarray(rows1),
                                   rtol=1e-5, atol=1e-6)
        g = np.asarray(rows1) * 0.3 + 0.05
        ug = jax.ops.segment_sum(jnp.asarray(g), u.inverse,
                                 num_segments=ids_np.shape[0])
        tref = opt.apply(res.table, res.slot, ug, lr=0.1, step=s)

    # final values identical on every touched id
    probe = np.unique(np.concatenate(seqs))
    want = np.asarray(kv.lookup_or_zeros(tref, kv.encode_ids(probe)))
    combined = s2.combine_col_shards(jax.device_get(t2d))
    owner = np.asarray(kv.shard_of(kv.encode_ids(probe), 2))
    got = np.zeros_like(want)
    for r in range(2):
        m = owner == r
        if m.any():
            got[m] = np.asarray(kv.lookup_or_zeros(
                combined[r], kv.encode_ids(probe[m])))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_2d_compressed_exchange_close_to_exact():
    """exchange_dtype threads through both the row and col wires of the 2D
    path; results stay within bf16 rounding of the exact exchange."""
    import functools
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from tfplus_tpu import train as tft
    from tfplus_tpu.parallel import sharded2d as s2

    R, C, dim, bl = 4, 2, 8, 8
    mesh = s2.make_mesh_2d(R, C)
    opt = s2.for_col_axis(tft.GroupAdamOptimizer())

    def build():
        t = s2.create_sharded_2d(dim, 256, R, C, seed=0)
        t = s2.init_optimizer_sharded_2d(opt, t)
        return jax.device_put(t, s2.table_sharding_2d(mesh))

    def make_step(xdtype):
        tspec = jax.tree_util.tree_map(lambda _: P("row", "col"), build())

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(tspec, P(("row", "col")),
                                     P(("row", "col"))),
                           out_specs=(tspec, P()), check_vma=False)
        def step(tab, ids, y):
            rows, state, tab = s2.sharded_lookup_2d(
                tab, ids, exchange_dtype=xdtype)
            loss, g = jax.value_and_grad(
                lambda r: jnp.mean((r.sum(-1) - y) ** 2))(rows)
            tab = s2.sharded_apply_grads_2d(opt, tab, state, g, lr=0.05,
                                            step=1, exchange_dtype=xdtype)
            return tab, jax.lax.pmean(loss, ("row", "col"))
        return jax.jit(step)

    rng = np.random.RandomState(0)
    idn = rng.randint(1, 200, bl * R * C).astype(np.int64)
    ids = kv.encode_ids_np_to_device(idn)
    y = jnp.asarray((idn % 5).astype(np.float32))
    t_exact, l_exact = make_step(None)(build(), ids, y)
    t_bf16, l_bf16 = make_step(jnp.bfloat16)(build(), ids, y)
    assert t_bf16.payload.dtype == jnp.float32
    assert abs(float(l_exact) - float(l_bf16)) < 5e-2
    np.testing.assert_allclose(np.asarray(t_bf16.payload, np.float32),
                               np.asarray(t_exact.payload, np.float32),
                               atol=5e-2)


class TestSharded2DGrowth:
    """Online growth for row x col sharded tables: the 2D analogue of
    TestShardedGrowth (reference parity: PS tables grow without bound,
    kv_variable.h:287-380). Col lockstep must survive the rehash — grow's
    placement is a pure function of (keys, capacity), so col ranks of a
    row stay bitwise-identical with no cross-col sync."""

    def test_grow_past_wall_matches_single_grown_table(self):
        R, C = 4, 2
        cap0 = 64                       # wall at ~44 rows/row-shard
        bs = 128                        # fresh ids per step
        opt = train.AdagradOptimizer()
        mesh = s2.make_mesh_2d(R, C)
        opt2 = s2.for_col_axis(opt)
        t = s2.create_sharded_2d(DIM, cap0, R, C, initializer=full_pool(),
                                 seed=0)
        t = s2.init_optimizer_sharded_2d(opt, t)
        tshard = s2.table_sharding_2d(mesh)
        t = jax.device_put(t, tshard)
        tspec = jax.tree_util.tree_map(lambda _: P("row", "col"), t)
        single = opt.init(kv.create(DIM, cap0,
                                    initializer=jnp.asarray(full_pool()),
                                    seed=0))

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(tspec, P(("row", "col")), P()),
                           out_specs=(P(("row", "col")), tspec, P()),
                           check_vma=False)
        def step(tab, ids, s):
            rows, state, tab = s2.sharded_lookup_2d(tab, ids,
                                                    defer_meta=True)
            g = rows * 0.25 + 0.5
            tab = s2.sharded_apply_grads_2d(opt2, tab, state, g,
                                            lr=0.1, step=s)
            over = jax.lax.pmax(jax.lax.pmax(
                state.overflow.astype(jnp.int32), "row"), "col")
            return rows, tab, over

        jstep = jax.jit(step)
        inc = 2 * bs // R
        for s in range(1, 6):
            fresh = np.arange((s - 1) * bs, s * bs - 32, dtype=np.int64)
            revisit = np.arange(0, 32, dtype=np.int64)
            ids_np = np.concatenate([fresh, revisit])

            if s2.sharded_needs_grow_2d(t, incoming_per_shard=inc):
                t = s2.sharded_grow_2d(t, incoming_per_shard=inc,
                                       sharding=tshard)
            single = kv.grow_to_fit(single, incoming=bs)

            rows_2d, t, overflow = jstep(
                t, kv.encode_ids_np_to_device(ids_np), jnp.int32(s))
            assert int(overflow) == 0, f"overflow at step {s} despite growth"

            u = kv.unique_with_counts(kv.encode_ids(ids_np))
            res = kv.lookup_or_insert(single, u.unique_keys, counts=u.counts)
            if bool(res.overflow):
                single = kv.grow(single)
                res = kv.lookup_or_insert(single, u.unique_keys,
                                          counts=u.counts)
                assert not bool(res.overflow)
            rows_single = res.rows[u.inverse]
            np.testing.assert_allclose(np.asarray(rows_2d),
                                       np.asarray(rows_single), rtol=1e-5,
                                       err_msg=f"step {s}")
            g = np.asarray(rows_single) * 0.25 + 0.5
            ug = jax.ops.segment_sum(jnp.asarray(g), u.inverse,
                                     num_segments=ids_np.shape[0])
            single = opt.apply(res.table, res.slot, ug, lr=0.1, step=s)

        # the wall was actually hit
        per_shard_cap = t.header.shape[-2] * 16
        assert per_shard_cap > cap0, "test never grew — raise the id volume"

        # col lockstep survived the rehash: headers bitwise-equal across c
        hdr = np.asarray(jax.device_get(t.header))
        for r in range(R):
            for c in range(1, C):
                np.testing.assert_array_equal(hdr[r, c], hdr[r, 0])

        # final values match the single grown table row-for-row
        all_ids = np.arange(0, 5 * bs - 32, dtype=np.int64)
        q = kv.encode_ids_np_to_device(all_ids)
        want = np.asarray(kv.lookup_or_zeros(single, q))
        got = []
        for r in range(R):
            full = s2.combine_col_shards(
                jax.tree_util.tree_map(lambda x: x[r:r+1], t))[0]
            got.append(np.asarray(kv.lookup_or_zeros(full, q)))
        got_merged = np.zeros_like(want)
        for r, rows in enumerate(got):
            sel = (all_ids % R) == r
            got_merged[sel] = rows[sel]
        np.testing.assert_allclose(got_merged, want, rtol=1e-5)
