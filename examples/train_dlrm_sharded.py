"""Sharded DLRM training over a device mesh — the flagship distributed
configuration (BASELINE.json config 4: "DLRM-style multi-table row-sharded
training with all-to-all exchange").

Every table is row-sharded over the mesh axis (`key % num_devices`) and the
batch is data-parallel over the same axis: per step, each device dedups its
ids, all-to-alls them to the owner shards over ICI, owners do the fused
lookup-or-insert, rows ride the mirrored all-to-all back, and gradients take
the reverse path into the fused sparse-optimizer update (docs/distribution.md).

On CPU this runs on 8 fake devices; on a pod slice the identical code runs
over ICI. Finishes with a sharded checkpoint save + elastic N→2N restore.

Usage: python examples/train_dlrm_sharded.py --cpu [--batches 60]
"""
import argparse
import functools
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--cols", type=int, default=1,
                    help="column shards per table (2D sparse parallelism; "
                         "devices/cols row shards x cols col shards)")
    ap.add_argument("--batches", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=1 << 13,
                    help="initial per-shard capacity; tables GROW online "
                         "when the load factor or an overflow flag trips")
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.002)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bucket-capacity", type=int, default=None,
                    help="per-destination exchange-bucket capacity (unique "
                         "ids per source->owner pair); default 2x balanced "
                         "load. Set low (e.g. 8) to demo the automatic "
                         "route-overflow recovery: the step surfaces the "
                         "needed capacity, recompiles once, and retries "
                         "exactly the dropped ids — nothing is lost")
    ap.add_argument("--bf16-exchange", action="store_true",
                    help="halve the all_to_all wire bytes (lossy; "
                         "table state stays f32)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.devices}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from tfplus_tpu import kv, train as tft, parallel as par, checkpoint as ckpt
    from tfplus_tpu.data import synthetic
    from tfplus_tpu.models import DLRM

    n_dev = min(args.devices, jax.device_count())
    bs = args.batch_size - args.batch_size % n_dev
    if args.cols > 1:
        from tfplus_tpu.parallel import sharded2d as s2
        return main_2d(args, n_dev, bs, s2)
    mesh = par.make_mesh(n_dev)
    print(f"mesh: {n_dev} x {jax.devices()[0].device_kind}, batch {bs}")

    model = DLRM(num_tables=args.tables, embedding_dim=args.dim,
                 num_numeric=13, bottom_hidden=(64, args.dim),
                 top_hidden=(64, 32), capacity=args.capacity)
    opt = tft.GroupAdamOptimizer(learning_rate=args.lr)
    tx = optax.adam(args.lr)
    dense = model.init_dense(jax.random.PRNGKey(0))
    tx_state = tx.init(dense)

    tables = {}
    for name in sorted(model.table_specs):
        t = par.create_sharded(args.dim, model.table_specs[name]["capacity"],
                               n_dev, seed=hash(name) % 1000)
        t = par.init_optimizer_sharded(opt, t)
        tables[name] = jax.device_put(t, par.table_sharding(mesh))
    dense = jax.device_put(dense, par.replicated(mesh))
    tx_state = jax.device_put(tx_state, par.replicated(mesh))

    tspecs = {name: jax.tree_util.tree_map(lambda _: P("mp"), tables[name])
              for name in tables}
    vspecs = {name: P("mp") for name in tables}

    def build_step(bucket_cap, update_dense=True):
        """Train step closed over the STATIC exchange-bucket capacity.
        ``update_dense=False`` builds the route-overflow RETRY variant:
        same forward, dense tower frozen, only the (masked) sparse grads
        apply — so each dropped id contributes exactly once."""

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(tspecs, P(), P(), P("mp"), vspecs, P("mp"), P("mp"),
                      P()),
            out_specs=(tspecs, P(), P(), P(), P(), P(), P(), vspecs),
            check_vma=False)
        def step(tabs, dense, tx_state, ids, valids, feats, labels, s):
            rows, states = {}, {}
            for name in sorted(tabs):
                r, st, tabs[name] = par.sharded_lookup(
                    tabs[name], ids[name], valid=valids[name],
                    defer_meta=True, bucket_capacity=bucket_cap,
                    exchange_dtype=(jnp.bfloat16 if args.bf16_exchange
                                    else None))
                rows[name], states[name] = r, st

            def loss_fn(dense, rows):
                logits = model.apply(dense, rows, feats)
                return model.loss(logits, labels)

            loss, (g_dense, g_rows) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(dense, rows)
            if update_dense:
                g_dense = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(g, "mp"), g_dense)
                upd, tx_state = tx.update(g_dense, tx_state, dense)
                dense = optax.apply_updates(dense, upd)
            ovf = jnp.zeros((), jnp.int32)
            route_ovf = jnp.zeros((), jnp.int32)
            needed = jnp.zeros((), jnp.int32)
            dropped = {}
            for name in sorted(tabs):
                tabs[name] = par.sharded_apply_grads(
                    opt, tabs[name], states[name], g_rows[name],
                    lr=args.lr, step=s,
                    exchange_dtype=(jnp.bfloat16 if args.bf16_exchange
                                    else None))
                # grow only on TABLE overflow; bucket-routing overflow needs
                # a bigger bucket_capacity, which growing the table can't fix
                ovf = ovf | states[name].table_overflow.astype(jnp.int32)
                route_ovf = route_ovf | states[name].route_overflow.astype(
                    jnp.int32)
                needed = jnp.maximum(
                    needed, states[name].needed_bucket_capacity)
                dropped[name] = par.dropped_positions(states[name])
            ovf = jax.lax.pmax(ovf, "mp")
            route_ovf = jax.lax.pmax(route_ovf, "mp")
            return (tabs, dense, tx_state, jax.lax.pmean(loss, "mp"), ovf,
                    route_ovf, needed, dropped)
        return jax.jit(step, donate_argnums=(0,))

    bucket_cap = args.bucket_capacity
    jstep = build_step(bucket_cap)
    tsharding = par.table_sharding(mesh)
    all_valid = {n: jnp.ones((bs,), bool) for n in tables}

    gen = synthetic.dlrm_batches(bs, args.batches, num_tables=args.tables,
                                 vocab=30_000, seed=7)
    t0, seen, window = time.time(), 0, []
    total_route_dropped = 0
    for i, b in enumerate(gen):
        ids = {f"T{c}": kv.encode_ids(b["categorical"][:, c])
               for c in range(args.tables)}
        feats = jnp.asarray(b["numeric"])
        labels = jnp.asarray(b["label"])
        tables, dense, tx_state, loss, ovf, route_ovf, needed, dropped = \
            jstep(tables, dense, tx_state, ids, all_valid, feats, labels,
                  jnp.int32(i + 1))
        if bool(route_ovf):
            # route-overflow RECOVERY (never drop an id): raise the static
            # bucket capacity to the surfaced requirement (one recompile)
            # and re-run exactly the dropped positions, dense tower frozen
            bucket_cap = int(needed)
            n_drop = {n: int(np.asarray(m).sum()) for n, m in dropped.items()
                      if bool(np.asarray(m).any())}
            print(f"batch {i+1:4d} exchange-bucket overflow: dropped "
                  f"{n_drop} position(s); raising bucket_capacity to "
                  f"{bucket_cap} and retrying the dropped ids", flush=True)
            total_route_dropped += sum(n_drop.values())
            retry = build_step(bucket_cap, update_dense=False)
            tables, dense, tx_state, _, ovf2, r2, _, _ = retry(
                tables, dense, tx_state, ids, dropped, feats, labels,
                jnp.int32(i + 1))
            assert not bool(r2), "retry overflowed at the surfaced capacity"
            ovf = ovf | ovf2
            jstep = build_step(bucket_cap)   # future steps keep the new cap
        window.append(float(loss))
        seen += bs
        # online growth (reference parity: PS tables grow without bound,
        # kv_variable.h:287-380): an overflow flag means some id failed
        # placement THIS step — grow now and the next lookup inserts it;
        # the periodic load-factor sweep grows ahead of the wall.
        if bool(ovf) or (i + 1) % 20 == 0:
            tables, grew = par.grow_sharded_if_needed(
                tables, incoming_per_shard=bs // n_dev,
                overflow=ovf, sharding=tsharding)
            if grew:
                caps = {n: t.header.shape[-2] * 16 for n, t in tables.items()}
                print(f"batch {i+1:4d} grew tables to per-shard capacity "
                      f"{max(caps.values())} (step recompiles once)",
                      flush=True)
        if (i + 1) % 10 == 0:
            dt = time.time() - t0
            print(f"batch {i+1:4d} loss {np.mean(window):.5f} "
                  f"({seen/dt:.0f} examples/s)", flush=True)
            window = []

    sizes = {name: int(sum(kv.size(par.local_shard(t, i))
                           for i in range(n_dev)))
             for name, t in tables.items()}
    print("rows per table:", sizes)
    print(f"route-overflow recoveries: {total_route_dropped} dropped "
          f"position(s) retried, final bucket_capacity "
          f"{bucket_cap if bucket_cap else 'default (2x balanced)'}")

    # sharded checkpoint → elastic restore into 2x the shards
    with tempfile.TemporaryDirectory() as d:
        prefix = os.path.join(d, "ckpt-final")
        host_shards = {name: [par.local_shard(t, i) for i in range(n_dev)]
                       for name, t in tables.items()}
        ckpt.save(prefix, host_shards, {"dense": dense})
        tmpl = {name: [kv.create(args.dim, args.capacity, seed=0)
                       for _ in range(2 * n_dev)]
                for name in tables}
        tmpl = {name: [opt.init(s) for s in shards]
                for name, shards in tmpl.items()}
        restored, _ = ckpt.restore(prefix, tmpl, {"dense": dense})
        got = {name: sum(int(kv.size(s)) for s in shards)
               for name, shards in restored.items()}
        assert got == sizes, (got, sizes)
        print(f"elastic restore {n_dev} -> {2*n_dev} shards: row counts match")


def main_2d(args, n_dev, bs, s2):
    """2D sparse parallelism: tables sharded rows x cols (docs/distribution.md).
    Per-device all-to-all volume drops by the col count — the layout for very
    wide embeddings or large meshes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from tfplus_tpu import kv, train as tft
    from tfplus_tpu.data import synthetic
    from tfplus_tpu.models import DLRM

    C = args.cols
    R = n_dev // C
    assert R * C == n_dev and args.dim % C == 0
    mesh = s2.make_mesh_2d(R, C)
    print(f"2D mesh: {R} row x {C} col shards, batch {bs}")

    model = DLRM(num_tables=args.tables, embedding_dim=args.dim,
                 num_numeric=13, bottom_hidden=(64, args.dim),
                 top_hidden=(64, 32), capacity=1 << 13)
    opt = s2.for_col_axis(tft.GroupAdamOptimizer(learning_rate=args.lr))
    tx = optax.adam(args.lr)
    dense = model.init_dense(jax.random.PRNGKey(0))
    tx_state = tx.init(dense)

    tables = {}
    for name in sorted(model.table_specs):
        t = s2.create_sharded_2d(args.dim, args.capacity, R, C,
                                 seed=hash(name) % 1000)
        t = s2.init_optimizer_sharded_2d(opt, t)
        tables[name] = jax.device_put(t, s2.table_sharding_2d(mesh))
    repl = jax.sharding.NamedSharding(mesh, P())
    dense = jax.device_put(dense, repl)
    tx_state = jax.device_put(tx_state, repl)
    tspecs = {n: jax.tree_util.tree_map(lambda _: P("row", "col"), t)
              for n, t in tables.items()}
    both = ("row", "col")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tspecs, P(), P(), P(both), P(both), P(both), P()),
        out_specs=(tspecs, P(), P(), P(), P()),
        check_vma=False)
    def step(tabs, dense, tx_state, ids, feats, labels, s):
        rows, states = {}, {}
        for name in sorted(tabs):
            r, st, tabs[name] = s2.sharded_lookup_2d(tabs[name], ids[name],
                                                     defer_meta=True)
            rows[name], states[name] = r, st

        def loss_fn(dense, rows):
            logits = model.apply(dense, rows, feats)
            return model.loss(logits, labels)

        loss, (g_dense, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(dense, rows)
        g_dense = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, both), g_dense)
        upd, tx_state = tx.update(g_dense, tx_state, dense)
        dense = optax.apply_updates(dense, upd)
        for name in sorted(tabs):
            tabs[name] = s2.sharded_apply_grads_2d(
                opt, tabs[name], states[name], g_rows[name],
                lr=args.lr, step=s)
        ovf = jnp.stack([states[n].table_overflow
                         for n in sorted(states)]).any()
        ovf = jax.lax.pmax(jax.lax.pmax(ovf.astype(jnp.int32), "row"), "col")
        return tabs, dense, tx_state, jax.lax.pmean(loss, both), ovf

    jstep = jax.jit(step, donate_argnums=(0,))
    t2dsharding = s2.table_sharding_2d(mesh)
    gen = synthetic.dlrm_batches(bs, args.batches, num_tables=args.tables,
                                 vocab=30_000, seed=7)
    t0, seen, window = time.time(), 0, []
    for i, b in enumerate(gen):
        ids = {f"T{c}": kv.encode_ids(b["categorical"][:, c])
               for c in range(args.tables)}
        tables, dense, tx_state, loss, ovf = jstep(
            tables, dense, tx_state, ids, jnp.asarray(b["numeric"]),
            jnp.asarray(b["label"]), jnp.int32(i + 1))
        window.append(float(loss))
        seen += bs
        # online growth, 2D analogue of the row-sharded loop above
        if bool(ovf) or (i + 1) % 20 == 0:
            tables, grew = s2.grow_sharded_2d_if_needed(
                tables, incoming_per_shard=bs // R,
                overflow=ovf, sharding=t2dsharding)
            if grew:
                caps = {n: t.header.shape[-2] * 16 for n, t in tables.items()}
                print(f"batch {i+1:4d} grew tables to per-row-shard capacity "
                      f"{max(caps.values())} (step recompiles once)",
                      flush=True)
        if (i + 1) % 10 == 0:
            print(f"batch {i+1:4d} loss {np.mean(window):.5f} "
                  f"({seen/(time.time()-t0):.0f} examples/s)", flush=True)
            window = []
    sizes = {name: int(sum(kv.size(s2.local_shard_2d(t, r, 0))
                           for r in range(R)))
             for name, t in tables.items()}
    print("rows per table:", sizes)


if __name__ == "__main__":
    main()
