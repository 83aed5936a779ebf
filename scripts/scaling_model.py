"""Scaling-efficiency story for BASELINE.json's ">=90% examples/s from
1 -> N hosts" north star (round-3 verdict #9).

Single-chip environment: the claim cannot be MEASURED here, so this script
(a) measures a CPU-mesh weak-scaling run — a MECHANISM check that the
    program's per-device work is N-invariant except the exchange (it is
    NOT an ICI performance proxy: fake CPU devices share one host's
    memory bus, so contention grows with N by construction), and
(b) evaluates a documented analytic model of the v5e ICI exchange cost
    against the measured single-chip step time, printing the modeled
    efficiency per slice size and the volume headroom before the 90%
    line breaks.

Model (stated assumptions, calibratable on real multi-chip hardware):
  t_step(N) = t_compute + t_exchange(N) + t_psum(N)
  t_exchange = per-chip all-to-all bytes x (N-1)/N / BW_eff + L x ceil(log2 N)
  t_psum     = 2 x dense_bytes / BW_eff + L x ceil(log2 N)
  BW_eff     = effective per-chip ICI all-to-all bandwidth. v5e ships
               1600 Gbps (200 GB/s) aggregate ICI per chip; we model
               BW_eff = 100 GB/s (torus-routing discount, conservative).
  L          = 5 us per collective hop-stage (conservative small-message
               latency floor).
Per-chip exchange bytes are PROGRAM-EXACT for the sharded step: per table,
ids+counts out (12 B/id), rows back (4D B/id), grads out (4D B/id) — all
on dedup'd ids; bf16 wire compression (--bf16) halves the row/grad terms.
Weak scaling holds per-chip volume constant by construction (batch and
tables both sharded on the same axis), so the model's N-dependence is only
the (N-1)/N routed fraction and the log-latency — THIS is why near-flat
efficiency is the expected behavior for DLRM-style all-to-all on ICI.
"""
import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure_cpu_weak_scaling(batch_per_dev=256, tables=4, dim=32, steps=6):
    """t_step for N=1,2,4,8 fake CPU devices at fixed per-device batch."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from tfplus_tpu import kv, train as tft, parallel as par

    out = {}
    for n in (1, 2, 4, 8):
        mesh = par.make_mesh(n)
        opt = tft.AdagradOptimizer()
        t = par.create_sharded(dim, 4096, n, seed=1)
        t = par.init_optimizer_sharded(opt, t)
        t = jax.device_put(t, par.table_sharding(mesh))
        tspec = jax.tree_util.tree_map(lambda _: P("mp"), t)

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(tspec, P("mp"), P("mp"), P()),
                           out_specs=(tspec, P()), check_vma=False)
        def step(tab, ids, y, s):
            loss = jnp.zeros(())
            for k in range(tables):
                rows, state, tab = par.sharded_lookup(
                    tab, ids + k, defer_meta=True)
                li, g = jax.value_and_grad(
                    lambda r: jnp.mean((r.sum(-1) - y) ** 2))(rows)
                tab = par.sharded_apply_grads(opt, tab, state, g,
                                              lr=0.05, step=s)
                loss += li
            return tab, jax.lax.pmean(loss, "mp")

        jstep = jax.jit(step)
        rng = np.random.RandomState(0)
        idn = rng.randint(1, 30000, batch_per_dev * n).astype(np.int64)
        ids = jnp.asarray(kv.encode_ids(idn))
        y = jnp.asarray((idn % 7).astype(np.float32))
        t, _ = jstep(t, ids, y, jnp.int32(1))          # compile+insert
        jax.block_until_ready(t.payload)
        t0 = time.perf_counter()
        for s in range(steps):
            t, loss = jstep(t, ids, y, jnp.int32(s + 2))
        jax.block_until_ready(t.payload)
        out[n] = (time.perf_counter() - t0) / steps * 1e3
    return out


def model(t_compute_ms, *, batch_per_chip=2048, tables=6, dim=32,
          dense_bytes=250_000, bw_eff_gbps=100.0, lat_us=5.0,
          bf16=False, dedup_frac=1.0):
    """Modeled efficiency per slice size N (chips)."""
    ids = batch_per_chip * dedup_frac
    row_b = dim * (2 if bf16 else 4)
    v_chip = tables * ids * (12 + 2 * row_b)     # ids+counts, rows, grads
    rows = []
    for n in (1, 2, 4, 8, 16, 64, 256):
        stages = math.ceil(math.log2(n)) if n > 1 else 0
        t_aa = (v_chip * (n - 1) / n) / (bw_eff_gbps * 1e9) * 1e3 \
            + lat_us * 1e-3 * stages
        t_ps = (2 * dense_bytes) / (bw_eff_gbps * 1e9) * 1e3 \
            + lat_us * 1e-3 * stages
        eff = t_compute_ms / (t_compute_ms + t_aa + t_ps)
        rows.append({"chips": n, "t_exchange_ms": round(t_aa, 4),
                     "t_psum_ms": round(t_ps, 4),
                     "efficiency": round(eff, 4)})
    # headroom: per-chip exchange volume where efficiency hits 0.90
    # (solve t_aa = t_compute/9 - t_ps at large N)
    t_budget = t_compute_ms / 9 - rows[-1]["t_psum_ms"]
    v_at_90 = t_budget * 1e-3 * bw_eff_gbps * 1e9
    return {"per_chip_exchange_bytes": int(v_chip),
            "t_compute_ms": t_compute_ms,
            "bw_eff_gbps": bw_eff_gbps, "lat_us": lat_us, "bf16": bf16,
            "slices": rows,
            "exchange_bytes_budget_for_90pct": int(max(v_at_90, 0)),
            "volume_headroom_x": round(v_at_90 / v_chip, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-measure", action="store_true")
    ap.add_argument("--t-compute-ms", type=float, default=3.65,
                    help="single-chip DCN step (BENCH_LOCAL: 2048 ex / "
                         "560.6k ex/s = 3.65 ms)")
    args = ap.parse_args()
    out = {"model_dcn6x32": model(args.t_compute_ms),
           "model_dcn6x32_bf16": model(args.t_compute_ms, bf16=True),
           # a deliberately exchange-heavy shape: 26 tables, dim 128
           "model_26tables_dim128": model(args.t_compute_ms * 3,
                                          tables=26, dim=128)}
    if not args.skip_measure:
        out["cpu_mesh_weak_scaling_ms_per_step"] = {
            str(k): round(v, 2)
            for k, v in measure_cpu_weak_scaling().items()}
        out["cpu_mesh_note"] = (
            "mechanism check only: fake devices share one host memory bus,"
            " so per-step time growth with N reflects host contention, not"
            " ICI cost; the program's per-device work is N-invariant")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
