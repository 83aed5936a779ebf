"""First-contact ICI calibration (VERDICT r4 item 10) — ONE command.

On a machine with >=2 TPU chips on ICI this script:
  1. runs an all-to-all message-size sweep under shard_map (timed inside
     one jit with a loop-variant body, hard-synced — the PERF.md bench
     methodology),
  2. least-squares-fits t(V) = V x (N-1)/N / BW_eff + C to recover the
     effective per-chip all-to-all bandwidth BW_eff and the latency floor,
  3. re-emits SCALING_MODEL.json through scripts/scaling_model.model()
     with the CALIBRATED BW_eff/latency replacing the assumed
     100 GB/s / 5 us (BASELINE.md "Scaling north star" contract).

On this single-chip rig it degrades gracefully: prints what it would do,
leaves SCALING_MODEL.json untouched, exits 0. `--fake N` exercises the
full sweep+fit+emit path on an N-device fake CPU mesh (mechanism check —
host memory bandwidth, NOT an ICI calibration; the output is marked).

Usage:  python scripts/calibrate_ici.py [--fake 8] [--t-compute-ms 3.65]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")


def measure_all_to_all(mesh, axis: str, sizes_mb, reps: int = 5,
                       inner: int = 20):
    """Median all-to-all time per call at each per-chip message size."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    out = []
    for mb in sizes_mb:
        per_chip = int(mb * 1e6 / 4)
        per_chip -= per_chip % n or 0
        x = jax.device_put(
            jnp.zeros((n, per_chip), jnp.float32),
            NamedSharding(mesh, P(axis)))

        @jax.jit
        @functools.partial(shard_map, mesh=mesh, in_specs=P(axis),
                           out_specs=P(axis), check_vma=False)
        def run(x):
            def body(i, x):
                # vary the payload so XLA cannot hoist the exchange
                y = x + jnp.float32(i) * 1e-8
                y = jax.lax.all_to_all(
                    y.reshape(n, per_chip // n), axis, 0, 0, tiled=False)
                return y.reshape(1, per_chip)
            return jax.lax.fori_loop(0, inner, body, x)

        def sync(v):
            np.asarray(jax.device_get(v[0, :8]))

        warm = run(x)
        sync(warm)
        t0 = time.perf_counter()
        for _ in range(3):
            sync(warm)
        rtt = (time.perf_counter() - t0) / 3
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run(x))
            runs.append(max(time.perf_counter() - t0 - rtt, 1e-9) / inner)
        runs.sort()
        t_med = runs[len(runs) // 2]
        v_bytes = per_chip * 4
        out.append({"per_chip_mb": round(v_bytes / 1e6, 2),
                    "t_ms": round(t_med * 1e3, 4),
                    "eff_gbps": round(
                        v_bytes * (n - 1) / n / t_med / 1e9, 2)})
    return out


def fit_bw_latency(sweep, n: int):
    """Least squares of t = V*(N-1)/N / BW + C over the sweep points."""
    import numpy as np
    v = np.array([p["per_chip_mb"] * 1e6 * (n - 1) / n for p in sweep])
    t = np.array([p["t_ms"] * 1e-3 for p in sweep])
    A = np.stack([v, np.ones_like(v)], axis=1)
    (inv_bw, c), *_ = np.linalg.lstsq(A, t, rcond=None)
    bw_gbps = (1.0 / inv_bw / 1e9) if inv_bw > 0 else float("inf")
    return float(bw_gbps), float(max(c, 0.0) * 1e6)   # (GB/s, us)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fake", type=int, default=0,
                    help="run on an N-device fake CPU mesh (mechanism "
                         "check only — not a calibration)")
    ap.add_argument("--t-compute-ms", type=float, default=None,
                    help="single-chip DCN step ms; default reads "
                         "BENCH_LOCAL.json's dcn median")
    ap.add_argument("--sizes-mb", type=float, nargs="+",
                    default=[1, 4, 16, 64])
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "SCALING_MODEL.json"))
    args = ap.parse_args()

    if args.fake:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            f" --xla_force_host_platform_device_count={args.fake}"
    import jax
    if args.fake:
        jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    n = len(devs)
    if n < 2:
        print(f"calibrate_ici: {n} device(s) ({devs[0].platform}) — ICI "
              "calibration needs >=2 chips on one slice. SCALING_MODEL."
              "json keeps its modeled BW_eff=100 GB/s / 5 us assumptions; "
              "run this script unchanged at first multi-chip contact "
              "(or --fake 8 for a mechanism check).")
        return 0

    from jax.sharding import Mesh
    import numpy as np
    mesh = Mesh(np.asarray(devs).reshape(n), ("x",))
    sweep = measure_all_to_all(mesh, "x", args.sizes_mb)
    bw_gbps, c_us = fit_bw_latency(sweep, n)
    import math
    stages = max(1, math.ceil(math.log2(n)))
    lat_us = c_us / stages

    t_compute = args.t_compute_ms
    if t_compute is None:
        try:
            rec = json.load(open(os.path.join(REPO, "BENCH_LOCAL.json")))
            eps = rec["detail"]["dcn_train_examples_per_s_per_chip"]["median"]
            t_compute = 2048.0 / eps * 1e3
        except Exception:
            t_compute = 3.65

    from scripts.scaling_model import model
    calibrated = not (args.fake or devs[0].platform == "cpu")
    out = {
        "calibration": {
            "devices": n,
            "device_kind": devs[0].device_kind,
            "is_real_ici": calibrated,
            "note": (None if calibrated else
                     "FAKE/CPU mesh — measures host memory, not ICI; "
                     "model below still uses the measured numbers only "
                     "to prove the pipeline"),
            "all_to_all_sweep": sweep,
            "fit_bw_eff_gbps": round(bw_gbps, 2),
            "fit_latency_us_per_stage": round(lat_us, 2),
        },
        "model_dcn6x32": model(t_compute, bw_eff_gbps=bw_gbps,
                               lat_us=lat_us),
        "model_dcn6x32_bf16": model(t_compute, bw_eff_gbps=bw_gbps,
                                    lat_us=lat_us, bf16=True),
        "model_26tables_dim128": model(t_compute * 3, tables=26, dim=128,
                                       bw_eff_gbps=bw_gbps, lat_us=lat_us),
    }
    if calibrated:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"calibrate_ici: wrote {args.out}")
    print(json.dumps(out["calibration"], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
