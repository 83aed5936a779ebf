"""Follow-up TPU measurements after the math.powf fix (optim/rules.py):
the r2 checklist died at step 3 because Mosaic cannot legalize
``math.powf`` with a traced exponent — GroupAdam's ``beta ** step``
inside the scan-update kernel. Re-captures, cheapest first:

  1. flash-attention dropout numeric error vs the dense reference
     (the Mosaic compile itself already passed in the checklist run;
     this just recaptures the number that the checklist's crash lost),
  2. GroupAdam scan-vs-scatter calibration (now compilable),
  3. standalone-apply ablation (flat-header meta gather change).

Usage:  timeout 1800 python scripts/r2b_tpu_followup.py
Run UNCONTENDED (no concurrent pytest) — the measurements gate the
scan auto-route.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def step(name):
    print(f"\n=== {name} ===", flush=True)


def main():
    results = {}
    assert jax.devices()[0].platform != "cpu", "no TPU backend"

    step("1. flash-attention dropout numeric check")
    from tfplus_tpu.ops import flash_attention as fa
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(1, 2, 1024, 128).astype(np.float32),
                           jnp.bfloat16) for _ in range(3))
    ref = fa.reference_attention(q.astype(jnp.float32),
                                 k.astype(jnp.float32),
                                 v.astype(jnp.float32), causal=True,
                                 p_dropout=0.2, dropout_seed=7)
    oc = fa.flash_attention(q, k, v, causal=True, p_dropout=0.2,
                            dropout_seed=7, interpret=False)
    err = float(jnp.max(jnp.abs(oc.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"max|kernel - dense| = {err:.4f} (bf16 vs f32 ref)", flush=True)
    results["fa_dropout_max_err_bf16"] = err

    # (step 2 used to calibrate the scan-update kernel; the kernel was
    # deleted in round 3 after losing every hardware measurement — see
    # PERF.md post-mortem and R3_SCAN_SWEEP.json)
    step("3. standalone apply ablation (flat meta gather)")
    from tfplus_tpu import kv, train as tft
    dim, capacity, n = 128, 1 << 20, 1 << 15
    ids = kv.encode_ids_np_to_device(
        rng.choice(capacity * 4, n, replace=False).astype(np.int64))
    opt2 = tft.AdagradOptimizer()
    t2 = opt2.init(kv.create(dim, capacity, max_probes=16, seed=0))
    t2 = kv.lookup_or_insert(t2, ids).table
    res = kv.lookup_or_insert(t2, ids)
    t2 = res.table
    slot = res.slot
    grads = jnp.ones((n, dim), jnp.float32) * 1e-3

    @functools.partial(jax.jit, donate_argnums=(0,))
    def apply_loop(t, slot, grads):
        def body(i, t):
            return opt2.apply(t, slot, grads, lr=0.01, step=i + 1)
        return jax.lax.fori_loop(0, 20, body, t)

    t2 = apply_loop(t2, slot, grads)
    np.asarray(jax.device_get(t2.payload[0, :1]))
    # measure THIS session's tunnel RTT instead of hardcoding ~30 ms
    # (advisor round-2 finding: a drifted RTT silently skews the result)
    probe = jnp.zeros((1,), jnp.float32)
    rtts = []
    for _ in range(3):
        r0 = time.perf_counter()
        np.asarray(jax.device_get(probe))
        rtts.append(time.perf_counter() - r0)
    rtt = sorted(rtts)[1]
    t0 = time.perf_counter()
    t2 = apply_loop(t2, slot, grads)
    np.asarray(jax.device_get(t2.payload[0, :1]))
    raw_s = time.perf_counter() - t0
    ms = (raw_s - rtt) / 20 * 1e3
    print(f"standalone apply: {ms:.2f} ms/step (rtt {rtt*1e3:.1f} ms) "
          f"(round-1 measured 4.54; modeled ~3.5)", flush=True)
    results["apply_standalone_ms"] = round(ms, 3)
    results["apply_standalone_raw_s"] = round(raw_s, 4)
    results["measured_rtt_ms"] = round(rtt * 1e3, 2)

    with open(os.path.join(REPO, "R2_TPU_RESULTS.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("\nALL DONE -> R2_TPU_RESULTS.json", flush=True)


if __name__ == "__main__":
    main()
