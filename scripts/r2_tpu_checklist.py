"""Round-2 TPU measurement checklist — run ONCE when the axon tunnel is
alive (it has been wedged this round; see PERF.md "Round-2 status").

Captures, in one session and in risk order (cheapest/most-important first,
so a mid-run wedge still leaves the early results):
  1. the headline bench (writes bench JSON to stdout + BENCH_LOCAL.json),
  2. a real Mosaic compile+run of the flash-attention DROPOUT kernels
     (fwd tiled + single-step + both backward kernels — the uint32
     hash-mask path has only been interpret-validated),
  3. the GroupAdam scan-vs-scatter calibration (opens/closes the
     auto-route gate; PERF.md scan-update section),
  4. the standalone-apply ablation (flat-header meta gather vs the
     round-1 view-based gather — the ~1 ms overhead suspect).

Usage:  timeout 2400 python scripts/r2_tpu_checklist.py
(The OUTER timeout must exceed the inner 900 s bench limit, or the expiry
SIGKILLs the bench client mid-RPC and wedges the tunnel — CLAUDE.md
trap #6. Inner limits fire first by design.)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def step(name):
    print(f"\n=== {name} ===", flush=True)


def main():
    results = {}

    step("1. headline bench")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, timeout=900)
    out_lines = r.stdout.decode().strip().splitlines()
    if r.returncode != 0 or not out_lines:
        raise RuntimeError(
            f"bench.py failed (rc={r.returncode}):\n"
            f"{r.stderr.decode()[-2000:]}")
    line = out_lines[-1]
    print(line, flush=True)
    results["bench"] = json.loads(line)
    with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as f:
        f.write(line)

    import jax
    import jax.numpy as jnp
    import numpy as np
    assert jax.devices()[0].platform != "cpu", "tunnel fell back to CPU"

    step("2. flash-attention dropout Mosaic compile check")
    from tfplus_tpu.ops import flash_attention as fa
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, 1024, 128).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 2, 1024, 128).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 2, 1024, 128).astype(np.float32),
                    jnp.bfloat16)
    # tiled (causal) fwd+bwd with dropout
    g = jax.grad(lambda q: fa.flash_attention(
        q, k, v, causal=True, p_dropout=0.2, dropout_seed=7,
        interpret=False).astype(jnp.float32).sum())(q)
    np.asarray(jax.device_get(g[0, 0, :1]))
    # single-step fwd with dropout
    o = fa.flash_attention(q, k, v, p_dropout=0.2, dropout_seed=7,
                           interpret=False)
    np.asarray(jax.device_get(o[0, 0, :1]))
    # numerical sanity vs the dense twin (same seed, same mask)
    ref = fa.reference_attention(q.astype(jnp.float32),
                                 k.astype(jnp.float32),
                                 v.astype(jnp.float32), causal=True,
                                 p_dropout=0.2, dropout_seed=7)
    oc = fa.flash_attention(q, k, v, causal=True, p_dropout=0.2,
                            dropout_seed=7, interpret=False)
    err = float(jnp.max(jnp.abs(oc.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"dropout kernel compiles; max|kernel - dense| = {err:.4f} "
          f"(bf16 vs f32 reference)", flush=True)
    results["fa_dropout_max_err_bf16"] = err

    # (step 3 used to calibrate the scan-update kernel; deleted round 3 —
    # PERF.md post-mortem, R3_SCAN_SWEEP.json)
    step("4. standalone apply ablation (flat meta gather)")
    from tfplus_tpu import kv, train as tft
    dim, capacity, n = 128, 1 << 20, 1 << 15
    ids = kv.encode_ids_np_to_device(
        rng.choice(capacity * 4, n, replace=False).astype(np.int64))
    import functools
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
    t0 = time.perf_counter()
    t2 = apply_loop(t2, slot, grads)
    np.asarray(jax.device_get(t2.payload[0, :1]))
    ms = (time.perf_counter() - t0 - 0.03) / 20 * 1e3
    print(f"standalone apply: {ms:.2f} ms/step "
          f"(round-1 measured 4.54; modeled ~3.5)", flush=True)
    results["apply_standalone_ms"] = round(ms, 3)

    with open(os.path.join(REPO, "R2_TPU_RESULTS.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("\nALL CHECKS DONE -> R2_TPU_RESULTS.json", flush=True)


if __name__ == "__main__":
    main()
