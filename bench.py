"""Benchmark: fused embedding lookup + sparse-optimizer update throughput.

Measures the framework's hot path — dedup'd gather-or-insert over an
HBM-resident KV table followed by the fused Adagrad gather-update-scatter —
as achieved HBM bandwidth. vs_baseline is the ratio against the MEASURED
reference baseline: stock TF-CPU on the identical workload (the reference
framework is TF-CPU-only; its kernels add a hash-map probe on top of the
stock path, so this proxy favours the reference). The chip-roofline
fraction (BASELINE.json's aspirational >=80% target — unreachable for
random-row access, which is issue-bound at ~85 ns/row on v5e; PERF.md) is
reported in detail.roofline_frac. Prints ONE json line.

Run on the real TPU (driver) or CPU (debug: BENCH_CPU=1).
"""
import json
import os
import time

import numpy as np


def hbm_roofline_gbps() -> float:
    """Peak HBM bandwidth for the attached device."""
    import jax
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0      # TPU v5e public spec: 819 GB/s
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v4" in kind:
        return 1228.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 819.0


def bench_flash_attention(grad=False):
    """Secondary: flash-attention TFLOP/s (bf16 causal, B4 H8 S2048 D128).
    grad=True measures the full fwd+bwd (value_and_grad), 3.5x fwd FLOPs."""
    import jax
    import jax.numpy as jnp
    from tfplus_tpu.ops import flash_attention as fa
    b, h, s, d = 4, 8, 2048, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    reps = 20

    def fwd_sum(q, k, v):
        return fa.flash_attention(q, k, v, causal=True).astype(
            jnp.float32).sum()

    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            # vary q per iteration so XLA cannot hoist the loop body
            qi = q + (i * jnp.bfloat16(1e-8))
            if grad:
                val, grads = jax.value_and_grad(fwd_sum, argnums=(0,))(
                    qi, k, v)
                return acc + val + grads[0].astype(jnp.float32).sum()
            return acc + fwd_sum(qi, k, v)
        return jax.lax.fori_loop(0, reps, body, 0.0)

    def sync(x):
        np.asarray(jax.device_get(x))

    o = loop(q, k, v); sync(o)
    t0 = time.perf_counter()
    o = loop(q, k, v); sync(o)
    dt = max(time.perf_counter() - t0 - 0.03, 1e-9) / reps
    flops = 4 * b * h * s * s * d * 0.5 * (3.5 if grad else 1.0)
    return flops / dt / 1e12


def bench_dcn_examples_per_s():
    """Secondary: DCN train-step examples/s/chip (BASELINE.json headline),
    6 embedding tables + cross net, batch 2048, GroupAdam."""
    import jax
    import jax.numpy as jnp
    import optax
    from tfplus_tpu import kv, train as tft
    from tfplus_tpu.models import DCN, init_state, make_train_step

    n_tab, bs, reps = 6, 2048, 10
    model = DCN(uniform_dim=32, num_numeric=13, dnn_hidden=(256, 128),
                capacity=1 << 14)
    model.embedding_dims = (32,) * n_tab
    model.table_specs = {f"C{i+1}": dict(dim=32, capacity=1 << 14)
                         for i in range(n_tab)}
    model.input_dim = 32 * n_tab + 13
    opt = tft.GroupAdamOptimizer()
    tx = optax.adam(1e-3)
    state = init_state(model, opt, tx, seed=0)
    step = make_train_step(model, opt, tx, sparse_lr=1e-3)  # donated tables
    rng = np.random.RandomState(0)
    batch = {
        "ids": {f"C{i+1}": kv.encode_ids_np_to_device(
            (rng.randint(0, 50000, bs) + (i << 40)).astype(np.int64))
            for i in range(n_tab)},
        "features": jnp.asarray(rng.rand(bs, 13).astype(np.float32)),
        "labels": jnp.asarray((rng.rand(bs) > 0.5).astype(np.float32)),
    }
    state, loss, _ = step(state, batch)       # compile + insert ids

    def sync(s):
        np.asarray(jax.device_get(s.tables["C1"].meta[:8]))

    sync(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, loss, _ = step(state, batch)
    sync(state)
    dt = max(time.perf_counter() - t0, 1e-9) / reps
    return bs / dt


def bench_inference_lookup():
    """Serving path: lookup_or_zeros throughput (ids/s) on a 1M-row table."""
    import functools
    import jax
    import jax.numpy as jnp
    from tfplus_tpu import kv

    dim, capacity, n, reps = 128, 1 << 20, 1 << 15, 30
    t = kv.create(dim, capacity, max_probes=16, seed=0)
    rng = np.random.RandomState(0)
    ids = kv.encode_ids_np_to_device(
        rng.choice(capacity * 4, n, replace=False).astype(np.int64))
    t = kv.lookup_or_insert(t, ids).table

    ids_flip = jnp.flip(ids, axis=0)

    @jax.jit
    def run(t, ids, ids_flip):
        def body(i, acc):
            # alternate the id order so the loop body is loop-variant —
            # otherwise XLA hoists the lookup out of the while loop and the
            # measurement is fiction (PERF.md lesson)
            idsi = jnp.where((i % 2) == 0, ids, ids_flip)
            rows = kv.lookup_or_zeros(t, idsi)
            return acc + rows[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    o = run(t, ids, ids_flip)
    np.asarray(jax.device_get(o))
    t0 = time.perf_counter()
    o = run(t, ids, ids_flip)
    np.asarray(jax.device_get(o))
    dt = max(time.perf_counter() - t0 - 0.03, 1e-9) / reps
    return n / dt


def bench_inference_lookup_int8():
    """Serving path, int8 row-quantized table: lookups dequantize on the
    VPU; gathers are issue-bound per row so this should match the f32
    number at a quarter of the HBM (kv/quant.py)."""
    import jax
    import jax.numpy as jnp
    from tfplus_tpu import kv
    from tfplus_tpu.kv import quant

    dim, capacity, n, reps = 128, 1 << 20, 1 << 15, 30
    t = kv.create(dim, capacity, max_probes=16, seed=0)
    rng = np.random.RandomState(0)
    ids = kv.encode_ids_np_to_device(
        rng.choice(capacity * 4, n, replace=False).astype(np.int64))
    t = kv.lookup_or_insert(t, ids).table
    qt = quant.quantize_table(t)
    ids_flip = jnp.flip(ids, axis=0)

    @jax.jit
    def run(qt, ids, ids_flip):
        def body(i, acc):
            idsi = jnp.where((i % 2) == 0, ids, ids_flip)
            rows = quant.lookup_or_zeros(qt, idsi)
            return acc + rows[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    o = run(qt, ids, ids_flip)
    np.asarray(jax.device_get(o))
    t0 = time.perf_counter()
    o = run(qt, ids, ids_flip)
    np.asarray(jax.device_get(o))
    dt = max(time.perf_counter() - t0 - 0.03, 1e-9) / reps
    return n / dt


def bench_group_adam_apply():
    """GroupAdam apply (k=3 wide payload — the widest shipped slot state,
    3x row bytes per scatter) step time on the gather/update/scatter path.
    This was the target case for the deleted streaming scan kernel — the
    post-mortem comparison record lives in R3_SCAN_SWEEP.json / PERF.md."""
    import statistics
    import jax
    import jax.numpy as jnp
    from tfplus_tpu import kv, train as tft
    if jax.default_backend() != "tpu":
        return None
    dim, capacity, n = 128, 1 << 20, 1 << 15
    t = kv.create(dim, capacity, max_probes=16, seed=0)
    opt = tft.GroupAdamOptimizer()
    t = opt.init(t)
    rng = np.random.RandomState(0)
    ids = kv.encode_ids_np_to_device(
        rng.choice(capacity * 4, n, replace=False).astype(np.int64))
    t = kv.lookup_or_insert(t, ids).table
    slot_idx = jnp.arange(n, dtype=jnp.int32) % t.capacity
    grads = jnp.ones((n, dim), jnp.float32) * 1e-3
    fn = jax.jit(lambda tb, s, g: opt.apply(tb, s, g, lr=0.01, step=1))
    out = fn(t, slot_idx, grads)
    jax.device_get(out.payload[0, :1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(t, slot_idx, grads)
        jax.device_get(out.payload[0, :1])
        ts.append(time.perf_counter() - t0)
    return {"group_adam_apply_step_ms": round(
        statistics.median(ts) * 1e3, 3)}


def bench_tf_cpu_reference(steps: int = 20) -> float:
    """Measured reference baseline: stock TF-CPU on the IDENTICAL workload
    (1M x 128 f32 table, 32k unique ids, gather + fused sparse Adagrad).

    The reference (TFPlus) is TF-2.x CPU-only (its README.md:37) and its
    KvVariable kernels pay a hash-map probe ON TOP of this path, so stock TF
    is the favourable-to-the-reference proxy (scripts/baseline_tf_cpu.py has
    the long-form run; 16.1 ms/step == 5.53 GB/s on this host).
    Returns achieved GB/s under the same bytes-per-step model as main().
    """
    import tensorflow as tf
    dim, capacity, n = 128, 1 << 20, 1 << 15
    rng = np.random.RandomState(0)
    ids_np = rng.choice(capacity, size=n, replace=False).astype(np.int64)
    with tf.device("/CPU:0"):
        var = tf.Variable(rng.rand(capacity, dim).astype(np.float32))
        accum = tf.Variable(np.full((capacity, dim), 0.1, np.float32))
        ids = tf.constant(ids_np)

        @tf.function
        def step(i):
            rows = tf.gather(var, ids)
            grad = rows * 0.001 + 0.01
            tf.raw_ops.ResourceSparseApplyAdagrad(
                var=var.handle, accum=accum.handle,
                lr=tf.constant(0.01), grad=grad, indices=ids,
                use_locking=False, update_slots=True)
            return rows[0, 0]

        step(tf.constant(0))
        t0 = time.perf_counter()
        for i in range(steps):
            step(tf.constant(i))
        _ = step(tf.constant(0)).numpy()
        dt = (time.perf_counter() - t0) / (steps + 1)
    bytes_per_step = n * (16 * 8 + dim * 4 + 4 * dim * 4 + 24)
    return bytes_per_step / dt / 1e9


# Pinned fallback if TF is absent where the driver runs the bench
# (measured 2026-08-17 on this host, scripts/baseline_tf_cpu.py).
TF_CPU_REFERENCE_GBPS = 5.53


def tpu_backend_alive(timeout_s: float = 120.0) -> bool:
    """Probe the TPU backend in a SUBPROCESS: a wedged axon tunnel hangs
    jax.devices() forever (uninterruptible inside this process), so the
    probe must be killable. Returns False on hang/error."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "raise SystemExit(0 if d and d[0].platform != 'cpu' else 3)"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except Exception:
        return False


def main():
    tpu_unreachable = False
    if os.environ.get("BENCH_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    elif not tpu_backend_alive():
        # wedged/absent tunnel: a CPU result with device:"cpu" beats a hang
        # that records nothing for the round. The flag below marks the
        # record as a FALLBACK measuring the host, not the chip — the
        # latest real-TPU numbers live in PERF.md/README.
        tpu_unreachable = True
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from tfplus_tpu import kv, train as tft

    dim = 128
    capacity = 1 << 20          # 1M rows x 128 f32 = 512 MB values
    batch_unique = 1 << 15      # 32k unique ids per step
    steps = 50

    t = kv.create(dim, capacity, max_probes=16, seed=0)
    opt = tft.AdagradOptimizer()
    t = opt.init(t)

    rng = np.random.RandomState(0)
    ids_np = rng.choice(capacity * 4, size=batch_unique, replace=False)
    ids = kv.encode_ids_np_to_device(ids_np.astype(np.int64))

    # pre-insert so the steady state measures lookup+update, not growth
    t = kv.lookup_or_insert(t, ids).table

    def one_step(t, ids, step):
        res = kv.lookup_or_insert(t, ids, defer_meta=True)
        g = res.rows * 0.001 + 0.01    # synthetic gradient, depends on rows
        return opt.apply(res.table, res.slot, g, lr=0.01, step=step,
                         payload_rows=res.payload_rows,
                         meta_rows=res.meta_rows)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(t, ids):
        def body(i, t):
            return one_step(t, ids, i + 1)
        return jax.lax.fori_loop(0, steps, body, t)

    def hard_sync(x):
        # block_until_ready can return early on the axon tunnel backend —
        # a device_get of real data is the only trustworthy barrier
        np.asarray(jax.device_get(x.meta[:8]))

    t = run(t, ids)                 # compile + warmup
    hard_sync(t)
    # measure the host<->device round-trip so it can be subtracted
    t0 = time.perf_counter()
    for _ in range(3):
        hard_sync(t)
    rtt = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    t = run(t, ids)
    hard_sync(t)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / steps

    # bytes touched per step (HBM traffic model):
    #   probe: 16 candidate key-pair gathers (8B each)  [vectorized find]
    #   lookup row gather: N*D*4 read
    #   optimizer: read var + slot, write var + slot:   4*N*D*4
    #   meta/flags read+write: ~4*4 B
    row = dim * 4
    bytes_per_step = batch_unique * (
        16 * 8 + row        # find + gather
        + 4 * row           # var/slot read+write
        + 24)               # meta + flags traffic
    gbps = bytes_per_step / dt / 1e9
    roofline = hbm_roofline_gbps()
    frac = gbps / roofline

    # Secondary benches run under a soft deadline: the primary metric above
    # is already measured, and a driver-side timeout that kills this process
    # mid-RPC would lose the WHOLE record (and wedge the tunnel — round-1
    # lesson). Skip remaining secondaries once the budget is spent.
    bench_start = time.perf_counter()
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "1500"))

    def within_budget():
        return (time.perf_counter() - bench_start) < deadline_s

    def maybe(fn, *a, **kw):
        if not within_budget():
            return None
        try:
            return fn(*a, **kw)
        except Exception:
            return None

    ref_meas = maybe(lambda: round(bench_tf_cpu_reference(), 2))
    ref_gbps = ref_meas if ref_meas else TF_CPU_REFERENCE_GBPS
    fa_tflops = maybe(lambda: round(bench_flash_attention(), 1))
    fa_bwd_tflops = maybe(lambda: round(bench_flash_attention(grad=True), 1))
    dcn_eps = maybe(lambda: round(bench_dcn_examples_per_s(), 0))

    # serving lookups: the remote compiler's schedule variance swings a
    # single compile by ±40% (PERF.md trap #4), so take the median of 3
    # FRESH compiles each, alternating so both paths share host conditions
    f32_runs, int8_runs = [], []
    for _ in range(3):
        v = maybe(bench_inference_lookup)
        if v:
            f32_runs.append(v)
        v = maybe(bench_inference_lookup_int8)
        if v:
            int8_runs.append(v)
    import statistics as _st
    infer_ips = round(_st.median(f32_runs), 0) if f32_runs else None
    infer_int8 = round(_st.median(int8_runs), 0) if int8_runs else None
    ga_apply = maybe(bench_group_adam_apply)

    print(json.dumps({
        "metric": "fused_lookup_update_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        # ratio vs the MEASURED reference baseline: stock TF-CPU on the
        # identical workload (the reference framework is TF-CPU-only and
        # strictly slower than stock TF — see bench_tf_cpu_reference)
        "vs_baseline": round(gbps / ref_gbps, 4),
        "detail": {
            "tf_cpu_reference_gbps": ref_gbps,
            # False = the pinned constant was used (deadline-skipped or
            # measurement failed), not a fresh measurement on this host
            "tf_cpu_reference_measured": bool(ref_meas),
            "roofline_gbps": roofline,
            "roofline_frac": round(frac, 4),
            "step_ms": round(dt * 1e3, 3),
            "unique_ids": batch_unique,
            "dim": dim,
            "capacity": capacity,
            "device": str(jax.devices()[0].device_kind),
            # True = the axon tunnel was wedged/absent at bench time and
            # this record measured the CPU host (see PERF.md fallback note)
            "tpu_unreachable_fallback": tpu_unreachable,
            "flash_attention_tflops_bf16": fa_tflops,
            "flash_attention_grad_tflops_bf16": fa_bwd_tflops,
            "dcn_train_examples_per_s_per_chip": dcn_eps,
            "inference_lookup_ids_per_s": infer_ips,
            "inference_lookup_int8_ids_per_s": infer_int8,
            "group_adam_apply": ga_apply,
        },
    }))


if __name__ == "__main__":
    main()
