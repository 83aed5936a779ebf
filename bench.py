"""Benchmark: fused embedding lookup + sparse-optimizer update throughput.

Measures the framework's hot path — dedup'd gather-or-insert over an
HBM-resident KV table followed by the fused Adagrad gather-update-scatter —
as achieved HBM bandwidth. vs_baseline is the PAIRED-median ratio against
the MEASURED reference baseline: stock TF-CPU on the identical workload
(the reference framework is TF-CPU-only; its kernels add a hash-map probe
on top of the stock path, so this proxy favours the reference).

Variance methodology (round-4, per the round-3 verdict): the remote
compiler has run-to-run schedule variance and the tunnel adds RTT jitter,
so every headline metric is reported as a MEDIAN over >=5 repetitions with
its SPREAD ((max-min)/median). Ratio metrics (vs TF-CPU, int8 vs f32) are
medians of PER-PAIR ratios from strictly alternated measurements, so both
sides of each pair share host/compiler conditions. README/PERF headline
numbers must quote the driver-captured BENCH_r*.json medians and are only
meaningful within the stated spread.

The chip-roofline fraction (BASELINE.json's aspirational >=80% target —
unreachable for random-row access, which is issue-bound at ~85-100 ns/row
on v5e; PERF.md) is reported in detail.roofline_frac. Prints ONE json line.

Run on the real TPU (driver) or CPU (debug: BENCH_CPU=1).
"""
import json
import os
import statistics
import time

import numpy as np

REPS = int(os.environ.get("BENCH_REPS", "5"))


def _stats(runs):
    """Median + relative spread over a list of per-rep measurements."""
    if not runs:
        return None
    med = statistics.median(runs)
    spread = (max(runs) - min(runs)) / med if med else 0.0
    return {"median": round(med, 4), "spread": round(spread, 4),
            "n": len(runs)}


def _paired_ratio(a_runs, b_runs):
    """Median of per-pair ratios a_i/b_i (alternated measurements)."""
    pairs = [a / b for a, b in zip(a_runs, b_runs) if a and b]
    return round(statistics.median(pairs), 4) if pairs else None


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


def _measure_rtt(sync, out, n=3):
    """Host<->device round-trip of a hard sync on already-ready data —
    subtracted from every timed window. The tunnel RTT (~30 ms) is LARGER
    than some timed signals, so a stale constant would swamp them; measure
    it fresh next to each metric."""
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        sync(out)
    return (time.perf_counter() - t0) / n


def bench_flash_attention(grad=False, reps=REPS):
    """Flash-attention TFLOP/s (bf16 causal, B4 H8 S2048 D128), one compile,
    `reps` timed runs. grad=True measures fwd+bwd (3.5x fwd FLOPs).

    inner=100: at the old inner=20 the timed window (~10 ms) was SMALLER
    than the tunnel RTT, so RTT jitter dominated the spread (0.49 in the
    round-4 first record); the window must dwarf the RTT."""
    import jax
    import jax.numpy as jnp
    from tfplus_tpu.ops import flash_attention as fa
    b, h, s, d = 4, 8, 2048, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    inner = 100

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
        return jax.lax.fori_loop(0, inner, body, 0.0)

    def sync(x):
        np.asarray(jax.device_get(x))

    warm = loop(q, k, v)                      # compile + warmup
    rtt = _measure_rtt(sync, warm)
    flops = 4 * b * h * s * s * d * 0.5 * (3.5 if grad else 1.0)
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(loop(q, k, v))
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / inner
        out.append(flops / dt / 1e12)
    return out


def _build_bench_dcn(n_tab=6, bs=2048, capacity=1 << 14):
    """The headline DCN config (6 x 32d tables + cross net, batch 2048,
    GroupAdam) shared by the compute-only and end-to-end legs.
    ``capacity`` must hold the id stream's uniques under the grow
    threshold — an overfull table turns every step into a miss-path
    re-insert (measured 17 ms/step vs 0.9; the round-5 e2e fix)."""
    import optax
    from tfplus_tpu import kv, train as tft
    from tfplus_tpu.models import DCN, init_state, make_train_step
    model = DCN(uniform_dim=32, num_numeric=13, dnn_hidden=(256, 128),
                capacity=capacity)
    model.embedding_dims = (32,) * n_tab
    model.table_specs = {f"C{i+1}": dict(dim=32, capacity=capacity)
                         for i in range(n_tab)}
    model.input_dim = 32 * n_tab + 13
    opt = tft.GroupAdamOptimizer()
    tx = optax.adam(1e-3)
    state = init_state(model, opt, tx, seed=0)
    return model, opt, tx, state


def bench_dcn_examples_per_s(reps=REPS):
    """DCN train-step examples/s/chip (BASELINE.json headline).

    Round-5 stabilization (VERDICT r4 weak #1: spread 0.53): the timed
    window is ONE jitted ``lax.fori_loop`` of ``inner`` full train steps —
    a single dispatch whose ~200 ms device-side window dwarfs the ~30 ms
    tunnel RTT. The old chained-dispatch window (40 python-loop steps,
    ~40 ms) sat at RTT scale, so RTT jitter WAS the spread."""
    import functools
    import jax
    import jax.numpy as jnp
    from tfplus_tpu import kv
    from tfplus_tpu.models import make_train_step
    from tfplus_tpu.utils import packing

    n_tab, bs, inner = 6, 2048, 150
    model, opt, tx, state = _build_bench_dcn(n_tab, bs)
    raw_step = make_train_step(model, opt, tx, sparse_lr=1e-3, jit=False)
    rng = np.random.RandomState(0)
    batch = {
        "ids": {f"C{i+1}": kv.encode_ids_np_to_device(
            (rng.randint(0, 50000, bs) + (i << 40)).astype(np.int64))
            for i in range(n_tab)},
        "features": jnp.asarray(rng.rand(bs, 13).astype(np.float32)),
        "labels": jnp.asarray((rng.rand(bs) > 0.5).astype(np.float32)),
    }
    day = jnp.uint32(packing.current_day() % (1 << 13))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, batch, day):
        def body(i, st):
            st2, _, _ = raw_step(st, batch, day)
            return st2
        return jax.lax.fori_loop(0, inner, body, state)

    def sync(s):
        np.asarray(jax.device_get(s.tables["C1"].meta[:8]))

    state = run(state, batch, day)             # compile + insert ids
    sync(state)
    rtt = _measure_rtt(sync, state)
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = run(state, batch, day)
        sync(state)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / inner
        out.append(bs / dt)
    return out


def _encode_ids_np(ids_i64: np.ndarray) -> np.ndarray:
    """Host-side uint64 -> int32[N, 2] key split (numpy twin of
    kv.hashing.encode_ids, kept on the host so the feed path does no
    device work until the single device_put)."""
    u = ids_i64.astype(np.uint64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32).astype(np.int32)
    hi = (u >> np.uint64(32)).astype(np.uint32).astype(np.int32)
    return np.stack([lo, hi], axis=-1)


def _ensure_bench_tsv(path: str, n_rows: int = 120_000) -> str:
    """Synthetic Criteo-format TSV for the input-pipeline legs."""
    if os.path.exists(path) and os.path.getsize(path) > 0:
        return path
    rng = np.random.RandomState(0)
    with open(path, "w") as f:
        for start in range(0, n_rows, 10_000):
            m = min(10_000, n_rows - start)
            labels = rng.randint(0, 2, m)
            ints = rng.randint(0, 1000, (m, 13))
            cats = rng.randint(0, 1 << 32, (m, 26))
            f.write("\n".join(
                "\t".join([str(labels[i])]
                          + [str(x) for x in ints[i]]
                          + [format(c, "08x") for c in cats[i]])
                for i in range(m)) + "\n")
    return path


def bench_dcn_end_to_end(reps=REPS):
    """Input-pipeline + end-to-end train throughput (VERDICT r4 item 1).

    Reports:
      * input_pipeline_rows_per_s — binary-cache read + batch materialise +
        host id-encode for 6 tables: the rate the HOST can feed batches.
        (Live TSV parsing is ~1.1 M rows/s on this 4-core host; the
        pre-tokenized cache removes parse+hash from the steady state.)
      * host_to_device_gbps — measured upload bandwidth. Context for the
        number below: the axon tunnel uploads at ~60 s/GB, ~500x slower
        than the PCIe/DMA path of a locally attached TPU.
      * dcn_end_to_end_examples_per_s — cache -> encode -> device_put ->
        train step, chained with async dispatch (per-step feed);
      * ..._packed_... — whole batch crosses as ONE int32 buffer
        (data/feed.py), unpacked inside the jitted step;
      * ..._scan16_... — 16 train steps per dispatch over a stacked packed
        buffer (make_train_step_scan, the TPU iterations_per_loop idiom).
    Tables are sized for the stream's uniques and warmed with one full
    epoch first: an overfull table re-runs the miss path every step
    (measured 17 ms/step vs 0.9 — the round-5 correction), which measures
    insert cost, not steady-state training. On this rig the steady state
    is tunnel-upload/RPC bound; PERF.md round-5 decomposes the budget.
    """
    import jax
    import jax.numpy as jnp
    from tfplus_tpu import kv
    from tfplus_tpu.data import criteo
    from tfplus_tpu.models import make_train_step

    n_tab, bs = 6, 2048
    tsv = _ensure_bench_tsv("/tmp/tfplus_bench_criteo.tsv")
    cache_dir = criteo.build_binary_cache(tsv, "/tmp/tfplus_bench_criteo_bin")
    cache = criteo.BinaryCriteoCache(cache_dir)

    def feed(batch_np):
        """cache views -> the train step's host-side batch dict."""
        cats = batch_np["categorical"]
        return {
            "ids": {f"C{i+1}": _encode_ids_np(cats[:, i].astype(np.int64))
                    for i in range(n_tab)},
            "features": np.ascontiguousarray(batch_np["numeric"]),
            "labels": np.ascontiguousarray(batch_np["label"]),
        }

    # --- input pipeline only (host): can the loader outrun the chip? ------
    pipe_runs = []
    n_batches = 1500
    for _ in range(reps):
        t0 = time.perf_counter()
        tot = 0
        for b in cache.batches(bs, max_batches=n_batches, loop=True):
            h = feed(b)
            tot += h["labels"].shape[0]
        pipe_runs.append(tot / (time.perf_counter() - t0))

    # --- host->device upload bandwidth ------------------------------------
    up = np.zeros((1 << 21,), np.float32)          # 8 MB
    x = jax.device_put(up)
    np.asarray(jax.device_get(x[:8]))              # warm the path
    h2d_runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jax.device_put(up)
        np.asarray(jax.device_get(x[:8]))
        h2d_runs.append(up.nbytes / (time.perf_counter() - t0) / 1e9)

    # --- end to end: cache -> encode -> upload -> step --------------------
    import functools
    from tfplus_tpu.data import make_packed_feed
    from tfplus_tpu.utils import packing as _pk

    # capacity holds the stream's per-table uniques (~100k for the bench
    # cache) below the grow threshold — see the docstring correction note
    model, opt, tx, state = _build_bench_dcn(n_tab, bs, capacity=1 << 18)
    step = make_train_step(model, opt, tx, sparse_lr=1e-3)
    raw_step = make_train_step(model, opt, tx, sparse_lr=1e-3, jit=False)
    first = feed(next(cache.batches(bs)))
    pack, unpack = make_packed_feed(first)
    day = jnp.uint32(_pk.current_day() % (1 << 13))
    K = 16

    @functools.partial(jax.jit, donate_argnums=(0,))
    def packed_step(state, flat, day):
        return raw_step(state, unpack(flat), day)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan_packed(state, flat, day):
        def body(s, f):
            s2, loss, _ = raw_step(s, unpack(f), day)
            return s2, loss
        return jax.lax.scan(body, state, flat)

    def stack_packed(bs_iter):
        return np.stack([pack(feed(b)) for b in bs_iter])

    def sync(s):
        np.asarray(jax.device_get(s.tables["C1"].meta[:8]))

    # compile all three programs, then WARM: one full epoch of inserts so
    # the timed windows measure steady-state training, not first-contact
    # insert streaming
    state, _, _ = step(state, jax.device_put(first))
    state, _, _ = packed_step(state, jnp.asarray(pack(first)), day)
    state, _ = scan_packed(
        state, jnp.asarray(stack_packed(
            cache.batches(bs, max_batches=K, loop=True))), day)
    epoch = []
    chunk = []
    for b in cache.batches(bs, max_batches=None, loop=False):
        chunk.append(b)
        if len(chunk) == K:
            epoch.append(np.stack([pack(feed(x)) for x in chunk]))
            chunk = []
    for s_ in epoch:
        state, _ = scan_packed(state, jax.device_put(s_), day)
    for b in chunk:                      # epoch tail (< K batches)
        state, _, _ = step(state, jax.device_put(feed(b)))
    sync(state)
    rtt = _measure_rtt(sync, state)

    e2e_runs = []
    window = 60
    for _ in range(reps):
        t0 = time.perf_counter()
        tot = 0
        for b in cache.batches(bs, max_batches=window, loop=True):
            state, _, _ = step(state, jax.device_put(feed(b)))
            tot += bs
        sync(state)
        e2e_runs.append(tot / max(time.perf_counter() - t0 - rtt, 1e-9))

    packed_runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        tot = 0
        for b in cache.batches(bs, max_batches=window, loop=True):
            state, _, _ = packed_step(state, jax.device_put(pack(feed(b))),
                                      day)
            tot += bs
        sync(state)
        packed_runs.append(tot / max(time.perf_counter() - t0 - rtt, 1e-9))

    scan_runs = []
    dispatches = max(window // K, 2)
    for _ in range(reps):
        t0 = time.perf_counter()
        tot = 0
        for _ in range(dispatches):
            flat = stack_packed(cache.batches(bs, max_batches=K, loop=True))
            state, _ = scan_packed(state, jax.device_put(flat), day)
            tot += bs * K
        sync(state)
        scan_runs.append(tot / max(time.perf_counter() - t0 - rtt, 1e-9))

    return {
        "input_pipeline_rows_per_s": _stats(pipe_runs),
        "host_to_device_gbps": _stats(h2d_runs),
        "dcn_end_to_end_examples_per_s": _stats(e2e_runs),
        "dcn_end_to_end_packed_examples_per_s": _stats(packed_runs),
        "dcn_end_to_end_scan16_examples_per_s": _stats(scan_runs),
        "steps_per_dispatch": K,
        "batch_bytes": int(bs * (n_tab * 8 + 13 * 4 + 4)),
    }


def _build_serving_runs():
    """Build the f32 and int8 serving-lookup timers once (one compile each);
    each returned thunk performs one timed measurement (ids/s)."""
    import jax
    import jax.numpy as jnp
    from tfplus_tpu import kv
    from tfplus_tpu.kv import quant

    # inner=120: the timed window must dwarf the ~30 ms tunnel RTT or RTT
    # jitter dominates the spread (0.21-0.31 at the old inner=30)
    dim, capacity, n, inner = 128, 1 << 20, 1 << 15, 120
    t = kv.create(dim, capacity, max_probes=16, seed=0)
    rng = np.random.RandomState(0)
    ids = kv.encode_ids_np_to_device(
        rng.choice(capacity * 4, n, replace=False).astype(np.int64))
    t = kv.lookup_or_insert(t, ids).table
    qt = quant.quantize_table(t)
    ids_flip = jnp.flip(ids, axis=0)

    def make(lookup, tab):
        @jax.jit
        def run(tab, ids, ids_flip):
            def body(i, acc):
                # alternate the id order so the loop body is loop-variant —
                # otherwise XLA hoists the lookup out of the loop and the
                # measurement is fiction (PERF.md lesson)
                idsi = jnp.where((i % 2) == 0, ids, ids_flip)
                rows = lookup(tab, idsi)
                return acc + rows[0, 0]
            return jax.lax.fori_loop(0, inner, body, jnp.zeros(()))

        def sync(x):
            np.asarray(jax.device_get(x))

        rtt = _measure_rtt(sync, run(tab, ids, ids_flip))    # + compile

        def timed():
            t0 = time.perf_counter()
            sync(run(tab, ids, ids_flip))
            dt = max(time.perf_counter() - t0 - rtt, 1e-9) / inner
            return n / dt
        return timed

    return (make(kv.lookup_or_zeros, t), make(quant.lookup_or_zeros, qt))


def bench_group_adam_apply(reps=REPS):
    """GroupAdam apply (k=3 wide payload — the widest shipped slot state,
    3x row bytes per scatter) step time on the gather/update/scatter path.
    This was the target case for the deleted streaming scan kernel — the
    post-mortem comparison record lives in R3_SCAN_SWEEP.json / PERF.md."""
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

    def sync(o):
        jax.device_get(o.payload[0, :1])

    rtt = _measure_rtt(sync, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(t, slot_idx, grads)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return {"group_adam_apply_step_ms": _stats([x * 1e3 for x in ts]),
            # historical records (R3_SCAN_SWEEP, round-3 BENCH) quote the
            # RAW single-dispatch time incl. the tunnel round-trip; the
            # net number is the chip-side cost
            "group_adam_apply_net_of_rtt_ms": _stats(
                [max(x - rtt, 0.0) * 1e3 for x in ts])}


def _build_tf_cpu_step(steps: int = 20):
    """Measured reference baseline: stock TF-CPU on the IDENTICAL workload
    (1M x 128 f32 table, 32k unique ids, gather + fused sparse Adagrad).

    The reference (TFPlus) is TF-2.x CPU-only (its README.md:37) and its
    KvVariable kernels pay a hash-map probe ON TOP of this path, so stock TF
    is the favourable-to-the-reference proxy (scripts/baseline_tf_cpu.py has
    the long-form run). Returns a thunk producing achieved GB/s under the
    same bytes-per-step model as main()."""
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

        step(tf.constant(0))  # trace

    bytes_per_step = n * (16 * 8 + dim * 4 + 4 * dim * 4 + 24)

    def timed():
        with tf.device("/CPU:0"):
            t0 = time.perf_counter()
            for i in range(steps):
                step(tf.constant(i))
            _ = step(tf.constant(0)).numpy()
            dt = (time.perf_counter() - t0) / (steps + 1)
        return bytes_per_step / dt / 1e9
    return timed


# Pinned fallback if TF is absent where the driver runs the bench
# (measured 2026-08-17 on this host, scripts/baseline_tf_cpu.py).
TF_CPU_REFERENCE_GBPS = 5.53

# Measured per-row issue floor for the fused lookup+update shape (PERF.md
# primitive table, v5e): the step's random-row traffic is bounded by issue
# cost, not bytes. BASELINE.md states the >=85%-of-floor contract.
ISSUE_FLOOR_NS_PER_ROW = 111.0


def tpu_backend_alive(timeout_s: float = 180.0, attempts: int = 2) -> bool:
    """Probe the TPU backend in a SUBPROCESS: a wedged axon tunnel hangs
    forever (uninterruptible inside this process), so the probe must be
    killable. Returns False on hang/error. Two attempts: a transiently
    slow chip claim (observed once in round 4 right after a heavy
    measurement session) must not demote a whole record to the CPU
    fallback.

    The probe runs an actual jit compute + device_get, not just
    jax.devices(): a HALF-wedged tunnel (seen in round 5 after a client
    was killed mid-RPC) still answers discovery/claim but hangs the first
    compute — a devices()-only probe would green-light a bench run that
    then hangs forever."""
    import subprocess
    import sys
    for _ in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, numpy as np; import jax.numpy as jnp; "
                 "d = jax.devices(); "
                 "x = jax.jit(lambda a: a * 2 + 1)(jnp.arange(128)); "
                 "ok = int(np.asarray(jax.device_get(x))[3]) == 7; "
                 "raise SystemExit(0 if ok and d[0].platform != 'cpu' "
                 "else 3)"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except Exception:
            pass
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
    import functools
    import jax
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
    roofline = hbm_roofline_gbps()

    def fused_timed():
        nonlocal t
        t0 = time.perf_counter()
        t = run(t, ids)
        hard_sync(t)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / steps
        return bytes_per_step / dt / 1e9

    # --- PAIRED ALTERNATION: fused (TPU) vs TF-CPU reference (host) ------
    # Strictly alternate the two measurements so each pair shares host
    # conditions; vs_baseline is the median of the per-pair ratios.
    try:
        tf_timed = _build_tf_cpu_step()
    except Exception:
        tf_timed = None
    fused_runs, tf_runs = [], []
    for _ in range(REPS):
        fused_runs.append(fused_timed())
        if tf_timed is not None:
            try:
                tf_runs.append(tf_timed())
            except Exception:
                tf_timed = None
    fused = _stats(fused_runs)
    gbps = fused["median"]
    frac = gbps / roofline
    tf_ref = _stats(tf_runs)
    if tf_runs:
        vs_baseline = _paired_ratio(fused_runs, tf_runs)
        ref_gbps = tf_ref["median"]
        ref_measured = True
    else:
        ref_gbps = TF_CPU_REFERENCE_GBPS
        vs_baseline = round(gbps / ref_gbps, 4)
        ref_measured = False

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

    fa_tflops = _stats(maybe(bench_flash_attention) or [])
    fa_bwd_tflops = _stats(maybe(bench_flash_attention, grad=True) or [])
    dcn_eps = _stats(maybe(bench_dcn_examples_per_s) or [])
    dcn_e2e = maybe(bench_dcn_end_to_end)

    # --- PAIRED ALTERNATION: serving f32 vs int8 --------------------------
    # One compile each, then strictly alternated timed runs; the int8 ratio
    # is the median of per-pair ratios (the verdict's required form).
    f32_runs, int8_runs = [], []
    timers = maybe(_build_serving_runs)
    if timers:
        f32_timed, int8_timed = timers
        for _ in range(REPS):
            v = maybe(f32_timed)
            if v:
                f32_runs.append(v)
            v = maybe(int8_timed)
            if v:
                int8_runs.append(v)
    infer_ips = _stats(f32_runs)
    infer_int8 = _stats(int8_runs)
    int8_vs_f32 = _paired_ratio(int8_runs, f32_runs)
    ga_apply = maybe(bench_group_adam_apply)

    print(json.dumps({
        "metric": "fused_lookup_update_bandwidth",
        "value": gbps,
        "unit": "GB/s",
        # PAIRED-median ratio vs the MEASURED reference baseline: stock
        # TF-CPU on the identical workload (the reference framework is
        # TF-CPU-only and strictly slower than stock TF — see
        # _build_tf_cpu_step)
        "vs_baseline": vs_baseline,
        "detail": {
            "methodology": "median+spread over >=5 reps; ratios are "
                           "medians of per-pair alternated measurements",
            "fused_lookup_update_gbps": fused,
            "tf_cpu_reference_gbps": tf_ref or {"median": ref_gbps,
                                                "pinned": True},
            # False = the pinned constant was used (measurement failed),
            # not a fresh paired measurement on this host
            "tf_cpu_reference_measured": ref_measured,
            "roofline_gbps": roofline,
            "roofline_frac": round(frac, 4),
            # Renegotiated north star (BASELINE.md round 5): random-row
            # access on v5e is ISSUE-bound, not bandwidth-bound, so the
            # formal bar is >=85% of the measured per-row issue floor.
            # Floor components (PERF.md primitive table, 32k rows / 1M-row
            # table): find 9.5 + payload gather 13.7 + wide scatter ~85 +
            # meta lane scatter 3 ns/row = 111 ns/row.
            "issue_floor_ns_per_row": ISSUE_FLOOR_NS_PER_ROW,
            "issue_floor_frac": round(
                (batch_unique * ISSUE_FLOOR_NS_PER_ROW * 1e-6)
                / (bytes_per_step / (gbps * 1e9) * 1e3), 4),
            "step_ms": round(bytes_per_step / (gbps * 1e9) * 1e3, 3),
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
            "dcn_end_to_end": dcn_e2e,
            "inference_lookup_ids_per_s": infer_ips,
            "inference_lookup_int8_ids_per_s": infer_int8,
            "int8_vs_f32_paired_ratio": int8_vs_f32,
            "group_adam_apply": ga_apply,
        },
    }))


if __name__ == "__main__":
    main()
