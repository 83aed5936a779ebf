"""Measure the reference architecture's hot path on its own hardware class.

The reference (TFPlus) is TF-2.x CPU-only (reference README.md:37: "currently
optimized and supported only for the CPU version"); its KvVariable kernels
wrap a CPU hash map with per-row gather + fused sparse-optimizer updates.
Building the reference's .so needs bazel network fetches (zero egress here),
so the closest runnable baseline is stock TF on the identical workload:
dense-table embedding gather + fused sparse Adagrad apply, same shapes as
bench.py's headline (1M x 128 f32 table, 32k unique ids per step).

Stock TF is the FAVOURABLE proxy: the reference's own sparse kernels pay a
hash-map probe on top of this; a real TFPlus run would be slower. The number
printed here is recorded in BASELINE.json as the measured baseline for
bench.py's vs_baseline ratio.
"""
import time

import numpy as np
import tensorflow as tf

DIM = 128
CAPACITY = 1 << 20
N = 1 << 15
STEPS = 50

rng = np.random.RandomState(0)
ids_np = rng.choice(CAPACITY, size=N, replace=False).astype(np.int64)

with tf.device("/CPU:0"):
    var = tf.Variable(rng.rand(CAPACITY, DIM).astype(np.float32))
    accum = tf.Variable(np.full((CAPACITY, DIM), 0.1, np.float32))
    ids = tf.constant(ids_np)

    @tf.function
    def step(i):
        rows = tf.gather(var, ids)                      # lookup
        grad = rows * 0.001 + 0.01                      # synthetic grad
        tf.raw_ops.ResourceSparseApplyAdagrad(          # fused sparse update
            var=var.handle, accum=accum.handle,
            lr=tf.constant(0.01), grad=grad, indices=ids,
            use_locking=False, update_slots=True)
        return rows[0, 0]

    step(tf.constant(0))                                # trace + warmup
    t0 = time.perf_counter()
    for i in range(STEPS):
        step(tf.constant(i))
    _ = step(tf.constant(0)).numpy()                    # sync
    dt = (time.perf_counter() - t0) / (STEPS + 1)

bytes_per_step = N * (16 * 8 + DIM * 4 + 4 * DIM * 4 + 24)  # same model as bench.py
print(f"tf-cpu fused lookup+adagrad: {dt*1e3:.3f} ms/step, "
      f"{bytes_per_step/dt/1e9:.2f} GB/s, {N/dt/1e6:.2f} M ids/s")
