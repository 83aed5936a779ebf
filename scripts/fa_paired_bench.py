"""PAIRED same-session flash-attention comparison: this repo's kernel vs
the official jax.experimental Pallas kernel, long timed windows (the
round-4 stabilized methodology — inner=100 so the window dwarfs the tunnel
RTT, per-metric measured RTT subtraction, strictly alternated reps,
median of per-pair ratios). The cross-session compile-schedule lottery
moves ABSOLUTE flash numbers 4x (PERF.md trap #4), so the ours-vs-official
claim is only meaningful as a same-session paired ratio."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as official_fa)
    from tfplus_tpu.ops import flash_attention as fa

    b, h, s, d = 4, 8, 2048, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    inner, reps = 100, 5
    sm = 1.0 / float(np.sqrt(d))
    flops = 4 * b * h * s * s * d * 0.5

    def make(call):
        @jax.jit
        def loop(q, k, v):
            def body(i, acc):
                qi = q + (i * jnp.bfloat16(1e-8))
                return acc + call(qi, k, v).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, inner, body, 0.0)

        def sync(x):
            np.asarray(jax.device_get(x))

        out = loop(q, k, v)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(3):
            sync(out)
        rtt = (time.perf_counter() - t0) / 3

        def timed():
            t0 = time.perf_counter()
            sync(loop(q, k, v))
            dt = max(time.perf_counter() - t0 - rtt, 1e-9) / inner
            return flops / dt / 1e12
        return timed

    bs = BlockSizes(block_q=512, block_k_major=1024, block_k=512, block_b=1,
                    block_q_major_dkv=512, block_k_major_dkv=1024,
                    block_k_dkv=512, block_q_dkv=512,
                    block_k_major_dq=1024, block_k_dq=512, block_q_dq=512)
    ours = make(lambda q, k, v: fa.flash_attention(q, k, v, causal=True))
    official = make(lambda q, k, v: official_fa(q, k, v, causal=True,
                                                sm_scale=sm, block_sizes=bs))

    ours_r, off_r = [], []
    for _ in range(reps):
        ours_r.append(ours())
        off_r.append(official())
    ratio = statistics.median(a / b for a, b in zip(ours_r, off_r))
    print(json.dumps({
        "ours_tflops": {"median": round(statistics.median(ours_r), 1),
                        "runs": [round(x, 1) for x in ours_r]},
        "official_tflops": {"median": round(statistics.median(off_r), 1),
                            "runs": [round(x, 1) for x in off_r]},
        "ours_vs_official_paired": round(ratio, 3),
        "shape": "B4 H8 S2048 D128 causal bf16",
        "device": str(jax.devices()[0].device_kind),
    }))


if __name__ == "__main__":
    main()
