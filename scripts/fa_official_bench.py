"""Time the official jax pallas flash kernel at several BlockSizes (causal)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention)

b, h, s, d = 4, 8, 2048, 128
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
reps = 20
sm = 1.0 / float(np.sqrt(d))

for bq, bkM, bk in [(512, 512, 512), (512, 1024, 512), (512, 1024, 1024),
                    (512, 2048, 512), (1024, 1024, 512), (512, 1024, 256)]:
    bs = BlockSizes(block_q=bq, block_k_major=bkM, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bkM,
                    block_k_dkv=bk, block_q_dkv=bq,
                    block_k_major_dq=bkM, block_k_dq=bk, block_q_dq=bq)

    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            qi = q + (i * jnp.bfloat16(1e-8))
            o = flash_attention(qi, k, v, causal=True, sm_scale=sm,
                                block_sizes=bs)
            return acc + o.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, reps, body, 0.0)

    try:
        o = loop(q, k, v); np.asarray(jax.device_get(o))
        t0 = time.perf_counter()
        o = loop(q, k, v); np.asarray(jax.device_get(o))
        dt = max(time.perf_counter() - t0 - 0.03, 1e-9) / reps
        fl = 4 * b * h * s * s * d * 0.5
        print(f"official q{bq} kM{bkM} k{bk}: {dt*1e3:.3f} ms, "
              f"{fl/dt/1e12:.1f} TFLOP/s")
    except Exception as e:
        print(f"official q{bq} kM{bkM} k{bk}: FAIL {type(e).__name__}")
