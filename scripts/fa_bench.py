"""Quick flash-attention timing/correctness harness (real TPU).

Usage: python scripts/fa_bench.py [causal|noncausal|grad] [block_q block_k]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tfplus_tpu.ops import flash_attention as fa

mode = sys.argv[1] if len(sys.argv) > 1 else "causal"
bq = int(sys.argv[2]) if len(sys.argv) > 2 else 512
bk = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

b, h, s, d = 4, 8, 2048, 128
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
causal = mode != "noncausal"
grad = mode == "grad"
reps = 20

# correctness first
out = fa.flash_attention(q, k, v, causal=causal, block_q=bq, block_k=bk)
ref = fa.reference_attention(q, k, v, causal=causal)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
print(f"max_abs_err={err:.5f}")
assert err <= 2e-2, err


def fwd_sum(q, k, v):
    return fa.flash_attention(q, k, v, causal=causal, block_q=bq,
                              block_k=bk).astype(jnp.float32).sum()


@jax.jit
def loop(q, k, v):
    def body(i, acc):
        qi = q + (i * jnp.bfloat16(1e-8))
        if grad:
            val, grads = jax.value_and_grad(fwd_sum, argnums=(0, 1, 2))(qi, k, v)
            return acc + val + grads[0].astype(jnp.float32).sum()
        return acc + fwd_sum(qi, k, v)
    return jax.lax.fori_loop(0, reps, body, 0.0)


def sync(x):
    np.asarray(jax.device_get(x))


o = loop(q, k, v); sync(o)
t0 = time.perf_counter()
o = loop(q, k, v); sync(o)
dt = max(time.perf_counter() - t0 - 0.03, 1e-9) / reps
flops = 4 * b * h * s * s * d * (0.5 if causal else 1.0) * (3.5 if grad else 1.0)
print(f"mode={mode} block={bq}x{bk}: {dt*1e3:.3f} ms, {flops/dt/1e12:.1f} TFLOP/s")
