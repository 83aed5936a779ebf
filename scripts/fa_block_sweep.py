"""Re-tune flash-attention block sizes under the HONEST measurement lens
(round-4: long windows + measured RTT). The shipped 512x1024 default was
picked with ~9 ms windows against a drifting ~30 ms tunnel RTT — re-sweep
(block_q, block_k) with windows that dwarf the RTT, causal fwd AND
fwd+bwd, same session as an official-kernel anchor."""
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
    from tfplus_tpu.ops import flash_attention as fa

    b, h, s, d = 4, 8, 2048, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32), jnp.bfloat16)
    inner, reps = 100, 3
    flops = 4 * b * h * s * s * d * 0.5

    def bench(call, scale=1.0):
        @jax.jit
        def loop(q, k, v):
            def body(i, acc):
                qi = q + (i * jnp.bfloat16(1e-8))
                return acc + call(qi, k, v)
            return jax.lax.fori_loop(0, inner, body, 0.0)

        def sync(x):
            np.asarray(jax.device_get(x))

        out = loop(q, k, v)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(3):
            sync(out)
        rtt = (time.perf_counter() - t0) / 3
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(loop(q, k, v))
            dt = max(time.perf_counter() - t0 - rtt, 1e-9) / inner
            runs.append(flops * scale / dt / 1e12)
        return round(statistics.median(runs), 1)

    out = {}
    for bq, bk in [(256, 256), (256, 512), (512, 512), (512, 1024),
                   (1024, 1024), (256, 1024), (512, 2048), (1024, 2048),
                   (2048, 2048), (128, 512), (512, 256)]:
        try:
            out[f"fwd_q{bq}_k{bk}"] = bench(
                lambda qi, kk, vv, bq=bq, bk=bk: fa.flash_attention(
                    qi, kk, vv, causal=True, block_q=bq, block_k=bk
                ).astype(jnp.float32).sum())
        except Exception as e:
            out[f"fwd_q{bq}_k{bk}"] = f"FAIL {type(e).__name__}"
        print(json.dumps({f"fwd_q{bq}_k{bk}": out[f"fwd_q{bq}_k{bk}"]}),
              file=sys.stderr, flush=True)

    # fwd+bwd at the top-2 fwd configs + the shipped default
    ranked = sorted((v, k) for k, v in out.items()
                    if isinstance(v, float))
    picks = {k.split("fwd_")[1] for _, k in ranked[-2:]} | {"q512_k1024"}
    for pk in sorted(picks):
        bq, bk = (int(x[1:]) for x in pk.split("_"))

        def fwd_sum(qi, kk, vv, bq=bq, bk=bk):
            return fa.flash_attention(qi, kk, vv, causal=True, block_q=bq,
                                      block_k=bk).astype(jnp.float32).sum()

        try:
            out[f"grad_{pk}"] = bench(
                lambda qi, kk, vv, f=fwd_sum: (
                    lambda val_grads: val_grads[0]
                    + val_grads[1][0].astype(jnp.float32).sum())(
                        jax.value_and_grad(f, argnums=(0,))(qi, kk, vv)),
                scale=3.5)
        except Exception as e:
            out[f"grad_{pk}"] = f"FAIL {type(e).__name__}"
        print(json.dumps({f"grad_{pk}": out[f"grad_{pk}"]}),
              file=sys.stderr, flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
