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
    official = make(lambda q, k, v: official_fa(q, k, v, causal=True,
                                                sm_scale=sm, block_sizes=bs))

    # ours: default tile + inner-K-split variants (the official kernel's
    # two-level K structure, VERDICT r4 item 5). Each variant is STRICTLY
    # alternated with the official kernel so every ratio is same-session
    # paired. FA_VARIANTS=bq,bk,bki;bq,bk,bki overrides the sweep.
    env = os.environ.get("FA_VARIANTS")
    if env:
        variants = [tuple(int(x) if x else None
                          for x in spec.split(","))
                    for spec in env.split(";")]
    else:
        variants = [(1024, 1024, None), (1024, 1024, 512), (1024, 1024, 256),
                    (512, 1024, 512), (512, 1024, 256)]
    out = {"shape": "B4 H8 S2048 D128 causal bf16",
           "device": str(jax.devices()[0].device_kind),
           "official_blocks": "q512/kmajor1024/k512",
           "variants": []}
    best = None
    for bq, bk, bki in variants:
        ours = make(lambda q, k, v, bq=bq, bk=bk, bki=bki: fa.flash_attention(
            q, k, v, causal=True, block_q=bq, block_k=bk,
            block_k_inner=bki))
        ours_r, off_r = [], []
        for _ in range(reps):
            ours_r.append(ours())
            off_r.append(official())
        ratio = statistics.median(a / b for a, b in zip(ours_r, off_r))
        rec = {"blocks": f"q{bq}/k{bk}/inner{bki or bk}",
               "ours_tflops": {"median": round(statistics.median(ours_r), 1),
                               "runs": [round(x, 1) for x in ours_r]},
               "official_tflops": {"median": round(statistics.median(off_r), 1),
                                   "runs": [round(x, 1) for x in off_r]},
               "ours_vs_official_paired": round(ratio, 3)}
        out["variants"].append(rec)
        print(f"# {rec['blocks']}: ours {rec['ours_tflops']['median']} vs "
              f"official {rec['official_tflops']['median']} -> paired "
              f"{rec['ours_vs_official_paired']}", file=sys.stderr, flush=True)
        if best is None or ratio > best[1]:
            best = (rec["blocks"], ratio)
    out["best"] = {"blocks": best[0], "ours_vs_official_paired": round(best[1], 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
