"""Hardware measurement for the monotonic-run Pallas compactor — the
round-3 verdict #4 decision gate.

Shapes match PERF.md's log-structured study: arena 1.5M rows x 1 KB
(W=256 f32), 1M live (2/3). The study's numbers (v5e):

    wide scatter (today's step write)   3.32 ms / 32k rows
    dense append + loc scatter          0.68 + 0.71 ms
    XLA permute-gather compaction       ~42 ms / event

Gate (from PERF.md's amortization model at 1.5x memory, one compaction
per 16 steps of 32k appends): the composed log-structured step wins >=25%
only if a compaction event costs <= ~7 ms; the parked estimate for a
streaming kernel was 3-5 ms.

Methodology traps honoured (PERF.md): inputs passed as args (not baked
into the jit closure), the loop body is loop-VARIANT (live mask rolls per
iteration, so prefix sums and placement genuinely change), consumption
reads spread rows of the packed output (pallas_call is opaque — XLA
cannot shrink it, and the XLA baseline's scatter must fully materialise
to serve any row), hard sync via device_get, tunnel RTT subtracted.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from tfplus_tpu.ops import compactor

    M, W = 1 << 20, 256
    M = M + (M >> 1)                 # 1.5M rows x 1KB = 1.5 GB arena
    LIVE_FRAC = 2 / 3
    reps = 8

    rng = np.random.RandomState(0)
    arena = jnp.asarray(rng.randn(M, W).astype(np.float32))
    live = jnp.asarray(rng.rand(M) < LIVE_FRAC)
    print(f"arena {M}x{W} f32 ({arena.nbytes/1e9:.2f} GB), "
          f"live {float(live.mean()):.3f}", file=sys.stderr)

    def consume(packed):
        # spread-row consumption: forces full materialisation without a
        # full extra read pass polluting the measurement
        idx = jnp.arange(0, packed.shape[0], 4097)
        return packed[idx, :8].astype(jnp.float32).sum()

    def timed(fn, *args):
        out = fn(*args)                      # compile + warmup
        np.asarray(jax.device_get(out))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(jax.device_get(out))
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out))
        dt = (time.perf_counter() - t0 - rtt) / reps
        return dt * 1e3

    results = {}

    # XLA permute-gather baseline (the study's 42 ms)
    @jax.jit
    def run_xla(arena, live):
        def body(i, acc):
            lv = jnp.roll(live, i)
            packed, _ = compactor.compact_reference(arena, lv)
            return acc + consume(packed)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    try:
        results["xla_permute_gather_ms"] = round(timed(run_xla, arena,
                                                       live), 2)
    except Exception as e:
        results["xla_permute_gather_ms"] = f"FAIL {type(e).__name__}: {e}"
    print(json.dumps({"xla": results.get("xla_permute_gather_ms")}),
          file=sys.stderr, flush=True)

    for R in (64, 128, 256):
        if M % R:
            continue

        @jax.jit
        def run_kernel(arena, live, R=R):
            def body(i, acc):
                lv = jnp.roll(live, i)
                packed, _ = compactor.compact(arena, lv, block_rows=R)
                return acc + consume(packed)
            return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

        key = f"pallas_compact_R{R}_ms"
        try:
            results[key] = round(timed(run_kernel, arena, live), 2)
        except Exception as e:
            results[key] = f"FAIL {type(e).__name__}: {str(e)[:300]}"
        print(json.dumps({key: results[key]}), file=sys.stderr, flush=True)

    # prefix-sum-only cost (shared by both paths; part of the event)
    @jax.jit
    def run_prefix(live):
        def body(i, acc):
            lv = jnp.roll(live, i).astype(jnp.int32)
            return acc + (jnp.cumsum(lv) - lv)[-1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

    try:
        results["prefix_sums_only_ms"] = round(timed(run_prefix, live), 2)
    except Exception as e:
        results["prefix_sums_only_ms"] = f"FAIL {e}"

    # one hardware CORRECTNESS check (interpret mode does not catch Mosaic
    # lowering bugs — PERF.md lesson)
    try:
        small_live = jnp.asarray(rng.rand(M) < 0.5)
        got, _ = compactor.compact(arena, small_live, block_rows=256)
        want, _ = compactor.compact_reference(arena, small_live)
        n = int(jax.device_get(small_live.sum()))
        ok = bool(jax.device_get(
            jnp.array_equal(got[:n], want[:n])))
        results["hardware_exactness"] = ok
    except Exception as e:
        results["hardware_exactness"] = f"FAIL {type(e).__name__}: {str(e)[:300]}"

    results["shapes"] = {"M": M, "W": W, "live_frac": LIVE_FRAC,
                         "reps": reps}
    import jax as _j
    results["device"] = str(_j.devices()[0].device_kind)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
