"""Growth-stall measurement on the real chip (VERDICT r4 item 4).

Times the device-side rehash (`kv.grow` = jitted `_rehash_core` + the
host-side lost-row verification) at realistic shapes:

  * 1M -> 2M rows, 2 KB payload  (dim 128, GroupAdam k=3: values|m|v|linear)
  * 8M -> 16M rows, 256 B payload (dim 16,  GroupAdam k=3)

The reference grows incrementally under per-segment locks with no global
pause (table_manager.h:167-190); the TPU design trades that for an
infrequent bulk rebuild — this script puts the number on that trade and
PERF.md documents the grow-ahead/amortization policy it implies.

Timed pieces per shape:
  * rehash-only (pure device work, one dispatch, RTT-subtracted)
  * grow() total (includes the 2x device_get size-verification round trips
    — the real between-steps stall a trainer sees)

Run on the real TPU (the driver host). Prints one JSON line.
"""
import faulthandler
import json
import os
import signal
import statistics
import sys
import time

# `kill -USR1 <pid>` dumps all thread stacks without killing the run —
# a tunnel-era hang must be diagnosable without risking a mid-RPC SIGKILL
# (which can wedge the tunnel; CLAUDE.md trap 6)
faulthandler.register(signal.SIGUSR1)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure_shape(label, capacity, dim, fill_frac, reps=3):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tfplus_tpu import kv, train as tft
    from tfplus_tpu.kv import table as kvt

    opt = tft.GroupAdamOptimizer()
    t = opt.init(kv.create(dim, capacity, seed=0))
    n_fill = int(capacity * fill_frac)
    slab = 1 << 16

    # jit the fill with DONATION (one in-place dispatch per slab) — an
    # eager lookup_or_insert is hundreds of per-op RPCs over the tunnel,
    # and WITHOUT donation the async queue holds N live multi-GB table
    # copies, which blows HBM at these shapes and wedges the allocator
    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def fill(t, ids):
        return kv.lookup_or_insert(t, ids).table

    for start in range(0, n_fill, slab):
        n = min(slab, n_fill - start)
        ids = kv.encode_ids_np_to_device(
            np.arange(start + 1, start + 1 + n, dtype=np.int64))
        t = fill(t, ids)
        np.asarray(jax.device_get(t.header[:1, :1]))   # sequence the queue
    print(f"# {label}: filled {n_fill} rows", file=sys.stderr, flush=True)

    def sync(tab):
        # header slice, NOT .meta — the meta property materialises the
        # whole [C] plane through eager tunnel dispatches
        np.asarray(jax.device_get(tab.header[:1, :1]))

    sync(t)
    t0 = time.perf_counter()
    for _ in range(3):
        sync(t)
    rtt = (time.perf_counter() - t0) / 3

    # rehash-only: the pure device-side bulk rebuild. The FIRST call pays
    # compilation — and a real training run recompiles at EVERY growth
    # event (each capacity is a new shape), so first-call time IS the
    # realistic stall unless a persistent compilation cache is configured
    # (TFPLUS_TPU_COMPILE_CACHE); report both. Measures the SHIPPING
    # doubling path (bucket-split permutation, round 5) and the generic
    # claim rehash it replaced.
    def timed_calls(fn, tag):
        ms = []
        for k in range(reps + 1):
            t0 = time.perf_counter()
            out = fn(t, capacity * 2)
            sync(out)
            ms.append((time.perf_counter() - t0 - rtt) * 1e3)
            print(f"# {label} {tag} call {k}: {ms[-1]:.0f} ms",
                  file=sys.stderr, flush=True)
            del out
        return ms[0], ms[1:]

    rehash_first, rehash_ms = timed_calls(kvt._rehash_fast, "fast")
    generic_first, generic_ms = timed_calls(kvt._rehash, "generic")
    # grow() total: what a training loop actually pauses for (includes the
    # lost-row verification device_gets)
    grow_ms = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = kv.grow(t, capacity * 2)
        sync(out)
        grow_ms.append((time.perf_counter() - t0) * 1e3)
        del out

    payload_bytes = int(t.payload.shape[1]) * np.dtype(np.float32).itemsize
    med = statistics.median
    return {
        "label": label,
        "capacity": capacity, "rows_live": n_fill, "dim": dim,
        "payload_bytes_per_row": payload_bytes,
        "table_gb": round(capacity * payload_bytes / 1e9, 2),
        "rtt_ms": round(rtt * 1e3, 1),
        "rehash_first_call_ms": round(rehash_first, 1),
        "rehash_only_ms": {"median": round(med(rehash_ms), 1),
                           "runs": [round(x, 1) for x in rehash_ms]},
        "generic_claim_rehash_ms": {"median": round(med(generic_ms), 1),
                                    "runs": [round(x, 1)
                                             for x in generic_ms],
                                    "first_call_ms": round(generic_first, 1)},
        "grow_total_ms": {"median": round(med(grow_ms), 1),
                          "runs": [round(x, 1) for x in grow_ms]},
        # amortization: stall per row of NEW capacity bought (2x growth
        # doubles headroom, so amortized cost/insert = stall / capacity)
        "amortized_us_per_inserted_row": round(
            med(grow_ms) * 1e3 / capacity, 3),
    }


def main():
    import jax
    dev = jax.devices()[0]
    out = {"device": dev.device_kind, "platform": dev.platform}
    shapes = [
        ("1M->2M_2KB", 1 << 20, 128, 0.5),
        ("8M->16M_256B", 1 << 23, 16, 0.5),
    ]
    if os.environ.get("GROWTH_SMALL"):
        shapes = [("64k->128k_2KB", 1 << 16, 128, 0.5)]
    reps = int(os.environ.get("GROWTH_REPS", "3"))
    out["shapes"] = []
    for s in shapes:
        rec = measure_shape(*s, reps=reps)
        # emit per shape too — a later-shape stall must not lose this one
        print("#RESULT " + json.dumps(rec), file=sys.stderr, flush=True)
        out["shapes"].append(rec)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
