"""Measure the primitives a log-structured payload would use (real TPU).

Current hot path pays ~2.7 ms/step for a 32k-row wide scatter (issue-bound
~85 ns/row).  Log-structured alternative per step:
  - gather location[slot]        (narrow 32k x 4 B)
  - gather rows by location      (same wide gather as today)
  - dense append of 32k new rows (dynamic_update_slice at a step offset)
  - scatter new locations        (narrow 32k x 4 B)
plus an amortized compaction (full-table wide gather) every K steps.

Methodology traps this script hit and now avoids:
  1. the mutated array must be the fori_loop CARRY (donated), or XLA copies
     the full buffer per iteration and you time memcpy;
  2. donated buffers die per call — re-uploading them per rep over the axon
     tunnel costs ~26 s/GB and dwarfs the op; so each case CHAINS its state:
     the jitted fn returns the mutated array and the next call consumes it.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

C = 1 << 20
W = 256            # wide payload row (values 128 + slots 128)
N = 1 << 15
STEPS = 50

CASES = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else set("12345678")

rng = np.random.RandomState(0)
slots = jnp.asarray(rng.choice(C, N, replace=False).astype(np.int32))
rows = jnp.asarray(rng.rand(N, W).astype(np.float32))

_RTT = [None]


def sync(x):
    return np.asarray(jax.device_get(x))


def measure(name, jf, state, reps=3):
    """jf(state) -> (state, probe); state stays device-resident."""
    state, probe = jf(state)
    sync(probe)
    if _RTT[0] is None:
        s = time.perf_counter()
        for _ in range(3):
            sync(probe)
        _RTT[0] = (time.perf_counter() - s) / 3
    best = 1e9
    for _ in range(reps):
        s = time.perf_counter()
        state, probe = jf(state)
        sync(probe)
        best = min(best, (time.perf_counter() - s - _RTT[0]) / STEPS * 1e3)
    print(f"{name:44s} {best:7.3f} ms/step")
    return best


# generate on DEVICE — host->device uploads over the axon tunnel run at
# ~60 s/GB and would dwarf every op being measured
def fresh_payload():
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(0), (C, W), jnp.float32))()


def fresh_arena():
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(1), (C + (C >> 1), W), jnp.float32))()


def fresh_loc():
    return jax.jit(lambda: jax.random.permutation(
        jax.random.PRNGKey(2), jnp.arange(C, dtype=jnp.int32)))()


# 1. current wide scatter
@functools.partial(jax.jit, donate_argnums=(0,))
def wide_scatter(p):
    def f(i, p):
        r = rows + i.astype(jnp.float32) * 1e-8
        return p.at[slots].set(r, mode="drop", unique_indices=True)
    p = jax.lax.fori_loop(0, STEPS, f, p)
    return p, p[0, 0]
if "1" in CASES:
    measure("wide scatter 32k x 1KB (today)", wide_scatter, fresh_payload())

# 2. dense append write at step-dependent offset
@functools.partial(jax.jit, donate_argnums=(0,))
def dense_append(a):
    def f(i, a):
        r = rows + i.astype(jnp.float32) * 1e-8
        return jax.lax.dynamic_update_slice(a, r, ((i % 16) * N, 0))
    a = jax.lax.fori_loop(0, STEPS, f, a)
    return a, a[0, 0]
if "2" in CASES:
    measure("dense append 32k x 1KB (dus)", dense_append, fresh_arena())

# 3. narrow location scatter
@functools.partial(jax.jit, donate_argnums=(0,))
def loc_scatter(l):
    def f(i, l):
        return l.at[slots].set(slots + i, mode="drop", unique_indices=True)
    l = jax.lax.fori_loop(0, STEPS, f, l)
    return l, l[0].astype(jnp.float32)
if "3" in CASES:
    measure("narrow scatter 32k x 4B", loc_scatter, fresh_loc())

# 4. one-hop wide gather (read-only; payload captured, not donated)
payload_ro = fresh_payload() if "4" in CASES else None
@jax.jit
def one_hop(acc):
    def f(i, acc):
        s = slots + (i % 2)
        return acc + payload_ro[s].sum(dtype=jnp.float32) * 1e-9
    acc = jax.lax.fori_loop(0, STEPS, f, acc)
    return acc, acc
if "4" in CASES:
    measure("one-hop wide gather 32k", one_hop, jnp.zeros(()))

# 5. two-hop gather (location indirection then rows)
arena_ro = fresh_arena() if CASES & {"5","8"} else None
loc_ro = fresh_loc() if CASES & {"5","8"} else None
@jax.jit
def two_hop(acc):
    def f(i, acc):
        s = slots + (i % 2)
        return acc + arena_ro[loc_ro[s]].sum(dtype=jnp.float32) * 1e-9
    acc = jax.lax.fori_loop(0, STEPS, f, acc)
    return acc, acc
if "5" in CASES:
    measure("two-hop gather (loc + rows) 32k", two_hop, jnp.zeros(()))

# 6. fused log-structured step vs 7. today's fused step
@functools.partial(jax.jit, donate_argnums=(0,))
def log_step(state):
    def f(i, state):
        a, l = state
        g = a[l[slots]]
        r = g * 0.999 + rows * 1e-3
        off = (i % 16) * N
        a = jax.lax.dynamic_update_slice(a, r, (off, 0))
        l = l.at[slots].set(off + jnp.arange(N, dtype=jnp.int32),
                            mode="drop", unique_indices=True)
        return (a, l)
    a, l = jax.lax.fori_loop(0, STEPS, f, state)
    return (a, l), a[0, 0] + l[0].astype(jnp.float32)
if "6" in CASES:
    measure("LOG-STRUCTURED step (gather+append+loc)", log_step,
            (fresh_arena(), fresh_loc()))

@functools.partial(jax.jit, donate_argnums=(0,))
def today_step(p):
    def f(i, p):
        g = p[slots]
        r = g * 0.999 + rows * 1e-3 + i.astype(jnp.float32) * 0
        return p.at[slots].set(r, mode="drop", unique_indices=True)
    p = jax.lax.fori_loop(0, STEPS, f, p)
    return p, p[0, 0]
if "7" in CASES:
    measure("TODAY step (gather+wide scatter)", today_step, fresh_payload())

# 8. compaction: permute-gather the full arena (per event, amortize /K)
@jax.jit
def compact(arena, loc):
    return arena[loc].sum(dtype=jnp.float32) * 1e-9
if "8" in CASES:
    probe = compact(arena_ro, loc_ro); sync(probe)
    s = time.perf_counter()
    probe = compact(arena_ro, loc_ro); sync(probe)
    dt = time.perf_counter() - s - (_RTT[0] or 0.03)
    print(f"{'compaction gather 1M x 1KB (per event)':44s} {dt*1e3:7.3f} ms")
