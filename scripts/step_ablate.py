"""Ablate the fused lookup+update step on real TPU: where do the ms go?

Each variant runs `steps` iterations inside ONE jit (fori_loop), hard-synced
via device_get, RTT-subtracted (PERF.md methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tfplus_tpu import kv, train as tft
from tfplus_tpu.kv import table as kvt, hashing
from tfplus_tpu.ops import rowops
from tfplus_tpu.utils import packing

dim, capacity, n, steps = 128, 1 << 20, 1 << 15, 50

t = kv.create(dim, capacity, max_probes=16, seed=0)
opt = tft.AdagradOptimizer()
t = opt.init(t)
rng = np.random.RandomState(0)
ids_np = rng.choice(capacity * 4, size=n, replace=False)
ids = kv.encode_ids_np_to_device(ids_np.astype(np.int64))
t = kv.lookup_or_insert(t, ids).table

res0 = kv.lookup_or_insert(t, ids)
slot0 = jax.device_get(res0.slot)  # fixed known slots for scatter-only tests
slot_dev = jnp.asarray(slot0)


def timeit(name, fn, state):
    run = jax.jit(lambda s: jax.lax.fori_loop(
        0, steps, lambda i, s: fn(s, i), s))
    out = run(state)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:8]))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(jax.device_get(leaf.reshape(-1)[:8]))
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    out = run(state)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:8]))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / steps
    print(f"{name:42s} {dt*1e3:7.3f} ms")
    return dt


# --- A. full step (bench baseline) -----------------------------------------
def full_step(state, i):
    tt, acc = state
    res = kv.lookup_or_insert(tt, ids, defer_meta=True)
    g = res.rows * 0.001 + 0.01
    tt = opt.apply(res.table, res.slot, g, lr=0.01, step=i + 1,
                   payload_rows=res.payload_rows, meta_rows=res.meta_rows)
    return tt, acc

timeit("A full step", full_step, (t, jnp.zeros(())))


# --- B. find only ----------------------------------------------------------
def find_only(state, i):
    tt, acc = state
    idsi = jnp.roll(ids, i % 7, axis=0)
    fr = kvt.find(tt, idsi)
    return tt, acc + fr.slot[0]

timeit("B find (probe+reduce)", find_only, (t, jnp.zeros((), jnp.int32)))


# --- C. lookup only (find + meta gather + payload gather) ------------------
def lookup_only(state, i):
    tt, acc = state
    res = kv.lookup_or_insert(tt, ids, defer_meta=True)
    return res.table, acc + res.rows[0, 0]

timeit("C lookup_or_insert(defer_meta)", lookup_only, (t, jnp.zeros(())))


# --- D. payload scatter only (known idx, loop-variant rows) ----------------
rows_w = jax.device_get(res0.payload_rows)
rows_dev = jnp.asarray(rows_w)

def scatter_only(state, i):
    p, acc = state
    upd = rows_dev + (i * jnp.float32(1e-8))
    p = rowops.scatter_rows(p, slot_dev, upd)
    return p, acc

timeit("D wide payload scatter", scatter_only, (t.payload, jnp.zeros(())))


# --- E. meta scatter only --------------------------------------------------
def meta_scatter_only(state, i):
    h, acc = state
    upd = (jnp.full((n,), 3, jnp.uint32) + i.astype(jnp.uint32))
    h = kvt._set_meta_at(h, slot_dev, upd)
    return h, acc

timeit("E meta scatter", meta_scatter_only, (t.header, jnp.zeros(())))


# --- F. meta gather only ---------------------------------------------------
def meta_gather_only(state, i):
    m, acc = state
    idx = jnp.roll(slot_dev, i % 7, axis=0)
    g = m[idx]
    return m, acc + g[0]

timeit("F meta gather", meta_gather_only, (t.meta, jnp.zeros((), jnp.uint32)))


# --- G. payload gather only ------------------------------------------------
def payload_gather_only(state, i):
    p, acc = state
    idx = jnp.roll(slot_dev, i % 7, axis=0)
    g = rowops.gather_rows(p, idx)
    return p, acc + g[0, 0]

timeit("G wide payload gather", payload_gather_only, (t.payload, jnp.zeros(())))


# --- H. full step minus meta scatter ---------------------------------------
def step_no_meta(state, i):
    tt, acc = state
    res = kv.lookup_or_insert(tt, ids, defer_meta=True)
    g = res.rows * 0.001 + 0.01
    import dataclasses
    dim_ = tt.config.dim
    wide = res.payload_rows
    var = wide[:, :dim_]
    (s, w), = tt.config.slot_columns().values()
    state_c = wide[:, s:s + w]
    new_var, new_state, _ = opt.rule.update(var, state_c, g, lr=0.01,
                                            step=i + 1, extra=None)
    new_wide = wide.at[:, :dim_].set(new_var)
    new_wide = new_wide.at[:, s:s + w].set(new_state)
    payload = rowops.scatter_rows(res.table.payload, res.slot, new_wide)
    tt = dataclasses.replace(res.table, payload=payload)
    return tt, acc

timeit("H full minus meta scatter", step_no_meta, (t, jnp.zeros(())))


# --- I. full step minus rule math (write gathered rows back) ---------------
def step_no_math(state, i):
    tt, acc = state
    res = kv.lookup_or_insert(tt, ids, defer_meta=True)
    import dataclasses
    upd = res.payload_rows + (i * jnp.float32(1e-8))
    payload = rowops.scatter_rows(res.table.payload, res.slot, upd)
    header = kvt._set_meta_at(res.table.header,
                              jnp.where(res.slot >= 0, res.slot, tt.capacity),
                              res.meta_rows)
    tt = dataclasses.replace(res.table, payload=payload, header=header)
    return tt, acc

timeit("I full minus rule math", step_no_math, (t, jnp.zeros(())))
