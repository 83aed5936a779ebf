"""Phase profiler for the fused lookup+update step (real TPU).

Each case runs `steps` iterations inside one jit (per-dispatch RPC excluded),
returns a tiny probe slice computed in-jit (keeps the work live, avoids
device_get of big arrays over the tunnel), and is timed with the hard-sync +
RTT-subtraction methodology from PERF.md.
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tfplus_tpu import kv, train as tft
from tfplus_tpu.ops import rowops
from tfplus_tpu.kv import table as kvt

dim, capacity, n, steps = 128, 1 << 20, 1 << 15, 50
t0_tab = kv.create(dim, capacity, max_probes=16, seed=0)
opt = tft.AdagradOptimizer()
t0_tab = opt.init(t0_tab)
rng = np.random.RandomState(0)
ids = kv.encode_ids_np_to_device(
    rng.choice(capacity * 4, n, replace=False).astype(np.int64))
t0_tab = kv.lookup_or_insert(t0_tab, ids).table

fr = kv.find(t0_tab, ids)
slot = jnp.where(fr.found, fr.slot, -1)

_RTT = None


def measure(name, jf, *args):
    global _RTT
    probe = jf(*args)
    np.asarray(jax.device_get(probe))
    if _RTT is None:
        s = time.perf_counter()
        for _ in range(3):
            np.asarray(jax.device_get(probe))
        _RTT = (time.perf_counter() - s) / 3
    best = 1e9
    for _ in range(2):
        s = time.perf_counter()
        probe = jf(*args)
        np.asarray(jax.device_get(probe))
        best = min(best, (time.perf_counter() - s - _RTT) / steps * 1e3)
    print(f"{name:36s} {best:7.3f} ms/step")
    return best


def copy_tab():
    return jax.tree_util.tree_map(lambda a: a.copy(), t0_tab)


# 1) full fused step (current engine path)
@jax.jit
def full_step(t, ids):
    def body(i, t):
        res = kv.lookup_or_insert(t, ids, defer_meta=True)
        g = res.rows * 0.001 + 0.01
        return opt.apply(res.table, res.slot, g, lr=0.01, step=i + 1,
                         payload_rows=res.payload_rows,
                         meta_rows=res.meta_rows)
    out = jax.lax.fori_loop(0, steps, body, t)
    return out.payload[0, :4] + out.header[0, :4].astype(jnp.float32)


# 2) lookup only
@jax.jit
def lookup_only(t, ids):
    def body(i, carry):
        t, acc = carry
        res = kv.lookup_or_insert(t, ids, defer_meta=True)
        return res.table, acc + res.rows[0, 0] + res.payload_rows[0, dim + 1]
    t, acc = jax.lax.fori_loop(0, steps, body, (t, jnp.zeros(())))
    return t.payload[0, :4] + acc


# 3) apply only (its own gather, as in a non-fused train step)
@jax.jit
def apply_only(t, slot):
    def body(i, t):
        g = jnp.full((n, dim), 0.001) * (1.0 + i)
        return opt.apply(t, slot, g, lr=0.01, step=i + 1)
    out = jax.lax.fori_loop(0, steps, body, t)
    return out.payload[0, :4]


# 4) raw wide scatter only
@jax.jit
def scat_only(pay, slot, rows_w):
    def body(i, pay):
        return rowops.scatter_rows(pay, slot, rows_w * (1.0 + i))
    out = jax.lax.fori_loop(0, steps, body, pay)
    return out[0, :4]


# 5) raw wide gather only
@jax.jit
def gath_only(pay, slot):
    def body(i, acc):
        r = rowops.gather_rows(pay, slot + (i % 2))
        return acc + r.sum()
    return jax.lax.fori_loop(0, steps, body, jnp.zeros(()))


# 6) apply variant: new_wide built by CONCAT instead of two update-slices
@jax.jit
def apply_concat(t, slot):
    s, w = t.config.slot_columns()[opt.slot_name]

    def body(i, t):
        g = jnp.full((n, dim), 0.001) * (1.0 + i)
        ok = slot >= 0
        meta_g = t.meta[jnp.where(ok, slot, 0)]
        gidx = jnp.where(ok, slot, -1)
        wide = rowops.gather_rows(t.payload, gidx)
        var, state = wide[:, :dim], wide[:, s:s + w]
        acc = state + g * g
        new_var = var - 0.01 * g * jax.lax.rsqrt(acc + 1e-10)
        new_wide = jnp.concatenate([new_var, acc], axis=1)
        payload = rowops.scatter_rows(t.payload, gidx, new_wide)
        header = kvt._set_meta_at(t.header, jnp.where(ok, slot, t.capacity),
                                  meta_g | kvt.FLAG_TOUCH_BOTH)
        return dataclasses.replace(t, payload=payload, header=header)
    out = jax.lax.fori_loop(0, steps, body, t)
    return out.payload[0, :4]


# 7) apply without the meta header scatter (isolate its cost)
@jax.jit
def apply_no_meta(t, slot):
    s, w = t.config.slot_columns()[opt.slot_name]

    def body(i, t):
        g = jnp.full((n, dim), 0.001) * (1.0 + i)
        ok = slot >= 0
        gidx = jnp.where(ok, slot, -1)
        wide = rowops.gather_rows(t.payload, gidx)
        var, state = wide[:, :dim], wide[:, s:s + w]
        acc = state + g * g
        new_var = var - 0.01 * g * jax.lax.rsqrt(acc + 1e-10)
        new_wide = jnp.concatenate([new_var, acc], axis=1)
        payload = rowops.scatter_rows(t.payload, gidx, new_wide)
        return dataclasses.replace(t, payload=payload)
    out = jax.lax.fori_loop(0, steps, body, t)
    return out.payload[0, :4]


measure("full step (current)", full_step, copy_tab(), ids)
measure("lookup_or_insert only", lookup_only, copy_tab(), ids)
measure("apply only (update-slice build)", apply_only, copy_tab(), slot)
measure("apply concat-build", apply_concat, copy_tab(), slot)
measure("apply concat-build, no meta", apply_no_meta, copy_tab(), slot)
pay = copy_tab().payload
rows_w = jnp.asarray(rng.randn(n, pay.shape[1]).astype(np.float32))
measure("raw wide scatter", scat_only, pay, slot, rows_w)
measure("raw wide gather", gath_only, pay, slot)
