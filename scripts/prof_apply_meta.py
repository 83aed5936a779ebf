"""Paired A/B: apply() meta-read path — flat-lane gather vs meta-plane gather.

Strictly alternated reps; same session; methodology per PERF.md.
"""
import os, sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tfplus_tpu import kv, train as tft
from tfplus_tpu.ops import rowops
from tfplus_tpu.kv import table as kvt
from tfplus_tpu.utils import packing

dim, capacity, n, steps = 128, 1 << 20, 1 << 15, 50
t0 = kv.create(dim, capacity, max_probes=16, seed=0)
opt = tft.AdagradOptimizer()
t0 = opt.init(t0)
rng = np.random.RandomState(0)
ids = kv.encode_ids_np_to_device(
    rng.choice(capacity * 4, n, replace=False).astype(np.int64))
t0 = kv.lookup_or_insert(t0, ids).table
fr = kv.find(t0, ids)
slot = jnp.where(fr.found, fr.slot, -1)


def apply_metaplane(table, slot_idx, grads, *, lr, step):
    """opt.apply clone, meta read via table.meta[safe] (plane gather)."""
    cap = table.capacity
    dim_ = table.config.dim
    ok = slot_idx >= 0
    safe = jnp.where(ok, slot_idx, 0)
    meta_g = table.meta[safe]
    gidx = jnp.where(ok, slot_idx, -1)
    wide = rowops.gather_rows(table.payload, gidx)
    var = wide[:, :dim_]
    was_black = (meta_g & kvt.FLAG_BLACKLIST) != 0
    var = jnp.where(was_black[:, None], jnp.zeros_like(var), var)
    s, w = table.config.slot_columns()[opt.slot_name]
    state = wide[:, s:s + w]
    new_var, new_state, black = opt.rule.update(
        var.astype(jnp.float32), state.astype(jnp.float32),
        grads.astype(jnp.float32), lr=lr, step=step, extra=None)
    idx = jnp.where(ok, slot_idx, cap)
    pieces = [new_var.astype(wide.dtype), new_state.astype(wide.dtype)]
    new_wide = jnp.concatenate(pieces, axis=1)
    payload = rowops.scatter_rows(table.payload, gidx, new_wide)
    new_meta = meta_g | kvt.FLAG_TOUCH_BOTH
    new_meta = new_meta & ~kvt.FLAG_BLACKLIST
    header = kvt._set_meta_at(table.header, idx, new_meta)
    return dataclasses.replace(table, payload=payload, header=header)


@jax.jit
def case_flat(t, slot):
    def body(i, t):
        g = jnp.full((n, dim), 0.001) * (1.0 + i)
        return opt.apply(t, slot, g, lr=0.01, step=i + 1)
    out = jax.lax.fori_loop(0, steps, body, t)
    return out.payload[0, :4]


@jax.jit
def case_plane(t, slot):
    def body(i, t):
        g = jnp.full((n, dim), 0.001) * (1.0 + i)
        return apply_metaplane(t, slot, g, lr=0.01, step=i + 1)
    out = jax.lax.fori_loop(0, steps, body, t)
    return out.payload[0, :4]


def copy_tab():
    return jax.tree_util.tree_map(lambda a: a.copy(), t0)


cases = [("flat-lane meta read (current)", case_flat),
         ("meta-plane read", case_plane)]
# warm + compile
for name, f in cases:
    np.asarray(jax.device_get(f(copy_tab(), slot)))
probe = case_flat(copy_tab(), slot)
s = time.perf_counter()
for _ in range(3):
    np.asarray(jax.device_get(probe))
RTT = (time.perf_counter() - s) / 3
print(f"rtt {RTT*1e3:.1f} ms")

res = {name: [] for name, _ in cases}
for rep in range(5):
    for name, f in cases:
        tb = copy_tab()
        s = time.perf_counter()
        p = f(tb, slot)
        np.asarray(jax.device_get(p))
        res[name].append((time.perf_counter() - s - RTT) / steps * 1e3)
for name, v in res.items():
    v = sorted(v)
    print(f"{name:34s} median {v[len(v)//2]:.3f} ms/step  all={['%.3f'%x for x in v]}")
