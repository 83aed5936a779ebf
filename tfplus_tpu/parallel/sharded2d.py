"""2D sparse parallelism: tables sharded by ROWS x COLUMNS over a 2D mesh.

The reference shards tables by rows only (PartitionedVariable / eflops
all-to-all, SURVEY.md §2.4). For very wide embeddings or large meshes the
row-only exchange bottlenecks on the per-device all-to-all volume
(B·D floats); splitting each row's D columns over a second mesh axis divides
that volume by C and multiplies the aggregate exchange bandwidth — the
"two-dimensional sparse parallelism" design (arXiv:2508.03854), realised
TPU-natively on a ("row", "col") mesh.

Layout
------
Device (r, c) holds an ORDINARY :class:`KvTable` with ``dim_local = D / C``:
rows routed ``key % R`` (axis "row"), columns ``[c·D/C, (c+1)·D/C)``
(axis "col"). Headers (keys + packed meta) are replicated along "col" and
kept in lockstep BY CONSTRUCTION: every header-affecting input (ids, counts,
grouped-lasso keep/blacklist decisions) is identical across the col ranks —
ids via a col all_gather before the row exchange, lasso decisions via a
psum'd group norm (``Rule.norm_axis``). No cross-col synchronisation of the
header is ever needed.

Exchange per step (device (r, c), local batch b = B / (R·C)):
  1. all_gather ids over "col"      → the col group's union batch [C·b]
  2. row exchange (sharded_table.sharded_lookup, axis="row") — identical on
     every col rank; returns the union batch's rows at THIS dim slice
  3. all_to_all over "col" flips (batch-of-rank-j, my-slice) into
     (my-batch, slice-of-rank-j) → concat to [b, D]
Gradients mirror 3→2→1 with segment sums at each hop.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kv import table as kvt
from ..optim.base import SparseOptimizer
from . import sharded_table as st

ROW_AXIS = "row"
COL_AXIS = "col"


def make_mesh_2d(num_rows: int, num_cols: int,
                 row_axis: str = ROW_AXIS, col_axis: str = COL_AXIS) -> Mesh:
    devs = np.array(jax.devices()[:num_rows * num_cols])
    return Mesh(devs.reshape(num_rows, num_cols), (row_axis, col_axis))


def table_sharding_2d(mesh: Mesh, row_axis: str = ROW_AXIS,
                      col_axis: str = COL_AXIS) -> NamedSharding:
    """Sharding for the stacked [R, C, ...] table pytree."""
    return NamedSharding(mesh, P(row_axis, col_axis))


def create_sharded_2d(dim: int, capacity_per_row_shard: int,
                      num_rows: int, num_cols: int, *,
                      initializer: Optional[np.ndarray] = None,
                      **kwargs) -> kvt.KvTable:
    """Table pytree with leading [R, C] axes; device (r, c) sees an ordinary
    ``dim/num_cols``-wide KvTable. ``initializer``: optional full-dim init
    pool [P, dim] — sliced per column shard so 2D lookups reproduce a
    single full-width table's init rows exactly."""
    if dim % num_cols:
        raise ValueError(f"dim {dim} must divide num_cols {num_cols}")
    d_l = dim // num_cols
    cols = []
    for c in range(num_cols):
        init_c = None
        if initializer is not None:
            init_c = np.asarray(initializer)[:, c * d_l:(c + 1) * d_l]
        cols.append(kvt.create(d_l, capacity_per_row_shard,
                               initializer=init_c, **kwargs))
    # identical header everywhere; payload differs per col
    stacked_c = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *cols)                      # [C, ...]
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_rows,) + x.shape), stacked_c)


def init_optimizer_sharded_2d(opt: SparseOptimizer,
                              sharded: kvt.KvTable) -> kvt.KvTable:
    """Adds the concat slot columns (width k·dim_local per col shard)."""
    k = opt.rule.slot_width
    if k == 0 or opt.slot_name in sharded.config.slot_columns():
        return sharded
    return kvt.ensure_slots(sharded, {opt.slot_name: k})


def for_col_axis(opt: SparseOptimizer,
                 col_axis: str = COL_AXIS) -> SparseOptimizer:
    """Configure a group-lasso optimizer for dim-sharded rows: the l21 group
    norm / blacklist decision reduces over ``col_axis`` (identical on every
    column shard). No-op for rules without ``norm_axis``."""
    import dataclasses
    if hasattr(opt.rule, "norm_axis"):
        return dataclasses.replace(
            opt, rule=dataclasses.replace(opt.rule, norm_axis=col_axis))
    return opt


def _squeeze2(t: kvt.KvTable) -> kvt.KvTable:
    return jax.tree_util.tree_map(lambda x: x[0, 0], t)


def _unsqueeze2(t: kvt.KvTable) -> kvt.KvTable:
    return jax.tree_util.tree_map(lambda x: x[None, None], t)


def sharded_lookup_2d(sharded_local: kvt.KvTable, ids, *,
                      row_axis: str = ROW_AXIS, col_axis: str = COL_AXIS,
                      train: bool = True,
                      valid: Optional[jnp.ndarray] = None,
                      day=0, bucket_capacity: Optional[int] = None,
                      defer_meta: bool = False,
                      exchange_dtype=None,
                      ) -> Tuple[jnp.ndarray, st.ExchangeState, kvt.KvTable]:
    """Per-device body (inside ``shard_map`` over a ("row","col") mesh;
    table arrays arrive with leading [1, 1]). ``ids``: this device's batch
    slice. Returns ``(rows [b, D], state, table)`` — D is the FULL dim."""
    table = _squeeze2(sharded_local)
    C = jax.lax.psum(1, col_axis)
    b = ids.shape[0]
    # 1. union batch across the col group (identical on every col rank)
    union_ids = jax.lax.all_gather(ids, col_axis, tiled=True)      # [C·b(,2)]
    union_valid = (jax.lax.all_gather(valid, col_axis, tiled=True)
                   if valid is not None else None)
    # 2. row exchange — per-col-rank identical; header mutations lockstep
    rows_u, state, table1 = st.sharded_lookup(
        jax.tree_util.tree_map(lambda x: x[None], table), union_ids,
        axis_name=row_axis, train=train, valid=union_valid, day=day,
        bucket_capacity=bucket_capacity, defer_meta=defer_meta,
        exchange_dtype=exchange_dtype)
    d_l = rows_u.shape[-1]
    # 3. col transpose: (rank-j batch, my slice) -> (my batch, rank-j slice)
    r = rows_u.reshape(C, b, d_l)
    acc_dtype = r.dtype
    if exchange_dtype is not None:
        r = r.astype(exchange_dtype)        # narrow the col wire too
    r = jax.lax.all_to_all(r, col_axis, 0, 0, tiled=False)         # [C, b, d_l]
    if exchange_dtype is not None:
        r = r.astype(acc_dtype)
    rows = jnp.moveaxis(r, 0, 1).reshape(b, C * d_l)               # [b, D]
    return rows, state, jax.tree_util.tree_map(
        lambda x: x[None], table1)                                  # [1,1,...]


def sharded_apply_grads_2d(opt: SparseOptimizer, sharded_local: kvt.KvTable,
                           state: st.ExchangeState, batch_grads, *,
                           row_axis: str = ROW_AXIS,
                           col_axis: str = COL_AXIS,
                           lr, step, exchange_dtype=None) -> kvt.KvTable:
    """Mirror path: grads [b, D] → col all_to_all to (union batch, my slice)
    → row exchange → fused owner update. ``opt`` must come from
    :func:`for_col_axis` when the rule is group-lasso."""
    C = jax.lax.psum(1, col_axis)
    b = batch_grads.shape[0]
    d_l = batch_grads.shape[-1] // C
    g = batch_grads.reshape(b, C, d_l)
    g = jnp.moveaxis(g, 1, 0)                                      # [C, b, d_l]
    acc_dtype = g.dtype
    if exchange_dtype is not None:
        g = g.astype(exchange_dtype)
    g = jax.lax.all_to_all(g, col_axis, 0, 0, tiled=False)
    if exchange_dtype is not None:
        g = g.astype(acc_dtype)
    union_g = g.reshape(C * b, d_l)           # union batch order = all_gather
    table = _squeeze2(sharded_local)
    new_local = st.sharded_apply_grads(
        opt, jax.tree_util.tree_map(lambda x: x[None], table), state,
        union_g, axis_name=row_axis, lr=lr, step=step,
        exchange_dtype=exchange_dtype)
    return jax.tree_util.tree_map(lambda x: x[None], new_local)


def local_shard_2d(sharded: kvt.KvTable, r: int, c: int) -> kvt.KvTable:
    """Host-side: slice out device (r, c)'s local table."""
    return jax.tree_util.tree_map(lambda x: x[r, c], sharded)


def combine_col_shards(sharded: kvt.KvTable) -> list:
    """Host-side: fold the col axis away → a list of R full-dim row-shard
    tables (for checkpointing with the ordinary saver; restore re-slices via
    create_sharded_2d + import).

    Implementation note: this runs on the host with ONE device_get of the
    whole tree, then pure-numpy slicing/concatenation. Eager per-shard
    gathers/concats on the live mesh arrays (the previous implementation)
    produced rare XLA-CPU native aborts under load; numpy assembly has no
    device-side failure surface and the saver device_gets anyway."""
    import dataclasses as dc
    import numpy as np
    host = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), sharded)
    R = jax.tree_util.tree_leaves(host)[0].shape[0]
    C = jax.tree_util.tree_leaves(host)[0].shape[1]
    out = []
    for r in range(R):
        parts = [jax.tree_util.tree_map(lambda x: x[r, c], host)
                 for c in range(C)]
        t0 = parts[0]
        d_l = t0.config.dim
        k = t0.payload.shape[-1] // d_l          # 1 + Σ slot widths
        # interleave column blocks segment-by-segment so the combined payload
        # keeps the [values | slot0 | slot1 ...] layout at full dim
        segs = []
        for s in range(k):
            segs.append(np.concatenate(
                [p.payload[:, s * d_l:(s + 1) * d_l] for p in parts],
                axis=-1))
        payload = np.concatenate(segs, axis=-1)
        pool = np.concatenate([p.init_pool for p in parts], axis=-1)
        cfg = dc.replace(t0.config, dim=d_l * C)
        # leaves stay host-numpy (the saver device_gets anyway; jnp ops on
        # the returned tables promote transparently)
        out.append(dc.replace(t0, config=cfg, payload=payload,
                              init_pool=pool))
    return out


# ---------------------------------------------------------------------------
# online growth for row x col sharded tables
#
# Same device-side design as sharded_table.sharded_grow (the 1D case —
# reference parity anchor kv_variable.h:287-380): between steps, every
# (r, c) device rehashes its OWN shard's ROW capacity to one collectively-
# agreed uniform target inside one jitted shard_map (multihost-safe, O(1)
# host memory). Column lockstep survives growth for free: all col ranks of
# a row hold identical keys, and the rehash placement is a pure function of
# (keys, capacity), so the rehashed headers are bitwise-identical across
# the col axis without any cross-col synchronisation.
# ---------------------------------------------------------------------------

def shard_sizes_2d(sharded: kvt.KvTable) -> list:
    """[R][C] occupied-row counts. On a mesh this is one collective
    (all_gathers inside shard_map, result replicated — multihost-safe);
    plain stacked arrays use one nested-vmap reduction."""
    import functools
    from jax import shard_map
    mesh, axes = st._mesh_axes(sharded, 2)
    if mesh is None:
        counts = jax.jit(jax.vmap(jax.vmap(kvt.size)))(sharded)
        return [[int(c) for c in row] for row in jax.device_get(counts)]
    row_axis, col_axis = axes

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(st._tspec(sharded, axes),), out_specs=P(),
                       check_vma=False)
    def sizes(tab):
        s = kvt.size(_squeeze2(tab))
        sc = jax.lax.all_gather(s[None], col_axis, tiled=True)      # [C]
        return jax.lax.all_gather(sc[None], row_axis, tiled=True)   # [R, C]

    counts = jax.device_get(jax.jit(sizes)(sharded))
    return [[int(c) for c in row] for row in counts]


def sharded_needs_grow_2d(sharded: kvt.KvTable, incoming_per_shard: int = 0,
                          *, threshold: float = kvt.GROW_LOAD_FACTOR,
                          overflow=None) -> bool:
    """Between-steps check: does ANY (r, c) shard need to grow? A tripped
    ``overflow`` flag (pmax'd out of the jitted step) forces growth."""
    if overflow is not None and bool(jax.device_get(overflow)):
        return True
    per_shard_cap = sharded.header.shape[-2] * 16
    return (_max_rows_2d(sharded) + incoming_per_shard) \
        > threshold * per_shard_cap


def _max_rows_2d(sharded: kvt.KvTable) -> int:
    """Max live rows over all shards (one collective sweep)."""
    return max(max(row) for row in shard_sizes_2d(sharded))


def sharded_grow_2d(sharded: kvt.KvTable,
                    new_capacity_per_shard: Optional[int] = None, *,
                    incoming_per_shard: int = 0,
                    threshold: float = kvt.GROW_LOAD_FACTOR,
                    sharding=None) -> kvt.KvTable:
    """Grow every (r, c) shard to one UNIFORM row capacity and rehash —
    call between steps (the step recompiles once for the new static
    capacity). Row routing stays ``key % R``; col slices and header
    lockstep are preserved (see module note above). The rehash runs
    device-side via the shared 1D core (``st._grow_verified`` with
    ndim=2): multihost-safe, no host pull. ``sharding``
    (``table_sharding_2d(mesh)``) is only needed for plain stacked
    arrays — mesh-placed tables grow in place on the mesh."""
    target = new_capacity_per_shard
    if target is None:
        old_cap = sharded.header.shape[-2] * 16
        target = st.uniform_grow_target(_max_rows_2d(sharded), old_cap,
                                        incoming_per_shard, threshold)
    return st._grow_verified(sharded, target, 2, sharding=sharding)


def grow_sharded_2d_if_needed(tables: dict, *, incoming_per_shard: int = 0,
                              threshold: float = kvt.GROW_LOAD_FACTOR,
                              overflow=None, sharding=None):
    """Between-steps growth sweep over a dict of 2D-sharded tables.
    Returns ``(tables, grew)``. Sizes are swept once and reused."""
    trip = overflow is not None and bool(jax.device_get(overflow))
    out, grew = dict(tables), False
    for name, t in tables.items():
        cap = t.header.shape[-2] * 16
        hi = _max_rows_2d(t)
        if trip or (hi + incoming_per_shard) > threshold * cap:
            target = st.uniform_grow_target(hi, cap, incoming_per_shard,
                                            threshold)
            out[name] = sharded_grow_2d(t, target, sharding=sharding)
            grew = True
    return out, grew
