"""Generic sparse-model training harness.

Replaces the reference's TF1 Session + Optimizer.minimize wiring
(example/NCFModel/train.py:117-129) with a functional step: KV tables are
explicit state threaded through a jitted step; gradients w.r.t. looked-up
unique rows fall out of autodiff (the take/gather transpose segment-sums
duplicates deterministically) and feed the fused sparse optimizer, while
dense tower params update with a standard dense optimizer (optax).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .. import embedding as emb
from ..kv import table as kvt
from ..utils import packing
from ..optim.base import SparseOptimizer


class SparseModel:
    """Protocol: subclass and define table_specs / init_dense / apply / loss."""
    #: name -> dict(dim=..., capacity=..., **kv.create kwargs)
    table_specs: Dict[str, dict] = {}

    def init_dense(self, key):
        raise NotImplementedError

    def apply(self, dense, embeddings: Dict[str, jnp.ndarray], features):
        """embeddings[name] is [B, D_name]; returns logits/predictions."""
        raise NotImplementedError

    def loss(self, preds, labels):
        raise NotImplementedError

    # -- provided ----------------------------------------------------------
    def init_tables(self, sparse_opt: Optional[SparseOptimizer] = None,
                    seed: int = 0) -> Dict[str, kvt.KvTable]:
        tables = {}
        for i, (name, spec) in enumerate(sorted(self.table_specs.items())):
            spec = dict(spec)
            spec.setdefault("name", name)
            t = kvt.create(seed=seed + i, **spec)
            if sparse_opt is not None:
                t = sparse_opt.init(t)
            tables[name] = t
        return tables


class TrainState(NamedTuple):
    tables: Dict[str, kvt.KvTable]
    dense: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def _dim_groups(model: "SparseModel"):
    """Group logical tables by embedding dim for multi-table packing."""
    groups: Dict[int, list] = {}
    for name, spec in sorted(model.table_specs.items()):
        groups.setdefault(spec["dim"], []).append(name)
    return groups


def init_state(model: SparseModel, sparse_opt: SparseOptimizer,
               dense_tx: optax.GradientTransformation, seed: int = 0) -> TrainState:
    dense = model.init_dense(jax.random.PRNGKey(seed))
    return TrainState(tables=model.init_tables(sparse_opt, seed),
                      dense=dense, opt_state=dense_tx.init(dense),
                      step=jnp.zeros((), jnp.int32))


def init_state_multi(model: SparseModel, sparse_opt: SparseOptimizer,
                     dense_tx: optax.GradientTransformation, *,
                     seed: int = 0, capacity_per_group: int = 1 << 16
                     ) -> TrainState:
    """Multi-table variant of :func:`init_state`: ALL logical tables of the
    same embedding dim share ONE physical KvTable (the reference's
    MultiLevelHashMap idea, kv/multi.py) — a 26-table DCN step becomes 2
    probe/gather/apply passes instead of 26. NOTE measured v5e throughput
    is LOWER than the per-table step (0.61-0.73x — the fused sort over the
    tag-concat id space costs more than the per-op savings; PERF.md
    multi-table section): choose this path for its shared-physical-table
    semantics, not for speed."""
    from ..kv import multi as kvm
    dense = model.init_dense(jax.random.PRNGKey(seed))
    tables = {}
    for dim, names in _dim_groups(model).items():
        t = kvt.create(dim, capacity_per_group, name=f"multi_dim{dim}",
                       seed=seed + dim)
        t = sparse_opt.init(t)
        tables[f"__group_{dim}"] = t
    return TrainState(tables=tables, dense=dense,
                      opt_state=dense_tx.init(dense),
                      step=jnp.zeros((), jnp.int32))


def make_train_step_multi(model: SparseModel, sparse_opt: SparseOptimizer,
                          dense_tx: optax.GradientTransformation, *,
                          sparse_lr: float, train: bool = True,
                          donate: bool = True) -> Callable:
    """Jitted step over dim-grouped multi-tables (see init_state_multi).

    Dedup runs PER LOGICAL TABLE (many small sorts pipeline fine), then the
    already-unique id sets are tag-concatenated — tags make them disjoint
    across tables, so the fused probe/gather/apply runs once per dim group
    with NO global dedup. A global sort over the concatenated batch was
    the superlinear cost that made the first fused attempt 3x slower than
    per-table steps (PERF.md).
    """
    from ..kv import hashing, multi as kvm, unique as kvu
    groups = _dim_groups(model)
    logical_ids = {}
    for dim, names in groups.items():
        for j, name in enumerate(names):
            logical_ids[name] = j

    def step_fn(state: TrainState, batch, day):
        tables = dict(state.tables)
        looks = {}    # group key -> lookup result over fused unique ids
        parts = {}    # group key -> (names, bs, per-name UniqueResult)
        for dim, names in groups.items():
            key = f"__group_{dim}"
            uniqs, tagged, counts, valids = [], [], [], []
            bs = None
            for name in names:
                ids = batch["ids"][getattr(model, "id_alias", {}).get(name, name)]
                enc = (ids if (getattr(ids, "ndim", 1) == 2)
                       else hashing.encode_ids_raw(ids))
                bs = enc.shape[0]
                u = kvu.unique_with_counts(enc)
                uniqs.append(u)
                # pad rows keep the EMPTY sentinel; mask them out BEFORE
                # tagging (tagging would turn them into ordinary keys)
                valids.append(~hashing.is_empty(u.unique_keys))
                tagged.append(kvm.tag_ids(u.unique_keys, logical_ids[name]))
                counts.append(u.counts)
            all_ids = jnp.concatenate(tagged, axis=0)      # [n_names*B, 2]
            all_valid = jnp.concatenate(valids, axis=0)
            all_counts = jnp.concatenate(counts, axis=0)
            if train:
                res = kvt.lookup_or_insert(tables[key], all_ids,
                                           counts=all_counts,
                                           valid=all_valid,
                                           defer_meta=True, day=day)
                rows, tables[key] = res.rows, res.table
                look = emb.Lookup(rows=rows, slot=res.slot, inverse=None,
                                  counts=all_counts, valid=all_valid,
                                  num_unique=None,
                                  payload_rows=res.payload_rows,
                                  meta_rows=res.meta_rows)
            else:
                fr = kvt.find(tables[key], all_ids, all_valid)
                rows = kvt._gather_rows(tables[key], fr.slot, fr.found,
                                        fr.meta)
                look = emb.Lookup(rows=rows,
                                  slot=jnp.where(fr.found, fr.slot, -1),
                                  inverse=None, counts=all_counts,
                                  valid=all_valid, num_unique=None,
                                  payload_rows=None, meta_rows=None)
            looks[key] = look
            parts[key] = (names, bs, uniqs)

        def loss_fn(dense, rows: Dict[str, jnp.ndarray]):
            embs = {}
            for key, (names, bs, uniqs) in parts.items():
                flat = rows[key]                           # [n_names*B, D]
                for j, name in enumerate(names):
                    u = uniqs[j]
                    uniq_rows = flat[j * bs:(j + 1) * bs]
                    embs[name] = uniq_rows[u.inverse]      # expand to batch
            preds = model.apply(dense, embs, batch.get("features"))
            return model.loss(preds, batch["labels"]), preds

        rows_in = {k: looks[k].rows for k in looks}
        if not train:
            loss, preds = loss_fn(state.dense, rows_in)
            return state, loss, preds
        (loss, preds), (g_dense, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.dense, rows_in)
        updates, opt_state = dense_tx.update(g_dense, state.opt_state,
                                             state.dense)
        dense = optax.apply_updates(state.dense, updates)
        step = state.step + 1
        for key in looks:
            tables[key] = sparse_opt.apply(tables[key], looks[key].slot,
                                           g_rows[key], lr=sparse_lr,
                                           step=step,
                                           payload_rows=looks[key].payload_rows,
                                           meta_rows=looks[key].meta_rows)
        return TrainState(tables, dense, opt_state, step), loss, preds

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def step(state, batch):
        return jitted(state, batch,
                      jnp.uint32(packing.current_day() % (1 << 13)))

    return step


def make_train_step(model: SparseModel, sparse_opt: SparseOptimizer,
                    dense_tx: optax.GradientTransformation, *,
                    sparse_lr: float, train: bool = True,
                    donate: bool = True, jit: bool = True) -> Callable:
    """Build a jitted ``step(state, batch) -> (state, loss, preds)``.

    ``batch`` = dict with per-table id arrays under ``batch["ids"][name]``
    (rank-1), optional dense ``batch["features"]``, and ``batch["labels"]``.

    ``jit=False`` returns the RAW traceable ``step_fn(state, batch, day)``
    instead (no jit wrapper, caller supplies the uint32 ring day) — used to
    embed the whole step in an outer ``lax.fori_loop`` (bench.py's
    steady-state window) or a larger jitted program.
    """

    # models may alias several tables to one id stream (e.g. DeepFM's
    # dim-1 linear table reads the same field ids as its embedding table)
    alias = getattr(model, "id_alias", {})

    def step_fn(state: TrainState, batch, day):
        tables = dict(state.tables)
        looks = {}
        for name in sorted(tables):
            look, tables[name] = emb.lookup_unique(
                tables[name], batch["ids"][alias.get(name, name)],
                train=train, defer_meta=train, day=day)
            looks[name] = look

        def loss_fn(dense, rows: Dict[str, jnp.ndarray]):
            embs = {n: emb.gather(looks[n], rows[n]) for n in rows}
            preds = model.apply(dense, embs, batch.get("features"))
            return model.loss(preds, batch["labels"]), preds

        rows_in = {n: looks[n].rows for n in looks}
        if train:
            (loss, preds), (g_dense, g_rows) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(state.dense, rows_in)
            updates, opt_state = dense_tx.update(g_dense, state.opt_state,
                                                 state.dense)
            dense = optax.apply_updates(state.dense, updates)
            step = state.step + 1
            for name in sorted(tables):
                tables[name] = sparse_opt.apply(
                    tables[name], looks[name].slot, g_rows[name],
                    lr=sparse_lr, step=step,
                    payload_rows=looks[name].payload_rows,
                    meta_rows=looks[name].meta_rows)
            return TrainState(tables, dense, opt_state, step), loss, preds
        loss, preds = loss_fn(state.dense, rows_in)
        return state, loss, preds

    if not jit:
        return step_fn

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def step(state, batch):
        # rows are last-touch stamped with the REAL ring day so
        # delete_with_timestamp / export timestamps work (a constant day=0
        # would age every row to "thousands of days old" instantly); traced
        # as data, so the day rolling over never recompiles
        return jitted(state, batch,
                      jnp.uint32(packing.current_day() % (1 << 13)))

    return step


def make_train_step_scan(model: SparseModel, sparse_opt: SparseOptimizer,
                         dense_tx: optax.GradientTransformation, *,
                         sparse_lr: float, donate: bool = True) -> Callable:
    """Multi-step-per-dispatch trainer: ``step(state, batches) ->
    (state, losses)`` runs ``lax.scan`` over a batch pytree with a leading
    ``[K]`` axis — K train steps in ONE dispatch.

    This is the TPU host-loop idiom (TF's ``iterations_per_loop`` /
    TPUEstimator train loop, which the reference inherits through
    Estimator training — example/dcn/train.py): per-dispatch overhead
    (RPC latency on fabric/tunnel rigs, host scheduling on local ones)
    amortizes over K steps, and one stacked host→device transfer replaces
    K per-step transfers. Combine with ``data.make_packed_feed`` (stack
    the packed buffers to ``[K, words]``) for one upload per K steps.

    Growth cannot happen mid-scan (shapes are static inside jit) — call
    ``grow_if_needed(state, K * max_unique_per_batch)`` between dispatches,
    exactly like the single-step path but with the K-step horizon.
    """
    raw = make_train_step(model, sparse_opt, dense_tx, sparse_lr=sparse_lr,
                          jit=False)

    def multi(state: TrainState, batches, day):
        def body(s, b):
            s2, loss, _ = raw(s, b, day)
            return s2, loss
        return jax.lax.scan(body, state, batches)

    jitted = jax.jit(multi, donate_argnums=(0,) if donate else ())

    def step(state, batches):
        return jitted(state, batches,
                      jnp.uint32(packing.current_day() % (1 << 13)))

    return step


def grow_if_needed(state: TrainState, incoming_per_table: int) -> TrainState:
    """Host-side between-steps growth check for every table."""
    tables = dict(state.tables)
    changed = False
    for name, t in tables.items():
        if kvt.needs_grow(t, incoming_per_table):
            tables[name] = kvt.grow_to_fit(t, incoming_per_table)
            changed = True
    return state._replace(tables=tables) if changed else state
