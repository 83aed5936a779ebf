"""Serving / ranking metadata — parity with the reference's ranking_utils
(common/ranking_utils.py:13-180): a per-embedding-column metadata record
(``__rank_service_embedding`` collection JSON with bucket_size, combiner,
partition_strategy, embedding checkpoint tensor names :100-146, plus
generate_signature :160-180) that lets a ranking service address KV
checkpoint tensors directly without loading the model.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional

RANK_SERVICE_COLLECTION = "__rank_service_embedding"


class RankingMetadata:
    def __init__(self):
        self._columns: List[dict] = []

    def add_embedding_column(self, *, column_name: str, var_name: str,
                             embedding_dim: int, combiner: str = "mean",
                             num_shards: int = 1,
                             partition_strategy: str = "mod",
                             bucket_size: int = 0):
        """Register one embedding column (ranking_utils.py:100-146). The
        checkpoint tensor names follow the saver contract so the serving side
        can read ``<var>-keys`` / ``<var>-values`` directly."""
        shard_names = ([var_name] if num_shards == 1 else
                       [f"{var_name}/part_{i}" for i in range(num_shards)])
        self._columns.append({
            "column_name": column_name,
            "bucket_size": bucket_size,          # 0 = dynamic (KV) table
            "embedding_dim": embedding_dim,
            "combiner": combiner,
            "partition_strategy": partition_strategy,
            "num_shards": num_shards,
            "embedding_var_keys": [n + "-keys" for n in shard_names],
            "embedding_var_values": [n + "-values" for n in shard_names],
        })

    def to_json(self) -> str:
        return json.dumps({RANK_SERVICE_COLLECTION: self._columns}, indent=1)

    def generate_signature(self) -> Dict[str, dict]:
        """Input/output signature map (ranking_utils.py:160-180)."""
        sig = {}
        for c in self._columns:
            sig[c["column_name"]] = {
                "dtype": "int64",
                "embedding_dim": c["embedding_dim"],
                "combiner": c["combiner"],
            }
        return sig

    def save(self, path: str):
        from .io.filesystem import get_filesystem
        fs, p = get_filesystem(path)
        with fs.open(p, "wb") as f:
            f.write(self.to_json().encode())

    @staticmethod
    def load(path: str) -> "RankingMetadata":
        from .io.filesystem import get_filesystem
        fs, p = get_filesystem(path)
        with fs.open(p, "rb") as f:
            data = json.loads(f.read().decode())
        md = RankingMetadata()
        md._columns = data[RANK_SERVICE_COLLECTION]
        return md


# ---------------------------------------------------------------------------
# Serving export / load — the reference's savedmodel-for-ranking flow
# (prediction-mode export kv_variable_ops.py:1438-1466 first_n=3 +
# ranking_utils metadata), TPU-native: an inference bundle a server loads
# WITHOUT the training code or templates.
# ---------------------------------------------------------------------------

def export_for_serving(directory: str, tables, metadata: RankingMetadata, *,
                       enable_cutoff: bool = True,
                       cutoff_value: float = 1e-20,
                       extra: Optional[dict] = None,
                       format: str = "native") -> str:
    """Write an inference-mode export: first_n=3 checkpoint (keys, values,
    init_table — no optimizer slots, near-zero rows clipped) + the
    ``__rank_service_embedding`` metadata + signature JSON.

    ``tables``: {var_name: KvTable or [shard tables]} — var_name must match
    the metadata's registered columns. Returns the checkpoint prefix.

    ``format="tfplus"`` writes the checkpoint as a REAL TF TensorBundle
    (checkpoint.tf_export) so an EXISTING TFPlus-based ranking service
    consumes it unchanged; ``"native"`` (default) uses this framework's
    bundle (readable by :func:`load_for_serving`, works on any registered
    filesystem incl. ``oss://``).
    """
    from .io.filesystem import get_filesystem
    from .checkpoint import saver
    if format == "tfplus" and "://" in directory:
        # SaveV2 writes through TensorFlow's own filesystem layer, which
        # cannot resolve this framework's scheme registry — fail BEFORE any
        # partial side effects; write locally then copy, or use "native"
        raise ValueError(
            "format='tfplus' requires a local directory (TensorFlow's "
            f"SaveV2 cannot resolve {directory.split('://')[0]}:// URIs); "
            "export locally and upload, or use format='native'")
    fs, d = get_filesystem(directory)
    fs.makedirs(d)
    join = (lambda a, b: a.rstrip("/") + "/" + b)
    prefix = join(directory, "serving")
    if format == "tfplus":
        from .checkpoint import tf_export
        tf_export.export_checkpoint(
            prefix, tables, first_n=saver.FIRST_N_INFERENCE,
            enable_cutoff=enable_cutoff, cutoff_value=cutoff_value,
            dense=extra)
    else:
        saver.save(prefix, tables, dense=extra,
                   first_n=saver.FIRST_N_INFERENCE,
                   enable_cutoff=enable_cutoff, cutoff_value=cutoff_value)
    metadata.save(join(directory, "rank_service_embedding.json"))
    sig_fs, sig_p = get_filesystem(join(directory, "signature.json"))
    with sig_fs.open(sig_p, "wb") as f:
        f.write(json.dumps(metadata.generate_signature(), indent=1).encode())
    return prefix


def load_for_serving(directory: str, *, load_factor: float = 0.6,
                     quantize: bool = False):
    """Load an :func:`export_for_serving` directory with NO templates:
    table shapes are discovered from the metadata + bundle. Returns
    ``(tables, metadata)`` where tables is {var_name: KvTable or [shards]}
    ready for ``kv.lookup_or_zeros`` / ``embedding_lookup(train=False)``.

    ``quantize=True`` loads each table as an int8 row-quantized
    :class:`~tfplus_tpu.kv.quant.QuantKvTable` (4× less HBM; lookups via
    ``kv.quant.lookup_or_zeros``).
    """
    from .checkpoint import bundle, saver
    from .kv import table as kvt

    join = (lambda a, b: a.rstrip("/") + "/" + b)
    metadata = RankingMetadata.load(
        join(directory, "rank_service_embedding.json"))
    reader = bundle.BundleReader(join(directory, "serving"))
    tables = {}
    for col in metadata._columns:
        dim = col["embedding_dim"]
        names = ([col["embedding_var_keys"][i][:-len("-keys")]
                  for i in range(col["num_shards"])])
        shards = []
        for n in names:
            rows = reader.shape(n + "-keys")[0]
            cap = 64
            while cap * load_factor < max(rows, 1):
                cap *= 2
            tmpl = kvt.create(dim, cap)
            t = saver.restore_table(reader, n, tmpl)
            if quantize:
                from .kv import quant
                t = quant.quantize_table(t)
            shards.append(t)
        var = names[0].split("/part_")[0]
        tables[var] = shards if len(shards) > 1 else shards[0]
    return tables, metadata


def refresh_from_delta(tables, delta_prefix: str, *, quantize: bool = False):
    """Apply a DELTA checkpoint to loaded serving tables in place of a full
    reload — online model refresh (the reference's delta-export machinery
    exists exactly for cheap frequent snapshots; serving consumes them the
    same way, checkpoint_manager.py lineage).

    ``tables``: the dict from :func:`load_for_serving` (full-precision
    KvTables, or int8 QuantKvTables when loaded with ``quantize=True`` —
    pass ``quantize=True`` here too and each refreshed table re-quantizes
    after the upsert; a flag/table-type mismatch raises instead of silently
    int8-truncating float rows). Trainer deltas may carry optimizer slot
    tensors — they are NOT loaded (serving tables stay slot-less).
    Returns the refreshed dict.
    """
    from .checkpoint import bundle, saver
    from .kv import table as kvt
    from .kv import quant as _q

    reader = bundle.BundleReader(delta_prefix)
    out = {}
    for name, t in tables.items():
        shards = list(t) if isinstance(t, (list, tuple)) else [t]
        n = len(shards)
        new = []
        for i, s in enumerate(shards):
            if isinstance(s, _q.QuantKvTable) != quantize:
                raise ValueError(
                    f"refresh_from_delta(quantize={quantize}) but table "
                    f"'{name}' is {type(s).__name__} — pass quantize="
                    f"{isinstance(s, _q.QuantKvTable)}")
            base = name if n == 1 else f"{name}/part_{i}"
            if base + "-keys" not in reader:
                new.append(s)
                continue
            if quantize:
                # upsert into a full-precision reconstruction, re-quantize
                full = kvt.KvTable(
                    header=s.header,
                    payload=(s.payload.astype("float32")
                             * s.scale[:, None]),
                    init_pool=s.payload[:1].astype("float32"),
                    deleted_keys=_empty_deleted_log(),
                    deleted_count=_i32_zero(),
                    deleted_overflow=_bool_false(),
                    deleted_seen_train=_i32_zero(),
                    deleted_seen_pred=_i32_zero(),
                    config=s.config)
                full = saver.restore_table(reader, base, full, delta=True,
                                           load_slots=False)
                new.append(_q.quantize_table(full))
            else:
                new.append(saver.restore_table(reader, base, s, delta=True,
                                               load_slots=False))
        out[name] = new if isinstance(t, (list, tuple)) else new[0]
    return out


def _empty_deleted_log():
    import jax.numpy as jnp
    from .kv import table as kvt
    return jnp.full((kvt.DELETED_LOG_CAPACITY, 2), -1, jnp.int32)


def _i32_zero():
    import jax.numpy as jnp
    return jnp.zeros((), jnp.int32)


def _bool_false():
    import jax.numpy as jnp
    return jnp.zeros((), bool)
