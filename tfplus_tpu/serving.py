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
