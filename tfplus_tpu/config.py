"""Typed configuration tree — replaces the reference's three config
mechanisms (SURVEY.md §5.6: C++ env vars via GetEnvVar + gConf globals,
python module-level switches + graph placeholders, per-variable op attrs)
with one dataclass tree plus explicit env overrides.

Per-table options mirror KvOptions/StorageConfig (kv_variable_options.py:
13-133, hybrid_embedding/storage_config.proto — the OSS drop ships the MEM
tier only, and so do we; the enum is kept for checkpoint compatibility).
"""
from __future__ import annotations

import dataclasses
import enum
import os
from typing import Optional


class StorageType(enum.IntEnum):
    """storage_config.proto StorageType (the OSS drop enumerates MEM only
    :3-10 but the interface anticipates further tiers, storage_table.h:23-25).
    HOST_MEM is our second tier: host-DRAM spill (kv/storage.py)."""
    MEM_STORAGE = 0          # device HBM (the hot KvTable)
    HOST_MEM_STORAGE = 1     # host-DRAM HostStorageTier


class StorageCombination(enum.IntEnum):
    MEM = 0
    MEM_HOST = 1             # HBM hot tier + host-DRAM spill (HybridTable)


@dataclasses.dataclass(frozen=True)
class KvStorageConfig:
    """KvOptions storage tier config (kv_variable_options.py:21-23)."""
    combination: StorageCombination = StorageCombination.MEM
    capacity: int = 0                # 0 = unbounded (grow on demand)
    # MEM_HOST tier policy (kv/storage.py spill): device live-row budget and
    # optional cold criteria; 0 = unset
    max_live: int = 0
    min_freq: int = 0
    older_than_days: int = 0


@dataclasses.dataclass(frozen=True)
class KvOptions:
    """Per-table options (reference KvOptions → storage_option op attr)."""
    storage: KvStorageConfig = dataclasses.field(default_factory=KvStorageConfig)
    enter_threshold: int = 0         # frequency filter
    ttl_days: int = 0                # 0 = no time-based eviction


@dataclasses.dataclass
class RuntimeConfig:
    """Process-wide knobs (reference gConf, utils/utils.h:21-28 + env vars
    kv_variable.h:101-103)."""
    inference_only: bool = False
    support_delta_export: bool = True
    support_prediction_delta_export: bool = False
    enable_pallas_rowops: bool = False
    default_capacity: int = 1 << 14
    grow_load_factor: float = 0.7
    # persistent XLA compilation cache dir. Every table capacity is its
    # own program shape, so an uncached trainer re-pays a 10-40 s compile
    # at EVERY growth event (PERF.md growth-stall table); with the cache
    # each capacity compiles once ever per machine.
    compile_cache_dir: Optional[str] = None

    @classmethod
    def from_env(cls) -> "RuntimeConfig":
        def flag(name, default):
            v = os.environ.get(name)
            return default if v is None else v not in ("0", "false", "False", "")
        return cls(
            inference_only=flag("TFPLUS_TPU_INFERENCE_ONLY", False),
            support_delta_export=flag("SUPPORT_DELTA_EXPORT", True),
            support_prediction_delta_export=flag(
                "SUPPORT_PREDICTION_DELTA_EXPORT", False),
            enable_pallas_rowops=flag("TFPLUS_TPU_ENABLE_PALLAS_ROWOPS", False),
            compile_cache_dir=os.environ.get("TFPLUS_TPU_COMPILE_CACHE"),
        )


_runtime: Optional[RuntimeConfig] = None


def runtime() -> RuntimeConfig:
    global _runtime
    if _runtime is None:
        _runtime = RuntimeConfig.from_env()
        if _runtime.compile_cache_dir:
            import jax
            jax.config.update("jax_compilation_cache_dir",
                              _runtime.compile_cache_dir)
            # cache everything, including sub-second compiles — growth
            # shapes are exactly the programs worth never recompiling
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return _runtime
