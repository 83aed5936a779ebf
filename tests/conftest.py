"""Test env: CPU backend with 8 virtual devices so multi-chip sharding logic
(mesh/all_to_all under shard_map) is exercised on a single host, mirroring the
strategy SURVEY.md §4 prescribes in place of the reference's untested
PS/worker distribution.

Note: the axon sitecustomize force-selects the TPU backend via
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, so
the env var alone is not enough — we override the config after import.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
