"""Pytest root conftest.

Force tests onto a virtual 8-device CPU platform *before* jax initializes, so
multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4: multi-host logic tested with jax.sharding on CPU).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
