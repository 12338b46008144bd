"""Pytest root conftest.

Force tests onto a virtual 8-device CPU platform *before* the jax backend
initializes, so multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4). Note: the axon TPU plugin ignores the JAX_PLATFORMS env var,
so we must use jax.config.update here.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the jitted train step takes minutes to compile
# on CPU; cache it across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
