"""Repo-level pytest config: force a virtual 8-device CPU mesh for tests.

The environment's sitecustomize pins ``jax_platforms=axon,cpu`` (real TPU via
tunnel), so plain JAX_PLATFORMS=cpu is overridden; we re-override through
jax.config before any backend is initialized. Tests exercise multi-chip
sharding on 8 virtual CPU devices (SURVEY.md section 4).
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the fused GAN step takes minutes to compile
# on CPU; cache across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(__file__))
