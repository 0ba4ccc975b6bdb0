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

sys.path.insert(0, os.path.dirname(__file__))
