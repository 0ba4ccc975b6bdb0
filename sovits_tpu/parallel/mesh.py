"""Device mesh + sharding helpers.

The reference scales with single-node DDP over NCCL (train.py:44-90); here
the equivalent is a ``jax.sharding.Mesh`` with a 'data' axis (batch-sharded,
gradients psum'd by XLA over ICI) and a 'model' axis reserved for tensor
sharding of the wide vocoder/discriminator convs. Multi-host extends the
same mesh over DCN via jax.distributed.initialize — no backend code.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = data_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
