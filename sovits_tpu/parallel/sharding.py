"""Parameter partitioning rules for the 2-D (data x model) mesh.

The reference only data-parallelizes (SURVEY.md section 2.10). Here the
'model' axis additionally shards large parameter tensors FSDP-style
(output-feature axis of wide kernels/tables), so per-chip parameter +
optimizer memory shrinks by the model-axis size; XLA inserts the
all-gathers/reduce-scatters over ICI. Batch stays sharded over 'data'.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path: tuple, value, min_size: int = 128) -> P:
    """Shard the trailing (output-feature) axis over 'model' when large
    and divisible; everything else replicated."""
    shape = np.shape(value)
    if len(shape) >= 2 and shape[-1] >= min_size:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def tree_shardings(tree, mesh: Mesh, min_size: int = 128):
    """NamedSharding tree for a param tree (or a whole train state) under
    the model-axis partitioning rule, divisibility permitting. Pass this as
    jit in_shardings/out_shardings so the compiled step KEEPS parameters
    and optimizer moments sharded across updates (no silent re-replication)."""
    model_size = mesh.shape["model"]

    def one(path, x):
        spec = param_spec(path, x, min_size)
        if any(s == "model" for s in spec) and np.shape(x)[-1] % model_size != 0:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_params(params, mesh: Mesh, min_size: int = 128):
    """Place a param tree (or a whole train state) on the mesh with the
    model-axis partitioning rule, divisibility permitting."""
    return jax.tree_util.tree_map(
        jax.device_put, params, tree_shardings(params, mesh, min_size)
    )
