"""Packed AdamW: one fused update chain for the many small parameter leaves.

The reference trains with per-tensor torch AdamW (train.py:110-122). The
optax equivalent dispatches the 8-op Adam chain per leaf; with ~400 leaves
in the G+D trees that is ~3 ms of kernel-launch floor per step on v5e
(PROFILE.md "optimizer + norms + misc"). ``optax.flatten`` was measured
WORSE (+13 ms: it concatenates the FULL ~400 MB of params/grads every
step). This transformation packs only the leaves below ``pack_max``
elements into one flat cohort — the concat traffic is a few MB — and runs
a single fused Adam chain over the cohort; large leaves (the HBM-bandwidth
mass, where per-leaf dispatch amortizes fine) keep their per-leaf updates.

Numerics match ``optax.adamw`` exactly per element (same formulas in the
same dtype; packing only changes memory layout): see
tests/test_train.py::test_packed_adamw_matches_optax.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class PackedAdamWState(NamedTuple):
    count: jax.Array          # int32 step counter (shared by all leaves)
    mu_pack: jax.Array        # [n_packed] first moments of the small cohort
    nu_pack: jax.Array        # [n_packed] second moments
    mu_big: Any               # {leaf_index_str: moment} for large leaves
    nu_big: Any


def _partition(params, pack_max: int):
    """Static packing plan from the (trace-time) tree structure/shapes."""
    leaves = jax.tree.leaves(params)
    small, big = [], []
    for i, leaf in enumerate(leaves):
        if leaf.size <= pack_max and jnp.issubdtype(leaf.dtype, jnp.floating):
            small.append(i)
        else:
            big.append(i)
    offsets = {}
    off = 0
    for i in small:
        offsets[i] = off
        off += leaves[i].size
    return small, big, offsets, off


def packed_adamw(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    pack_max: int = 1 << 16,
) -> optax.GradientTransformation:
    """AdamW with decoupled weight decay on every leaf (torch semantics, as
    ``optax.adamw`` with its default mask), small leaves updated as one
    packed cohort."""

    def init(params):
        leaves = jax.tree.leaves(params)
        small, big, _offsets, n = _partition(params, pack_max)
        return PackedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu_pack=jnp.zeros((n,), jnp.float32),
            nu_pack=jnp.zeros((n,), jnp.float32),
            mu_big={str(i): jnp.zeros_like(leaves[i]) for i in big},
            nu_big={str(i): jnp.zeros_like(leaves[i]) for i in big},
        )

    def update(updates, state, params=None):
        assert params is not None, "packed_adamw needs params (weight decay)"
        g_leaves, treedef = jax.tree.flatten(updates)
        p_leaves = jax.tree.leaves(params)
        small, big, offsets, n = _partition(params, pack_max)

        count = optax.safe_int32_increment(state.count)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = jnp.asarray(learning_rate, jnp.float32)

        def adam(g, mu, nu, p):
            g = g.astype(jnp.float32)
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * jnp.square(g)
            upd = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            upd = upd + weight_decay * p.astype(jnp.float32)
            return (-lr * upd).astype(p.dtype), mu, nu

        out = [None] * len(g_leaves)

        if small:
            g_pack = jnp.concatenate([g_leaves[i].ravel().astype(jnp.float32) for i in small])
            p_pack = jnp.concatenate([p_leaves[i].ravel().astype(jnp.float32) for i in small])
            upd_pack, mu_pack, nu_pack = adam(
                g_pack, state.mu_pack, state.nu_pack, p_pack
            )
            for i in small:
                sz = p_leaves[i].size
                piece = jax.lax.dynamic_slice_in_dim(
                    upd_pack, offsets[i], sz
                ).reshape(p_leaves[i].shape)
                out[i] = piece.astype(p_leaves[i].dtype)
        else:
            mu_pack, nu_pack = state.mu_pack, state.nu_pack

        mu_big, nu_big = {}, {}
        for i in big:
            out[i], mu_big[str(i)], nu_big[str(i)] = adam(
                g_leaves[i], state.mu_big[str(i)], state.nu_big[str(i)],
                p_leaves[i],
            )
            mu_big[str(i)] = mu_big[str(i)].astype(p_leaves[i].dtype)
            nu_big[str(i)] = nu_big[str(i)].astype(p_leaves[i].dtype)

        new_state = PackedAdamWState(
            count=count, mu_pack=mu_pack, nu_pack=nu_pack,
            mu_big=mu_big, nu_big=nu_big,
        )
        return treedef.unflatten(out), new_state

    return optax.GradientTransformation(init, update)
