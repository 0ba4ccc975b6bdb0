"""Sequence masking and jit-friendly random segment slicing.

Replaces the reference's python-loop batch slicing (modules/commons.py:7-23,
67-93) with vmapped ``lax.dynamic_slice`` — fully traceable, static output
shapes, runs on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """[B] lengths -> [B, max_length] float mask (commons.py:144-148)."""
    x = jnp.arange(max_length)
    return (x[None, :] < lengths[:, None]).astype(jnp.float32)


def subsequent_mask(length: int) -> jax.Array:
    """[1, 1, T, T] lower-triangular causal mask (commons.py:124-126)."""
    return jnp.tril(jnp.ones((length, length), dtype=jnp.float32))[None, None]


def slice_segments(x: jax.Array, ids_str: jax.Array, segment_size: int) -> jax.Array:
    """Slice [B, T, ...] at per-batch offsets -> [B, segment_size, ...].

    Time is axis 1 (channels-last layout). Equivalent to commons.py:67-73 but
    as a vmapped dynamic_slice (no python loop, jittable).
    """

    def slice_one(xi, idx):
        starts = (idx,) + (0,) * (xi.ndim - 1)
        sizes = (segment_size,) + xi.shape[1:]
        return jax.lax.dynamic_slice(xi, starts, sizes)

    return jax.vmap(slice_one)(x, ids_str)


def rand_slice_segments_with_pitch(
    rng: jax.Array,
    x: jax.Array,
    pitch: jax.Array,
    lengths: jax.Array,
    segment_size: int,
):
    """Joint random windows over latent [B, T, C] and pitch [B, T].

    Matches commons.py:15-23: ids_str = floor(U[0,1) * (lengths - seg + 1)).
    Returns (x_slice, pitch_slice, ids_str).
    """
    b = x.shape[0]
    ids_str_max = (lengths - segment_size + 1).astype(jnp.float32)
    u = jax.random.uniform(rng, (b,))
    ids_str = (u * ids_str_max).astype(jnp.int32)
    ids_str = jnp.maximum(ids_str, 0)
    return (
        slice_segments(x, ids_str, segment_size),
        slice_segments(pitch, ids_str, segment_size),
        ids_str,
    )


__all__ = [
    "sequence_mask",
    "subsequent_mask",
    "slice_segments",
    "rand_slice_segments_with_pitch",
]
