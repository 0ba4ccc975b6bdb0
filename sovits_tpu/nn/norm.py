"""Normalization layers (channels-last, so no transposes needed).

The reference's LayerNorm transposes to channels-last and back
(modules/modules.py:23-35); in this framework activations already live in
[B, T, C] so it is a plain last-axis layer norm with eps=1e-5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        channels = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (channels,), self.param_dtype)
        beta = self.param("bias", nn.initializers.zeros, (channels,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        return y.astype(self.dtype)
