"""Diffusion WaveNet denoiser (diffusion/wavenet.py:10-108 equivalent).

20 non-dilated gated residual blocks conditioned on the sinusoidal
diffusion-step embedding and the Unit2Mel hidden track. Channels-last
[B, T, M] <-> one fused chain of 1x1/k3 convs per block on the MXU.
Note the gate order: sigmoid(first half) * tanh(second half) — opposite of
the VITS WN (wavenet.py:54-55 in the reference diffusion stack).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.conv import Conv1d

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def sinusoidal_pos_emb(t: jax.Array, dim: int) -> jax.Array:
    """[B] diffusion steps -> [B, dim] (wavenet.py:16-28)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class ResidualBlock(nn.Module):
    residual_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, step_emb):
        c = self.residual_channels
        step = nn.Dense(c, dtype=self.dtype, name="diffusion_projection")(step_emb)
        y = x + step[:, None, :]
        y = Conv1d(
            features=2 * c, kernel_size=3, padding=1, dtype=self.dtype, name="dilated_conv"
        )(y)
        y = y + Conv1d(
            features=2 * c, kernel_size=1, dtype=self.dtype, name="conditioner_projection"
        )(cond)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = Conv1d(
            features=2 * c, kernel_size=1, dtype=self.dtype, name="output_projection"
        )(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class DiffusionWaveNet(nn.Module):
    in_dims: int = 128
    n_layers: int = 20
    n_chans: int = 384
    n_hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spec: jax.Array, t: jax.Array, cond: jax.Array) -> jax.Array:
        """spec [B, T, M], t [B] int steps, cond [B, T, H] -> noise [B, T, M]."""
        x = Conv1d(
            features=self.n_chans,
            kernel_size=1,
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            name="input_projection",
        )(spec)
        x = jnp.maximum(x, 0.0)

        emb = sinusoidal_pos_emb(t, self.n_chans)
        emb = nn.Dense(self.n_chans * 4, dtype=self.dtype, name="mlp1")(emb)
        emb = mish(emb)
        emb = nn.Dense(self.n_chans, dtype=self.dtype, name="mlp2")(emb)

        skips = 0.0
        for i in range(self.n_layers):
            x, skip = ResidualBlock(
                residual_channels=self.n_chans, dtype=self.dtype, name=f"layer_{i}"
            )(x, cond, emb)
            skips = skips + skip
        x = skips / math.sqrt(self.n_layers)
        x = Conv1d(
            features=self.n_chans,
            kernel_size=1,
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            name="skip_projection",
        )(x)
        x = jnp.maximum(x, 0.0)
        x = Conv1d(
            features=self.in_dims,
            kernel_size=1,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="output_projection",
        )(x)
        return x
