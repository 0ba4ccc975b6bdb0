"""Alias-free Snake activation (vdecoder/hifiganwithsnake/alias/*).

SnakeBeta: x + sin^2(alpha x)/beta with per-channel log-scale parameters
(act.py:36-93). SnakeAlias wraps it between kaiser-windowed 2x up/down
resampling so the nonlinearity doesn't alias (act.py:109-130,
resample.py:10-71, filter.py:29-57). The fixed kaiser-sinc filters are
host-side constants; up/downsampling are depthwise (grouped) convs.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


@functools.lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """filter.py:29-57 (julius lowpass); returns [kernel_size] summing to 1."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def upsample2x(x: jax.Array, ratio: int = 2, kernel_size: int = 12) -> jax.Array:
    """resample.py UpSample1d on [B, T, C]: replicate pad -> transposed
    depthwise kaiser-sinc conv (x ratio gain) -> crop."""
    c = x.shape[-1]
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    kernel = jnp.asarray(filt)[::-1].reshape(kernel_size, 1, 1) * jnp.ones((1, 1, c))
    y = ratio * jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=((kernel_size - 1, kernel_size - 1),),
        lhs_dilation=(ratio,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )
    return y[:, pad_left : y.shape[1] - pad_right]


def downsample2x(x: jax.Array, ratio: int = 2, kernel_size: int = 12) -> jax.Array:
    """resample.py DownSample1d: replicate pad -> strided depthwise lowpass."""
    c = x.shape[-1]
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    kernel = jnp.asarray(filt).reshape(kernel_size, 1, 1) * jnp.ones((1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(ratio,),
        padding=((0, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )


class SnakeBeta(nn.Module):
    """x + sin^2(alpha x) / beta, log-scale per-channel params (act.py:36-93)."""

    alpha_logscale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (c,))
        beta = self.param("beta", init, (c,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


class SnakeAlias(nn.Module):
    """2x-oversampled SnakeBeta (act.py:109-130)."""

    up_kernel_size: int = 12
    down_kernel_size: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = upsample2x(x, 2, self.up_kernel_size)
        x = SnakeBeta(dtype=self.dtype, name="act")(x)
        return downsample2x(x, 2, self.down_kernel_size)
