"""NSF-HiFiGAN-with-Snake generator ('nsf-snake-hifigan', models.py:429-431).

Same source-filter topology as the base generator but every leaky-relu is
replaced by an alias-free SnakeAlias activation: before each upsample,
around every resblock conv, and before conv_post
(vdecoder/hifiganwithsnake/models.py:36-420).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.conv import Conv1d, ConvTranspose1d
from ..nn.resblocks import resblock_kernel_init
from ..nn.snake import SnakeAlias
from .nsf_hifigan import SourceModuleHnNSF


class SnakeResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for j, d in enumerate(self.dilations):
            xt = SnakeAlias(dtype=self.dtype, name=f"act1_{j}")(x)
            xt = Conv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                dilation=d,
                padding=(self.kernel_size - 1) * d // 2,
                weight_norm=True,
                kernel_init=resblock_kernel_init,
                dtype=self.dtype,
                name=f"conv1_{j}",
            )(xt)
            xt = SnakeAlias(dtype=self.dtype, name=f"act2_{j}")(xt)
            xt = Conv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                weight_norm=True,
                kernel_init=resblock_kernel_init,
                dtype=self.dtype,
                name=f"conv2_{j}",
            )(xt)
            x = xt + x
        return x


class SnakeResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: tuple[int, ...] = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for j, d in enumerate(self.dilations):
            xt = SnakeAlias(dtype=self.dtype, name=f"act_{j}")(x)
            xt = Conv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                dilation=d,
                padding=(self.kernel_size - 1) * d // 2,
                weight_norm=True,
                kernel_init=resblock_kernel_init,
                dtype=self.dtype,
                name=f"conv_{j}",
            )(xt)
            x = xt + x
        return x


class SnakeGenerator(nn.Module):
    """Drop-in alternative decoder (hifiganwithsnake Generator:338-416)."""

    sampling_rate: int = 44100
    inter_channels: int = 192
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (8, 8, 2, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4, 4)
    gin_channels: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T_frames, inter]
        f0: jax.Array,  # [B, T_frames]
        g: jax.Array | None = None,
        rng: jax.Array | None = None,
    ) -> jax.Array:
        upp = int(np.prod(self.upsample_rates))
        num_kernels = len(self.resblock_kernel_sizes)

        har_source, _ = SourceModuleHnNSF(
            sample_rate=self.sampling_rate,
            harmonic_num=8,
            dtype=self.dtype,
            name="m_source",
        )(f0, upp, rng)

        x = Conv1d(
            features=self.upsample_initial_channel,
            kernel_size=7,
            padding=3,
            weight_norm=True,
            dtype=self.dtype,
            name="conv_pre",
        )(x)
        if g is not None:
            x = x + Conv1d(
                features=self.upsample_initial_channel,
                kernel_size=1,
                dtype=self.dtype,
                name="cond",
            )(g)

        rb_cls = SnakeResBlock1 if self.resblock == "1" else SnakeResBlock2
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = SnakeAlias(dtype=self.dtype, name=f"snake_{i}")(x)
            x = ConvTranspose1d(
                features=ch,
                kernel_size=k,
                stride=u,
                padding=(k - u + 1) // 2,
                weight_norm=True,
                kernel_init=resblock_kernel_init,
                dtype=self.dtype,
                name=f"up_{i}",
            )(x)
            if i + 1 < len(self.upsample_rates):
                stride_f0 = int(np.prod(self.upsample_rates[i + 1 :]))
                x_source = Conv1d(
                    features=ch,
                    kernel_size=stride_f0 * 2,
                    stride=stride_f0,
                    padding=(stride_f0 + 1) // 2,
                    dtype=self.dtype,
                    name=f"noise_conv_{i}",
                )(har_source)
            else:
                x_source = Conv1d(
                    features=ch, kernel_size=1, dtype=self.dtype, name=f"noise_conv_{i}"
                )(har_source)
            x = x + x_source
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                rb = rb_cls(
                    channels=ch,
                    kernel_size=rk,
                    dilations=tuple(rd),
                    dtype=self.dtype,
                    name=f"resblock_{i}_{j}",
                )(x)
                xs = rb if xs is None else xs + rb
            x = xs / num_kernels
        x = SnakeAlias(dtype=self.dtype, name="snake_post")(x)
        x = Conv1d(
            features=1,
            kernel_size=7,
            padding=3,
            weight_norm=True,
            kernel_init=resblock_kernel_init,
            dtype=self.dtype,
            name="conv_post",
        )(x)
        return jnp.tanh(x)
