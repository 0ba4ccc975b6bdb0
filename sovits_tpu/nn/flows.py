"""Normalizing-flow layers: affine couplings over WN or transformer nets.

Equivalents of modules/modules.py:221-357 and models.py:15-92 in the
reference: mean-only affine couplings (WN inner net, or causal-FFT inner net
for the transformer flow), interleaved with channel Flips; optional
parameter sharing of the inner net across all couplings
(``flow_share_parameter``).

Couplings here transform [B, T, C] with the channel split on the last axis;
`forward` direction is used in training (z -> z_p), `reverse` at inference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import FFT
from .conv import Conv1d
from .wavenet import WaveNet

zeros_init = nn.initializers.zeros


def flip_channels(x: jax.Array) -> jax.Array:
    """Flip on the channel axis (modules/modules.py:232-239)."""
    return jnp.flip(x, axis=-1)


class ResidualCouplingLayer(nn.Module):
    """Mean-only affine coupling with a WaveNet inner net.

    modules/modules.py:260-307 (always mean_only=True in this model family,
    models.py:41-42). `post` conv is zero-initialized so the flow starts as
    identity.
    """

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    separable: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    shared_wn: nn.Module | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array | None = None,
        reverse: bool = False,
        deterministic: bool = True,
    ):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]

        h = Conv1d(
            features=self.hidden_channels,
            kernel_size=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pre",
        )(x0) * x_mask
        enc = (
            self.shared_wn
            if self.shared_wn is not None
            else WaveNet(
                hidden_channels=self.hidden_channels,
                kernel_size=self.kernel_size,
                dilation_rate=self.dilation_rate,
                n_layers=self.n_layers,
                gin_channels=self.gin_channels,
                separable=self.separable,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="enc",
            )
        )
        h = enc(h, x_mask, g=g, deterministic=deterministic)
        m = Conv1d(
            features=half,
            kernel_size=1,
            kernel_init=zeros_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="post",
        )(h) * x_mask

        if not reverse:
            x1 = (m + x1) * x_mask  # mean-only: logs == 0
            return jnp.concatenate([x0, x1], axis=-1), jnp.zeros(x.shape[0])
        x1 = (x1 - m) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class TransformerCouplingLayer(nn.Module):
    """Mean-only coupling with a causal-FFT inner net (modules.py:309-356)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    n_layers: int
    n_heads: int
    p_dropout: float = 0.0
    filter_channels: int = 0
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    shared_enc: nn.Module | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array | None = None,
        reverse: bool = False,
        deterministic: bool = True,
    ):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]

        h = Conv1d(
            features=self.hidden_channels,
            kernel_size=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pre",
        )(x0) * x_mask
        enc = (
            self.shared_enc
            if self.shared_enc is not None
            else FFT(
                hidden_channels=self.hidden_channels,
                filter_channels=self.filter_channels,
                n_heads=self.n_heads,
                n_layers=self.n_layers,
                kernel_size=self.kernel_size,
                p_dropout=self.p_dropout,
                isflow=True,
                gin_channels=self.gin_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="enc",
            )
        )
        h = enc(h, x_mask, g=g, deterministic=deterministic)
        m = Conv1d(
            features=half,
            kernel_size=1,
            kernel_init=zeros_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="post",
        )(h) * x_mask

        if not reverse:
            x1 = (m + x1) * x_mask
            return jnp.concatenate([x0, x1], axis=-1), jnp.zeros(x.shape[0])
        x1 = (x1 - m) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """n_flows x (coupling + flip), optionally sharing one WN (models.py:15-52)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0
    share_parameter: bool = False
    separable: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array | None = None,
        reverse: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        shared = (
            WaveNet(
                hidden_channels=self.hidden_channels,
                kernel_size=self.kernel_size,
                dilation_rate=self.dilation_rate,
                n_layers=self.n_layers,
                gin_channels=self.gin_channels,
                separable=self.separable,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="shared_wn",
            )
            if self.share_parameter
            else None
        )
        layers = [
            ResidualCouplingLayer(
                channels=self.channels,
                hidden_channels=self.hidden_channels,
                kernel_size=self.kernel_size,
                dilation_rate=self.dilation_rate,
                n_layers=self.n_layers,
                gin_channels=self.gin_channels,
                separable=self.separable,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                shared_wn=shared,
                name=f"coupling_{i}",
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            for layer in layers:
                x, _ = layer(x, x_mask, g=g, deterministic=deterministic)
                x = flip_channels(x)
        else:
            for layer in reversed(layers):
                x = flip_channels(x)
                x = layer(x, x_mask, g=g, reverse=True, deterministic=deterministic)
        return x


class TransformerCouplingBlock(nn.Module):
    """n_flows x (transformer coupling + flip) (models.py:54-92)."""

    channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float = 0.0
    n_flows: int = 4
    gin_channels: int = 0
    share_parameter: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array | None = None,
        reverse: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        shared = (
            FFT(
                hidden_channels=self.hidden_channels,
                filter_channels=self.filter_channels,
                n_heads=self.n_heads,
                n_layers=self.n_layers,
                kernel_size=self.kernel_size,
                p_dropout=self.p_dropout,
                isflow=True,
                gin_channels=self.gin_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="shared_enc",
            )
            if self.share_parameter
            else None
        )
        layers = [
            TransformerCouplingLayer(
                channels=self.channels,
                hidden_channels=self.hidden_channels,
                kernel_size=self.kernel_size,
                n_layers=self.n_layers,
                n_heads=self.n_heads,
                p_dropout=self.p_dropout,
                filter_channels=self.filter_channels,
                gin_channels=self.gin_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                shared_enc=shared,
                name=f"coupling_{i}",
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            for layer in layers:
                x, _ = layer(x, x_mask, g=g, deterministic=deterministic)
                x = flip_channels(x)
        else:
            for layer in reversed(layers):
                x = flip_channels(x)
                x = layer(x, x_mask, g=g, reverse=True, deterministic=deterministic)
        return x


class Log(nn.Module):
    """Log flow (modules/modules.py:221-229). Utility layer kept for parity."""

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False, **kwargs):
        if not reverse:
            y = jnp.log(jnp.clip(x, min=1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class ElementwiseAffine(nn.Module):
    """Per-channel affine flow (modules/modules.py:242-257)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False, **kwargs):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs[None, None, :] * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask
