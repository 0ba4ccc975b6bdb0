"""HiFiGAN multi-dilation residual blocks.

Equivalent of ResBlock1/ResBlock2 (modules/modules.py:149-218 and
vdecoder/hifigan/models.py:36-97): pairs of leaky-relu + weight-normed
dilated convs with residual adds. All convs init N(0, 0.01) like the
reference's init_weights (modules/commons.py:25-31).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import make_conv1d

LRELU_SLOPE = 0.1

resblock_kernel_init = nn.initializers.normal(stddev=0.01)


def leaky_relu(x: jax.Array, slope: float = LRELU_SLOPE) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


class ResBlock1(nn.Module):
    """3x (lrelu -> dilated conv -> lrelu -> conv), residual per pair."""

    channels: int
    kernel_size: int = 3
    dilations: tuple[int, ...] = (1, 3, 5)
    separable: bool = False
    fold_p: int = 1  # time-fold factor for MXU-shaped convs (ops/folded.py)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array | None = None,
        folded: bool = False,
        return_weights: bool = False,
    ) -> jax.Array:
        """folded: x is a [B, T/fold_p, fold_p*C] view and stays folded.
        return_weights: return the 6 (kernel, bias) pairs in chain order
        (for the Pallas fused-stage engine) instead of computing."""

        def conv(name, dilation):
            return make_conv1d(
                self.separable,
                features=self.channels,
                kernel_size=self.kernel_size,
                dilation=dilation,
                padding=(self.kernel_size - 1) * dilation // 2,
                weight_norm=True,
                kernel_init=resblock_kernel_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=name,
            )

        if return_weights or folded:
            assert not self.separable, "folded/fused path requires plain convs"
        if return_weights:
            return [
                conv(f"conv{which}_{j}", d if which == 1 else 1)(
                    x, folded=(self.fold_p, self.fold_p) if folded else None,
                    return_kernel=True,
                )
                for j, d in enumerate(self.dilations)
                for which in (1, 2)
            ]

        assert not (folded and x_mask is not None), "mask unsupported when folded"
        fold_kw = {"folded": (self.fold_p, self.fold_p)} if folded else {}
        for j, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = conv(f"conv1_{j}", d)(xt, **fold_kw)
            xt = leaky_relu(xt)
            if x_mask is not None:
                xt = xt * x_mask
            xt = conv(f"conv2_{j}", 1)(xt, **fold_kw)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    """2x (lrelu -> dilated conv), residual each."""

    channels: int
    kernel_size: int = 3
    dilations: tuple[int, ...] = (1, 3)
    separable: bool = False
    fold_p: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array | None = None,
        folded: bool = False,
        return_weights: bool = False,
    ) -> jax.Array:
        def conv(name, dilation):
            return make_conv1d(
                self.separable,
                features=self.channels,
                kernel_size=self.kernel_size,
                dilation=dilation,
                padding=(self.kernel_size - 1) * dilation // 2,
                weight_norm=True,
                kernel_init=resblock_kernel_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=name,
            )

        if return_weights or folded:
            assert not self.separable, "folded/fused path requires plain convs"
        if return_weights:
            return [
                conv(f"conv_{j}", d)(
                    x, folded=(self.fold_p, self.fold_p) if folded else None,
                    return_kernel=True,
                )
                for j, d in enumerate(self.dilations)
            ]

        assert not (folded and x_mask is not None), "mask unsupported when folded"
        fold_kw = {"folded": (self.fold_p, self.fold_p)} if folded else {}
        for j, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = conv(f"conv_{j}", d)(xt, **fold_kw)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x
