"""GAN discriminators: multi-period + scale (models.py:165-252).

``MultiPeriodDiscriminator`` = one DiscriminatorS (grouped-conv 1-D tower)
plus DiscriminatorP at periods (2, 3, 5, 7, 11), each returning logits and
per-layer feature maps for the feature-matching loss.

Waveforms are [B, T, 1]. The period discriminators fold time into
[B, T/p, p, 1] (NHWC) and convolve with (k, 1) kernels — each period conv is
a batched matmul on the MXU. use_spectral_norm=True swaps weight norm for
torch-style spectral norm with power-iteration state in the 'spectral'
variable collection (models.py:168,203 norm_f selection).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.conv import Conv1d, Conv2d
from ..nn.resblocks import leaky_relu

PERIODS = (2, 3, 5, 7, 11)


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False
    # reference tower widths (models.py:165-200); overridable for tiny
    # CI/smoke configs only — training parity requires the defaults
    channels: tuple[int, ...] = (32, 128, 512, 1024)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, c)

        fmap = []
        pad = (self.kernel_size - 1) // 2
        for i, ch in enumerate(self.channels):
            x = Conv2d(
                features=ch,
                kernel_size=(self.kernel_size, 1),
                strides=(self.stride, 1),
                padding=(pad, 0),
                weight_norm=not self.use_spectral_norm,
                spectral_norm=self.use_spectral_norm,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv2d(
            features=self.channels[-1],
            kernel_size=(self.kernel_size, 1),
            strides=(1, 1),
            padding=(pad, 0),
            weight_norm=not self.use_spectral_norm,
            spectral_norm=self.use_spectral_norm,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_4",
        )(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = Conv2d(
            features=1,
            kernel_size=(3, 1),
            padding=(1, 0),
            weight_norm=not self.use_spectral_norm,
            spectral_norm=self.use_spectral_norm,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_post",
        )(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    use_spectral_norm: bool = False
    # reference scale-disc specs (models.py:203-227), one row per conv:
    # (features, kernel, stride, groups, padding); overridable for tiny
    # CI/smoke configs only
    specs: tuple[tuple[int, int, int, int, int], ...] = (
        (16, 15, 1, 1, 7),
        (64, 41, 4, 4, 20),
        (256, 41, 4, 16, 20),
        (1024, 41, 4, 64, 20),
        (1024, 41, 4, 256, 20),
        (1024, 5, 1, 1, 2),
    )
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        b = x.shape[0]
        fmap = []
        for i, (ch, k, s, grp, pad) in enumerate(self.specs):
            in_ch = x.shape[-1]
            conv = Conv1d(
                features=ch,
                kernel_size=k,
                stride=s,
                groups=grp,
                padding=pad,
                weight_norm=not self.use_spectral_norm,
                spectral_norm=self.use_spectral_norm,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv_{i}",
            )
            # Narrow tower stages (in_ch < 128) run time-FOLDED: XLA
            # lane-pads the minor dim of [B, T, C<128] to 128 (8x HBM
            # traffic at C=16, measured ~1.4 ms/step of the GAN train step
            # in the conv_0/conv_1 stages alone); folding P samples into
            # the channel dim makes every contraction a full-width MXU
            # matmul (ops/folded.py). Refolds between stages are row-major
            # reshapes (free). Grouped stages expand to exact
            # block-diagonal dense kernels inside Conv1d's folded path.
            p_out = max(128 // ch, 1)
            p_in = p_out * s
            if in_ch < 128 and x.shape[1] % p_in == 0:
                xf = x.reshape(b, x.shape[1] // p_in, p_in * in_ch)
                yf = conv(xf, folded=(p_in, p_out))
                x = yf.reshape(b, yf.shape[1] * p_out, ch)
            else:
                x = conv(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv1d(
            features=1,
            kernel_size=3,
            padding=1,
            weight_norm=not self.use_spectral_norm,
            spectral_norm=self.use_spectral_norm,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_post",
        )(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: tuple[int, ...] = PERIODS
    use_spectral_norm: bool = False
    # None -> reference sizes; tiny CI configs may shrink (factory honors
    # hps.model.disc_tiny for the CPU-mesh learning tests)
    p_channels: tuple[int, ...] | None = None
    s_specs: tuple[tuple[int, int, int, int, int], ...] | None = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        """Returns (real_logits, fake_logits, real_fmaps, fake_fmaps)."""
        s_kw = {} if self.s_specs is None else {"specs": self.s_specs}
        p_kw = {} if self.p_channels is None else {"channels": self.p_channels}
        discs = [
            DiscriminatorS(
                use_spectral_norm=self.use_spectral_norm,
                dtype=self.dtype, param_dtype=self.param_dtype, name="disc_s",
                **s_kw,
            )
        ] + [
            DiscriminatorP(
                period=p, use_spectral_norm=self.use_spectral_norm,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"disc_p{p}",
                **p_kw,
            )
            for p in self.periods
        ]
        # one pass per sub-discriminator over [y; y_hat] stacked on batch —
        # identical math (convs are batch-parallel), half the kernel count
        # and twice the arithmetic per launch vs separate y / y_hat calls
        b = y.shape[0]
        both = jnp.concatenate([y, y_hat], axis=0)
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            logit, fmap = d(both)
            y_d_rs.append(logit[:b])
            y_d_gs.append(logit[b:])
            fmap_rs.append([f[:b] for f in fmap])
            fmap_gs.append([f[b:] for f in fmap])
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
