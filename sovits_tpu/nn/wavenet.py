"""Non-causal WaveNet block with gated activations and global conditioning.

Functional equivalent of the reference's ``WN`` (modules/modules.py:73-146):
n_layers of [dilated conv -> add speaker-cond offsets -> tanh*sigmoid gate ->
1x1 res/skip split], res into the running state, skips summed into the
output. Used by the posterior encoder (16 layers) and every flow coupling
(4 layers each) — the #2 hot loop of the model (SURVEY.md section 3).

TPU notes: the gate is a single fused elementwise chain XLA folds into the
conv epilogue; conditioning offsets for all layers come from one 1x1 conv of
g, sliced per layer ([B, 1, 2H] broadcast over T).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv1d, make_conv1d


def gated_tanh_sigmoid(x: jax.Array, cond: jax.Array) -> jax.Array:
    """tanh(a) * sigmoid(b) on the two channel halves of x + cond.

    Fused add-tanh-sigmoid-multiply (modules/commons.py:129-136).
    """
    s = x + cond
    a, b = jnp.split(s, 2, axis=-1)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


class WaveNet(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    separable: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, H]
        x_mask: jax.Array,  # [B, T, 1]
        g: jax.Array | None = None,  # [B, 1, gin]
        deterministic: bool = True,
    ) -> jax.Array:
        h = self.hidden_channels
        assert self.kernel_size % 2 == 1

        if g is not None and self.gin_channels:
            # One 1x1 conv produces all layers' conditioning offsets.
            g_all = Conv1d(
                features=2 * h * self.n_layers,
                kernel_size=1,
                weight_norm=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="cond",
            )(g)
        else:
            g_all = None

        drop = nn.Dropout(rate=self.p_dropout, deterministic=deterministic)

        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            padding = (self.kernel_size - 1) * dilation // 2
            x_in = make_conv1d(
                self.separable,
                features=2 * h,
                kernel_size=self.kernel_size,
                dilation=dilation,
                padding=padding,
                weight_norm=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"in_{i}",
            )(x)
            if g_all is not None:
                g_l = g_all[..., i * 2 * h : (i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)

            acts = gated_tanh_sigmoid(x_in, g_l)
            acts = drop(acts)

            last = i == self.n_layers - 1
            res_skip = Conv1d(
                features=h if last else 2 * h,
                kernel_size=1,
                weight_norm=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"res_skip_{i}",
            )(acts)
            if not last:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask
