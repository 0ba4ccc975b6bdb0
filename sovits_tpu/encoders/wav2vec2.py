"""Generic wav2vec2/HuBERT-family speech encoder in flax.

One topology covers the reference's SoftVC front-ends (SURVEY.md section
2.5): ContentVec768L12 / ContentVec256L9 (fairseq HuBERT base),
hubertsoft (bshall HuBERT-soft, vencoder/hubert/hubert_model.py:11-127),
and cnhubertlarge — they all share:

  waveform -> 7-layer strided conv feature extractor (512 ch, group-norm on
  the first layer, exact GELU) -> LayerNorm(512) -> Linear(512 -> d_model)
  -> + grouped positional conv (k=128, g=16, weight-norm over dim=2)
  -> LayerNorm -> N post-LN transformer layers (GELU FFN).

Variants differ only in d_model/layers/output tap/final projection, wired
through :class:`Wav2Vec2Config`. 16 kHz input, 320-sample hop (50 fps).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    conv_layers: Sequence[tuple[int, int, int]] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    output_layer: int | None = None  # tap the N-th layer's output (1-based)
    final_proj_dim: int | None = None  # e.g. 256 for hubertsoft / vec256l9
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16


class ConvFeatureExtractor(nn.Module):
    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        # wav: [B, L] -> [B, T, 512]
        x = wav[:, :, None]
        for i, (ch, k, s) in enumerate(self.config.conv_layers):
            x = nn.Conv(
                ch,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(
                    num_groups=ch, epsilon=1e-5, dtype=self.dtype, name="group_norm"
                )(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding, weight-normed over dim=2.

    torch weight_norm(conv, dim=2) on weight (out, in/g, kw): one gain per
    kernel position, normalized over (out, in) — mirrored here on the
    [kw, in/g, out] kernel with g of shape (kw,).
    """

    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.config.d_model
        k = self.config.pos_conv_kernel
        groups = self.config.pos_conv_groups
        kshape = (k, d // groups, d)
        v = self.param("kernel", nn.initializers.normal(0.02), kshape)
        g = self.param(
            "g_k",
            lambda key, shape: jnp.sqrt(
                jnp.sum(nn.initializers.normal(0.02)(key, kshape) ** 2, axis=(1, 2))
            ).reshape(shape),
            (k,),
        )
        norm = jnp.sqrt(jnp.sum(v**2, axis=(1, 2), keepdims=True))
        kernel = v * (g.reshape(-1, 1, 1) / (norm + 1e-12))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding=((k // 2, k // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
        ) + bias.astype(self.dtype)
        y = y[:, : x.shape[1], :]  # even kernel: trim the trailing frame
        return jax.nn.gelu(y, approximate=False)


class TransformerLayer(nn.Module):
    """Post-LN transformer layer (torch TransformerEncoderLayer / fairseq)."""

    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads,
            qkv_features=cfg.d_model,
            out_features=cfg.d_model,
            dtype=self.dtype,
            deterministic=True,
            name="self_attn",
        )(x, x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + h)
        h = nn.Dense(cfg.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.d_model, dtype=self.dtype, name="fc2")(h)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)
        return x


class Wav2Vec2Encoder(nn.Module):
    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        cfg = self.config
        x = ConvFeatureExtractor(cfg, dtype=self.dtype, name="feature_extractor")(wav)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="feat_norm")(x)
        x = nn.Dense(cfg.d_model, dtype=self.dtype, name="feat_proj")(x)
        x = x + PositionalConvEmbedding(cfg, dtype=self.dtype, name="pos_conv")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="encoder_norm")(x)
        n = cfg.output_layer or cfg.n_layers
        for i in range(n):
            x = TransformerLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x)
        if cfg.final_proj_dim:
            x = nn.Dense(cfg.final_proj_dim, dtype=self.dtype, name="final_proj")(x)
        return x
