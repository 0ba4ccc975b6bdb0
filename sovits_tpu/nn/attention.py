"""Transformer blocks: relative-position MHA, Encoder, causal FFT, conv FFN.

Functional equivalents of modules/attentions.py in the reference:
- ``MultiHeadAttention`` with Shaw-style relative-position attention
  (window_size=4, shared heads) and the rel<->abs index shuffles
  (attentions.py:161-314),
- ``Encoder``: post-LN self-attention stack with windowed relative attention
  (attentions.py:73-107) — the content encoder,
- ``FFT``: causal self-attention stack with optional flow conditioning via a
  gated fuse (attentions.py:12-70) — the f0 decoder / transformer flow,
- ``FFN``: conv1d feed-forward with causal or same padding
  (attentions.py:317-363).

TPU notes: QKV projections are Dense ops (1x1 convs) on [B, T, C]; attention
logits/softmax run in fp32; the relative-position shuffles are pure
pad/reshape ops that XLA lowers to cheap copies. Sequence lengths here are
O(800) frames so full [T, T] attention is tiny compared to the vocoder.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import LayerNorm
from .wavenet import gated_tanh_sigmoid
from .conv import Conv1d

xavier_init = nn.initializers.xavier_uniform()

# fused-attention VMEM budget: [T, T] f32 scores per (batch, head) program
_FUSED_MAX_T = 1024


def _relative_to_absolute(x: jax.Array) -> jax.Array:
    """[B, H, L, 2L-1] relative logits -> [B, H, L, L] absolute.

    Pad-and-reshape index shuffle (attentions.py:274-289).
    """
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, length * 2 * length)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, length - 1)))
    x_final = x_flat.reshape(b, h, length + 1, 2 * length - 1)
    return x_final[:, :, :length, length - 1 :]


def _absolute_to_relative(x: jax.Array) -> jax.Array:
    """[B, H, L, L] attention weights -> [B, H, L, 2L-1] relative.

    Inverse shuffle (attentions.py:291-303).
    """
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, length - 1)))
    x_flat = x.reshape(b, h, length * length + length * (length - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (length, 0)))
    x_final = x_flat.reshape(b, h, length, 2 * length)
    return x_final[:, :, :, 1:]


def _band_to_absolute(x: jax.Array, w: int) -> jax.Array:
    """[B, H, T, 2w+1] banded rel logits -> [B, H, T, T], zeros off-band.

    Exact band variant of `_relative_to_absolute`: A[t, t+o-w] = x[t, o].
    The flatten-with-stride-(T+1) aliasing places every in-band entry at
    its diagonal; off-band positions (which alias neighbouring rows) are
    masked to zero — the positions the padded-table formulation fills
    with exact zeros anyway.
    """
    b, h, t, win = x.shape
    y = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t + 1 - win)))
    a = y.reshape(b, h, t * (t + 1))[:, :, w : w + t * t].reshape(b, h, t, t)
    band = jnp.abs(jnp.arange(t)[:, None] - jnp.arange(t)[None, :]) <= w
    return jnp.where(band, a, jnp.zeros((), a.dtype))


def _absolute_to_band(p: jax.Array, w: int) -> jax.Array:
    """[B, H, T, T] attention weights -> [B, H, T, 2w+1] band.

    Exact band variant of `_absolute_to_relative`: x[t, o] = p[t, t+o-w],
    zero where t+o-w is out of range (the padded-table formulation reads
    zero-padding there)."""
    b, h, t, _ = p.shape
    win = 2 * w + 1
    z = jnp.pad(p.reshape(b, h, t * t), ((0, 0), (0, 0), (w, t - w)))
    x = z[:, :, : t * (t + 1)].reshape(b, h, t, t + 1)[:, :, :, :win]
    o = jnp.arange(win)[None, :]
    tt = jnp.arange(t)[:, None]
    valid = (tt + o - w >= 0) & (tt + o - w < t)
    return jnp.where(valid, x, jnp.zeros((), x.dtype))


def _window_relative_embeddings(emb: jax.Array, length: int, window: int) -> jax.Array:
    """Slice/pad the [heads, 2w+1, d] table to [heads, 2L-1, d].

    attentions.py:259-272: zero-pad when L > w+1, center-slice otherwise.
    """
    pad_len = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad_len > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: int | None = None
    heads_share: bool = True
    proximal_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # None = auto (fused Pallas attention on TPU when eligible);
    # True/False force it on/off. Eligibility: self-attention, shared-head
    # (or absent) rel table, no proximal bias, T <= _FUSED_MAX_T.
    use_fused: bool | None = None

    def _fused_eligible(self, t_t: int, t_s: int, causal: bool,
                        key_mask, attn_mask) -> bool:
        if self.use_fused is False:
            return False
        if self.use_fused is None and jax.default_backend() != "tpu":
            return False
        if t_t != t_s or self.proximal_bias or t_t > _FUSED_MAX_T:
            return False
        if attn_mask is not None and key_mask is None and not causal:
            # a free-form attn_mask is not representable in the fused kernel;
            # only the structured forms (key padding mask / causal tril) are.
            # Without this, a custom mask would be silently dropped on TPU.
            return False
        if self.window_size is not None:
            # band formulation needs the full-table regime + shared heads
            if not self.heads_share or t_s < 2 * self.window_size + 1:
                return False
        elif not causal and key_mask is None:
            return False  # nothing fused to gain; keep the jnp path
        return True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T_t, C] query source
        c: jax.Array,  # [B, T_s, C] key/value source
        attn_mask: jax.Array | None = None,  # [.., T_t, T_s], 0 = masked
        deterministic: bool = True,
        key_mask: jax.Array | None = None,  # [B, T_s] structured alternative
        causal: bool = False,  # structured alternative to a tril attn_mask
    ) -> jax.Array:
        assert self.channels % self.n_heads == 0
        k_ch = self.channels // self.n_heads
        b, t_t, _ = x.shape
        t_s = c.shape[1]

        dense = lambda name: nn.Dense(  # noqa: E731  (1x1 conv == Dense)
            self.channels,
            kernel_init=xavier_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        q = dense("query")(x).reshape(b, t_t, self.n_heads, k_ch)
        k = dense("key")(c).reshape(b, t_s, self.n_heads, k_ch)
        v = dense("value")(c).reshape(b, t_s, self.n_heads, k_ch)

        # [B, H, T, d]
        q = q.transpose(0, 2, 1, 3) / math.sqrt(k_ch)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        emb_rel_k = emb_rel_v = None
        if self.window_size is not None:
            assert t_s == t_t, "relative attention needs self-attention"
            n_heads_rel = 1 if self.heads_share else self.n_heads
            rel_stddev = k_ch**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, k_ch),
                self.param_dtype,
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, k_ch),
                self.param_dtype,
            )

        if not self.is_initializing() and self._fused_eligible(
            t_t, t_s, causal, key_mask, attn_mask
        ):
            from ..ops.attention import fused_attention

            h = self.n_heads
            qf = q.reshape(b * h, t_t, k_ch)
            kf = k.reshape(b * h, t_s, k_ch)
            vf = v.reshape(b * h, t_s, k_ch)
            km = (
                jnp.repeat(key_mask.astype(qf.dtype), h, axis=0)
                if key_mask is not None
                else None
            )
            dm = None
            if self.p_dropout > 0.0 and not deterministic:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"),
                    1.0 - self.p_dropout,
                    (b * h, t_t, t_s),
                )
                dm = keep.astype(qf.dtype) / (1.0 - self.p_dropout)
            out = fused_attention(
                qf, kf, vf,
                emb_rel_k[0] if emb_rel_k is not None else None,
                emb_rel_v[0] if emb_rel_v is not None else None,
                key_mask=km, drop_mask=dm,
                window=self.window_size, causal=causal,
            )
            out = out.reshape(b, h, t_t, k_ch)
            out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
            from .conv import torch_conv_kernel_init

            return nn.Dense(
                self.out_channels,
                kernel_init=torch_conv_kernel_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="out",
            )(out)

        # scores stay in the module dtype (bf16 under mixed precision - the
        # reference's fp16 autocast computes them in half too); softmax
        # upcasts to f32 below. Keeping the scores tensor narrow makes the
        # backward dq/dk contractions MXU-native instead of f32.
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k)

        if self.window_size is not None:
            if t_s >= 2 * self.window_size + 1:
                # banded path: the (2w+1)-entry table zero-pads to 2L-1
                # columns in the reference formulation — only the center
                # 2w+1 ever carry values, so compute the [T, 2w+1] band
                # directly and place it on the diagonals (exact: dropped
                # terms are multiplications with structural zeros)
                rel_logits = jnp.einsum(
                    "bhtd,gmd->bhtm", q, emb_rel_k.astype(q.dtype)
                )
                scores = scores + _band_to_absolute(rel_logits, self.window_size)
            else:
                key_rel = _window_relative_embeddings(
                    emb_rel_k, t_s, self.window_size
                )
                rel_logits = jnp.einsum(
                    "bhtd,gmd->bhtm", q, key_rel.astype(q.dtype)
                )
                scores = scores + _relative_to_absolute(rel_logits)

        if self.proximal_bias:
            assert t_s == t_t
            r = jnp.arange(t_s, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None]

        if causal:
            # structured causal mask, honored with or without an attn_mask
            # (callers like FFT pass attn_mask=None + causal=True; a caller
            # combining a padding attn_mask with causal=True gets both)
            off = (
                jnp.arange(t_s, dtype=jnp.int32)[None, :]
                - jnp.arange(t_t, dtype=jnp.int32)[:, None]
            )
            scores = jnp.where(off[None, None] <= 0, scores, -1e4)
        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)

        p_attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        p_attn = nn.Dropout(rate=self.p_dropout, deterministic=deterministic)(p_attn)
        p_attn = p_attn.astype(v.dtype)

        out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)

        if self.window_size is not None:
            if t_s >= 2 * self.window_size + 1:
                band_weights = _absolute_to_band(p_attn, self.window_size)
                out = out + jnp.einsum(
                    "bhtm,gmd->bhtd", band_weights, emb_rel_v.astype(out.dtype)
                )
            else:
                rel_weights = _absolute_to_relative(p_attn)
                value_rel = _window_relative_embeddings(
                    emb_rel_v, t_s, self.window_size
                )
                out = out + jnp.einsum(
                    "bhtm,gmd->bhtd", rel_weights, value_rel.astype(out.dtype)
                )

        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        # Output projection keeps torch's default conv init (not xavier).
        from .conv import torch_conv_kernel_init

        return nn.Dense(
            self.out_channels,
            kernel_init=torch_conv_kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="out",
        )(out)


class FFN(nn.Module):
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: str | None = None
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _pad(self) -> tuple[int, int]:
        if self.kernel_size == 1:
            return (0, 0)
        if self.causal:
            return (self.kernel_size - 1, 0)
        return ((self.kernel_size - 1) // 2, self.kernel_size // 2)

    @nn.compact
    def __call__(
        self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        pad = self._pad()
        x = Conv1d(
            features=self.filter_channels,
            kernel_size=self.kernel_size,
            padding=pad,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv1",
        )(x * x_mask)
        if self.activation == "gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = jnp.maximum(x, 0.0)
        x = nn.Dropout(rate=self.p_dropout, deterministic=deterministic)(x)
        x = Conv1d(
            features=self.out_channels,
            kernel_size=self.kernel_size,
            padding=pad,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv2",
        )(x * x_mask)
        return x * x_mask


class Encoder(nn.Module):
    """Post-LN self-attention stack with windowed relative attention."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_fused: bool | None = None

    @nn.compact
    def __call__(
        self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        attn_mask = (x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0]).astype(
            jnp.float32
        )  # [B, 1, T, T]
        drop = nn.Dropout(rate=self.p_dropout, deterministic=deterministic)
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                n_heads=self.n_heads,
                p_dropout=self.p_dropout,
                window_size=self.window_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_fused=self.use_fused,
                name=f"attn_{i}",
            )(x, x, attn_mask, deterministic, key_mask=x_mask[:, :, 0])
            y = drop(y)
            x = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name=f"norm1_{i}")(x + y)
            y = FFN(
                out_channels=self.hidden_channels,
                filter_channels=self.filter_channels,
                kernel_size=self.kernel_size,
                p_dropout=self.p_dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"ffn_{i}",
            )(x, x_mask, deterministic)
            y = drop(y)
            x = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name=f"norm2_{i}")(x + y)
        return x * x_mask


class FFT(nn.Module):
    """Causal self-attention stack, optionally flow-conditioned on g."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int = 1
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = False
    isflow: bool = False
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_fused: bool | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        drop = nn.Dropout(rate=self.p_dropout, deterministic=deterministic)

        g_all = None
        cond_pre = None
        if self.isflow and g is not None:
            g_all = Conv1d(
                features=2 * self.hidden_channels * self.n_layers,
                kernel_size=1,
                weight_norm=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="cond",
            )(g)
            # One shared pre-gate projection across layers (attentions.py:26).
            cond_pre = Conv1d(
                features=2 * self.hidden_channels,
                kernel_size=1,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="cond_pre",
            )

        x = x * x_mask
        for i in range(self.n_layers):
            if g_all is not None:
                xc = cond_pre(x)
                g_l = g_all[
                    ..., i * 2 * self.hidden_channels : (i + 1) * 2 * self.hidden_channels
                ]
                x = gated_tanh_sigmoid(xc, g_l)
            y = MultiHeadAttention(
                channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                n_heads=self.n_heads,
                p_dropout=self.p_dropout,
                proximal_bias=self.proximal_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_fused=self.use_fused,
                name=f"attn_{i}",
            )(x, x, None, deterministic, causal=True)
            y = drop(y)
            x = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name=f"norm0_{i}")(x + y)
            y = FFN(
                out_channels=self.hidden_channels,
                filter_channels=self.filter_channels,
                kernel_size=self.kernel_size,
                p_dropout=self.p_dropout,
                causal=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"ffn_{i}",
            )(x, x_mask, deterministic)
            y = drop(y)
            x = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name=f"norm1_{i}")(x + y)
        return x * x_mask
