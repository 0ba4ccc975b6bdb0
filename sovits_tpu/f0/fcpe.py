"""FCPE pitch estimation: the PCmer (performer-conformer) net in flax.

Equivalent of modules/F0Predictor/fcpe/ (model.py FCPE, pcmer.py):
log-mel(128) -> conv-in stack (GroupNorm(4) + leaky-relu) -> 12 PCmer
layers (performer softmax-kernel linear attention + conformer conv module)
-> LayerNorm -> weight-normed Dense(360) -> sigmoid salience -> local-argmax
cents decode. The performer projection matrix is a checkpoint buffer and
converts with the weights, so outputs match the torch implementation.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dsp.audio import resample
from ..dsp.mel import hann_window, mel_filterbank
from .base import F0Predictor


def softmax_kernel(data: jax.Array, projection: jax.Array, is_query: bool,
                   eps: float = 1e-4) -> jax.Array:
    """Performer FAVOR+ feature map (pcmer.py:12-45)."""
    normalizer = data.shape[-1] ** -0.25
    ratio = projection.shape[0] ** -0.5
    data_dash = jnp.einsum("...id,jd->...ij", normalizer * data, projection)
    diag = jnp.sum(data**2, axis=-1, keepdims=True) / 2.0 * normalizer**2
    if is_query:
        out = ratio * (
            jnp.exp(data_dash - diag - jnp.max(data_dash, axis=-1, keepdims=True)) + eps
        )
    else:
        out = ratio * jnp.exp(data_dash - diag + eps)
    return out


def linear_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Non-causal linear attention (pcmer.py:209-224)."""
    k_cumsum = k.sum(axis=-2)
    d_inv = 1.0 / (jnp.einsum("...nd,...d->...n", q, k_cumsum) + 1e-8)
    context = jnp.einsum("...nd,...ne->...de", k, v)
    return jnp.einsum("...de,...nd,...n->...ne", context, q, d_inv)


class FastSelfAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.heads
        inner = self.dim_head * h
        b, t, _ = x.shape
        nb_features = int(self.dim_head * math.log(self.dim_head))
        projection = self.param(
            "projection_matrix",
            nn.initializers.normal(1.0),
            (nb_features, self.dim_head),
        )
        q = nn.Dense(inner, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, dtype=self.dtype, name="to_v")(x)
        q, k, v = (
            a.reshape(b, t, h, self.dim_head).transpose(0, 2, 1, 3) for a in (q, k, v)
        )
        q = softmax_kernel(q, projection, is_query=True)
        k = softmax_kernel(k, projection, is_query=False)
        out = linear_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class ConformerConvModule(nn.Module):
    dim: int
    expansion: int = 2
    kernel_size: int = 31
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.expansion
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        y = nn.Dense(inner * 2, dtype=self.dtype, name="pw1")(y)
        a, gate = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(gate)
        pad = self.kernel_size // 2
        kernel = self.param(
            "dw_kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.kernel_size, 1, inner),
        )
        dw_bias = self.param("dw_bias", nn.initializers.zeros, (inner,))
        y = jax.lax.conv_general_dilated(
            y.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding=((pad, pad),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=inner,
        ) + dw_bias
        y = y * jax.nn.sigmoid(y)  # swish
        return nn.Dense(self.dim, dtype=self.dtype, name="pw2")(y)


class PCmerLayer(nn.Module):
    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = x + FastSelfAttention(self.dim, self.heads, dtype=self.dtype, name="attn")(h)
        x = x + ConformerConvModule(self.dim, dtype=self.dtype, name="conformer")(x)
        return x


class FcpeNet(nn.Module):
    input_channel: int = 128
    out_dims: int = 360
    n_layers: int = 12
    n_chans: int = 512
    f0_min: float = 32.70
    f0_max: float = 1975.5
    dtype: jnp.dtype = jnp.float32

    @property
    def cent_table(self) -> np.ndarray:
        lo = 1200.0 * np.log2(self.f0_min / 10.0)
        hi = 1200.0 * np.log2(self.f0_max / 10.0)
        return np.linspace(lo, hi, self.out_dims).astype(np.float32)

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel [B, T, M] -> salience [B, T, out_dims]."""
        x = nn.Conv(self.n_chans, (3,), padding=1, dtype=self.dtype, name="stack0")(mel)
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=self.dtype, name="stack_gn")(x)
        x = jnp.where(x >= 0, x, 0.01 * x)  # torch LeakyReLU default slope
        x = nn.Conv(self.n_chans, (3,), padding=1, dtype=self.dtype, name="stack3")(x)
        for i in range(self.n_layers):
            x = PCmerLayer(self.n_chans, dtype=self.dtype, name=f"layer_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        # weight-normed Linear (model.py:84-86)
        v = self.param(
            "out_v", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.n_chans, self.out_dims),
        )
        g = self.param("out_g", nn.initializers.ones, (self.out_dims,))
        b = self.param("out_b", nn.initializers.zeros, (self.out_dims,))
        w = v * (g / (jnp.linalg.norm(v, axis=0) + 1e-12))
        x = x @ w + b
        return jax.nn.sigmoid(x)


def cents_local_decoder(y: np.ndarray, cent_table: np.ndarray, threshold: float = 0.05) -> np.ndarray:
    """model.py:135-152: weighted average cents over argmax +/- 4 bins."""
    t, n = y.shape
    center = y.argmax(axis=1)
    idx = np.clip(center[:, None] + np.arange(-4, 5)[None, :], 0, n - 1)
    sal = y[np.arange(t)[:, None], idx]
    cents = (cent_table[idx] * sal).sum(1) / (sal.sum(1) + 1e-12)
    confident = y.max(axis=1)
    f0 = 10.0 * 2.0 ** (cents / 1200.0)
    f0[confident <= threshold] = 0.0
    return f0


def fcpe_mel(audio16k: jax.Array, n_fft=1024, n_mels=128, hop=160, win=1024,
             fmin=0.0, fmax=8000.0) -> jax.Array:
    """fcpe/nvSTFT log-mel at 16 kHz (same contract as the vocoder nvSTFT)."""
    from ..models.diffusion.vocoder import nv_mel_spectrogram

    return nv_mel_spectrogram(audio16k, 16000, n_fft, n_mels, hop, win, fmin, fmax)


def convert_fcpe_state_dict(sd: dict, n_layers: int = 12) -> dict:
    """torch FCPE ckpt['model'] -> FcpeNet params."""

    def dense(prefix):
        return {
            "kernel": np.transpose(sd[prefix + ".weight"], (1, 0)),
            "bias": sd[prefix + ".bias"],
        }

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    p = {
        "stack0": {
            "kernel": np.transpose(sd["stack.0.weight"], (2, 1, 0)),
            "bias": sd["stack.0.bias"],
        },
        "stack_gn": ln("stack.1"),
        "stack3": {
            "kernel": np.transpose(sd["stack.3.weight"], (2, 1, 0)),
            "bias": sd["stack.3.bias"],
        },
        "norm": ln("norm"),
        "out_v": np.transpose(sd["dense_out.weight_v"], (1, 0)),
        "out_g": sd["dense_out.weight_g"].reshape(-1),
        "out_b": sd["dense_out.bias"],
    }
    for i in range(n_layers):
        pre = f"decoder._layers.{i}."
        p[f"layer_{i}"] = {
            "norm": ln(pre + "norm"),
            "attn": {
                "to_q": dense(pre + "attn.to_q"),
                "to_k": dense(pre + "attn.to_k"),
                "to_v": dense(pre + "attn.to_v"),
                "to_out": dense(pre + "attn.to_out"),
                "projection_matrix": sd[pre + "attn.fast_attention.projection_matrix"],
            },
            "conformer": {
                "norm": ln(pre + "conformer.net.0"),
                "pw1": {
                    "kernel": np.transpose(sd[pre + "conformer.net.2.weight"][:, :, 0], (1, 0)),
                    "bias": sd[pre + "conformer.net.2.bias"],
                },
                "dw_kernel": np.transpose(sd[pre + "conformer.net.4.conv.weight"], (2, 1, 0)),
                "dw_bias": sd[pre + "conformer.net.4.conv.bias"],
                "pw2": {
                    "kernel": np.transpose(sd[pre + "conformer.net.6.weight"][:, :, 0], (1, 0)),
                    "bias": sd[pre + "conformer.net.6.bias"],
                },
            },
        }
    return p


class FcpeF0Predictor(F0Predictor):
    """FCPE predictor (FCPEF0Predictor.py:12-108 contract)."""

    name = "fcpe"

    def __init__(self, *args, weights: dict | None = None, threshold: float = 0.05,
                 f0_min_model: float = 32.70, f0_max_model: float = 1975.5, **kwargs):
        super().__init__(*args, **kwargs)
        if weights is None:
            raise FileNotFoundError(
                "FCPE weights not provided; convert the published fcpe.pt with "
                "sovits_tpu.f0.fcpe.convert_fcpe_state_dict"
            )
        self.threshold = threshold
        self.net = FcpeNet(f0_min=f0_min_model, f0_max=f0_max_model)
        self.variables = jax.tree.map(jnp.asarray, weights)
        self._fn = jax.jit(lambda v, mel: self.net.apply(v, mel))

    def raw_f0(self, wav: np.ndarray, p_len: int) -> np.ndarray:
        wav16 = resample(np.asarray(wav, np.float32), self.sampling_rate, 16000)
        mel = fcpe_mel(jnp.asarray(wav16[None]))
        salience = np.asarray(self._fn(self.variables, mel))[0]
        f0 = cents_local_decoder(salience, self.net.cent_table, self.threshold)
        t_in = np.arange(len(f0)) * 160 / 16000
        t_out = np.arange(p_len) * self.hop_length / self.sampling_rate
        out = np.interp(t_out, t_in, f0)
        uv = np.interp(t_out, t_in, (f0 > 0).astype(np.float64))
        out[uv < 0.5] = 0.0
        return out
