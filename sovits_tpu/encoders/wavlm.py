"""WavLM speech encoder (vencoder/wavlm/WavLM.py port).

Same trunk as the wav2vec2 family plus WavLM's gated relative position
bias: layer 0 owns a T5-style bucketed bias table (modules.py:418-456);
every layer applies a query-dependent gate to the shared bias
(modules.py:520-535: gate_a*(gate_b*grep_a - 1) + 2, scaled bias added to
the attention logits). Post-norm layers, GELU FFN; the encoder LayerNorm is
applied after the positional conv (WavLM.py:577-583).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .wav2vec2 import ConvFeatureExtractor, PositionalConvEmbedding, Wav2Vec2Config


@dataclasses.dataclass(frozen=True)
class WavLMDims:
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    num_buckets: int = 320
    max_distance: int = 800
    normalize_input: bool = False


def relative_position_buckets(length: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5 bucket indices [T, T] (modules.py:418-443, bidirectional)."""
    context = np.arange(length)[:, None]
    memory = np.arange(length)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


class WavLMAttention(nn.Module):
    d_model: int
    n_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, position_bias: jax.Array) -> jax.Array:
        """x [B, T, D]; position_bias [H, T, T] (shared, from layer 0)."""
        d, h = self.d_model, self.n_heads
        head = d // h
        b, t, _ = x.shape
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        qh = q.reshape(b, t, h, head).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t, h, head).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, h, head).transpose(0, 2, 1, 3)

        # gated relative position bias (modules.py:520-535)
        grep = nn.Dense(8, dtype=self.dtype, name="grep_linear")(qh)  # [B,H,T,8]
        gates = jax.nn.sigmoid(grep.reshape(b, h, t, 2, 4).sum(-1))
        gate_a, gate_b = gates[..., 0], gates[..., 1]  # [B, H, T]
        grep_a = self.param("grep_a", nn.initializers.ones, (1, h, 1, 1))
        gate_a_1 = gate_a * (gate_b * grep_a[:, :, :, 0] - 1.0) + 2.0  # [B,H,T]
        bias = gate_a_1[..., None] * position_bias[None]  # [B, H, T, T]

        logits = jnp.einsum(
            "bhtd,bhsd->bhts", qh / math.sqrt(head), kh, preferred_element_type=jnp.float32
        ) + bias.astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", w, vh).transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class WavLMLayer(nn.Module):
    dims: WavLMDims
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, position_bias: jax.Array) -> jax.Array:
        d = self.dims
        h = WavLMAttention(d.d_model, d.n_heads, dtype=self.dtype, name="self_attn")(
            x, position_bias
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_layer_norm")(x + h)
        h = nn.Dense(d.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(d.d_model, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x + h)


class WavLMEncoder(nn.Module):
    dims: WavLMDims = WavLMDims()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        d = self.dims
        cfg = Wav2Vec2Config(d_model=d.d_model, n_layers=d.n_layers, n_heads=d.n_heads, ffn_dim=d.ffn_dim)
        x = ConvFeatureExtractor(cfg, dtype=self.dtype, name="feature_extractor")(wav)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="feat_norm")(x)
        x = nn.Dense(d.d_model, dtype=self.dtype, name="feat_proj")(x)
        x = x + PositionalConvEmbedding(cfg, dtype=self.dtype, name="pos_conv")(x)
        # post-norm models apply the encoder LN right after pos conv
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="encoder_norm")(x)

        t = x.shape[1]
        buckets = jnp.asarray(
            relative_position_buckets(t, d.num_buckets, d.max_distance)
        )
        bias_table = self.param(
            "rel_attn_bias",
            nn.initializers.normal(0.02),
            (d.num_buckets, d.n_heads),
        )
        position_bias = bias_table[buckets].transpose(2, 0, 1)  # [H, T, T]

        for i in range(d.n_layers):
            x = WavLMLayer(d, dtype=self.dtype, name=f"layer_{i}")(x, position_bias)
        return x


def convert_wavlm_state_dict(sd: dict, dims: WavLMDims) -> dict:
    """WavLM checkpoint 'model' dict -> WavLMEncoder params."""
    from .convert import _dense, _ln, _pos_conv

    p: dict = {
        "feature_extractor": {
            "group_norm": _ln(
                sd["feature_extractor.conv_layers.0.2.weight"],
                sd["feature_extractor.conv_layers.0.2.bias"],
            )
        },
        "feat_norm": _ln(sd["layer_norm.weight"], sd["layer_norm.bias"]),
        "feat_proj": _dense(sd["post_extract_proj.weight"], sd["post_extract_proj.bias"]),
        "pos_conv": _pos_conv(
            sd["encoder.pos_conv.0.weight_g"],
            sd["encoder.pos_conv.0.weight_v"],
            sd["encoder.pos_conv.0.bias"],
        ),
        "encoder_norm": _ln(sd["encoder.layer_norm.weight"], sd["encoder.layer_norm.bias"]),
        "rel_attn_bias": sd["encoder.layers.0.self_attn.relative_attention_bias.weight"],
    }
    n_convs = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("feature_extractor.conv_layers.")
    )
    for i in range(n_convs):
        p["feature_extractor"][f"conv_{i}"] = {
            "kernel": np.transpose(sd[f"feature_extractor.conv_layers.{i}.0.weight"], (2, 1, 0))
        }
    for i in range(dims.n_layers):
        pre = f"encoder.layers.{i}."
        p[f"layer_{i}"] = {
            "self_attn": {
                "q_proj": _dense(sd[pre + "self_attn.q_proj.weight"], sd[pre + "self_attn.q_proj.bias"]),
                "k_proj": _dense(sd[pre + "self_attn.k_proj.weight"], sd[pre + "self_attn.k_proj.bias"]),
                "v_proj": _dense(sd[pre + "self_attn.v_proj.weight"], sd[pre + "self_attn.v_proj.bias"]),
                "out_proj": _dense(sd[pre + "self_attn.out_proj.weight"], sd[pre + "self_attn.out_proj.bias"]),
                "grep_linear": _dense(
                    sd[pre + "self_attn.grep_linear.weight"], sd[pre + "self_attn.grep_linear.bias"]
                ),
                "grep_a": sd[pre + "self_attn.grep_a"],
            },
            "self_attn_layer_norm": _ln(
                sd[pre + "self_attn_layer_norm.weight"], sd[pre + "self_attn_layer_norm.bias"]
            ),
            "fc1": _dense(sd[pre + "fc1.weight"], sd[pre + "fc1.bias"]),
            "fc2": _dense(sd[pre + "fc2.weight"], sd[pre + "fc2.bias"]),
            "final_layer_norm": _ln(
                sd[pre + "final_layer_norm.weight"], sd[pre + "final_layer_norm.bias"]
            ),
        }
    return p


class WavLMSpeechEncoder:
    """SpeechEncoder-protocol wrapper (vencoder/WavLMBasePlus.py:22-32)."""

    def __init__(self, variables: dict, dims: WavLMDims):
        self.name = "wavlmbase+"
        self.hidden_dim = dims.d_model
        self.dims = dims
        self.net = WavLMEncoder(dims)
        self.variables = variables
        self._fn = jax.jit(lambda v, wav: self.net.apply(v, wav))

    def encode(self, wav16k: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav16k, np.float32)
        if self.dims.normalize_input:
            wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)
        n_frames = (len(wav) - 400) // 320 + 1
        bucket = int(np.ceil(len(wav) / 16000)) * 16000
        wav = np.pad(wav, (0, bucket - len(wav)))
        out = np.asarray(self._fn(self.variables, jnp.asarray(wav[None])))[0]
        return out[:n_frames]


def load_wavlm_encoder(checkpoint_path: str) -> WavLMSpeechEncoder:
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    cfg = ckpt.get("cfg", {})
    dims = WavLMDims(
        d_model=cfg.get("encoder_embed_dim", 768),
        n_layers=cfg.get("encoder_layers", 12),
        n_heads=cfg.get("encoder_attention_heads", 12),
        ffn_dim=cfg.get("encoder_ffn_embed_dim", 3072),
        num_buckets=cfg.get("num_buckets", 320),
        max_distance=cfg.get("max_distance", 800),
        normalize_input=cfg.get("normalize", False),
    )
    sd = {k: v.float().numpy() for k, v in ckpt["model"].items() if hasattr(v, "numpy")}
    params = convert_wavlm_state_dict(sd, dims)
    return WavLMSpeechEncoder({"params": jax.tree.map(jnp.asarray, params)}, dims)
