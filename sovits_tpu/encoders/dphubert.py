"""DPHuBERT speech encoder (vencoder/dphubert port).

The DPHuBERT checkpoint is a *pruned* torchaudio-style wav2vec2: per-layer
attention-head counts and feed-forward widths (lists in ckpt['config']),
with whole sublayers possibly removed (components.py:794-858). Deltas from
the fairseq trunk: the final encoder LayerNorm comes AFTER the layers
(post-norm Transformer, components.py:905-906), the even positional conv
trims one trailing frame, and the first extractor conv uses channel
GroupNorm with no conv bias ('group_norm' mode).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class DPHubertEncoder(nn.Module):
    config: dict  # the checkpoint's ckpt['config'] (hashable: pass frozen)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        cfg = self.config
        conv_cfg = cfg["extractor_conv_layer_config"]
        conv_bias = bool(cfg.get("extractor_conv_bias", False))
        d = cfg["encoder_embed_dim"]
        head_dim = cfg.get("encoder_head_dim", 64)

        # feature extractor ('group_norm' mode: GN on layer 0 only)
        x = wav[:, :, None]
        for i, (ch, k, s) in enumerate(conv_cfg):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding="VALID", use_bias=conv_bias,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            if i == 0 and cfg.get("extractor_mode", "group_norm") == "group_norm":
                x = nn.GroupNorm(num_groups=ch, epsilon=1e-5, dtype=self.dtype, name="group_norm")(x)
            x = jax.nn.gelu(x, approximate=False)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="proj_norm")(x)
        x = nn.Dense(d, dtype=self.dtype, name="proj")(x)

        # positional conv (kernel may be even -> trim one frame)
        k = cfg.get("encoder_pos_conv_kernel", 128)
        groups = cfg.get("encoder_pos_conv_groups", 16)
        kshape = (k, d // groups, d)
        v = self.param("pos_kernel", nn.initializers.normal(0.02), kshape)
        g = self.param(
            "pos_g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(nn.initializers.normal(0.02)(key, kshape) ** 2, axis=(1, 2))
            ).reshape(shape),
            (k,),
        )
        kernel = v * (g.reshape(-1, 1, 1) / (jnp.sqrt(jnp.sum(v**2, axis=(1, 2), keepdims=True)) + 1e-12))
        pos_bias = self.param("pos_bias", nn.initializers.zeros, (d,))
        pe = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1,), padding=((k // 2, k // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups,
        ) + pos_bias
        if k % 2 == 0:
            pe = pe[:, : x.shape[1], :]
        x = x + jax.nn.gelu(pe, approximate=False)
        # torchaudio's _get_encoder INVERTS layer_norm_first for the
        # Transformer wrapper (components.py:1283): post-norm configs apply
        # the encoder LN right after the pos conv and skip the final LN.
        post_norm_layers = not cfg.get("encoder_layer_norm_first", False)
        if post_norm_layers:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="encoder_norm")(x)

        n_layers = cfg["encoder_num_layers"]
        use_attn = cfg.get("encoder_use_attention", [True] * n_layers)
        use_ff = cfg.get("encoder_use_feed_forward", [True] * n_layers)
        n_heads = cfg["encoder_num_heads"]
        ff_dims = cfg["encoder_ff_interm_features"]

        for i in range(n_layers):
            if use_attn[i] and n_heads[i] > 0:
                h = n_heads[i]
                inner = h * head_dim
                b, t, _ = x.shape
                q = nn.Dense(inner, dtype=self.dtype, name=f"l{i}_q")(x)
                kk = nn.Dense(inner, dtype=self.dtype, name=f"l{i}_k")(x)
                vv = nn.Dense(inner, dtype=self.dtype, name=f"l{i}_v")(x)
                q = q.reshape(b, t, h, head_dim).transpose(0, 2, 1, 3)
                kk = kk.reshape(b, t, h, head_dim).transpose(0, 2, 1, 3)
                vv = vv.reshape(b, t, h, head_dim).transpose(0, 2, 1, 3)
                w = jax.nn.softmax(
                    jnp.einsum("bhtd,bhsd->bhts", q / math.sqrt(head_dim), kk,
                               preferred_element_type=jnp.float32),
                    axis=-1,
                ).astype(vv.dtype)
                att = jnp.einsum("bhts,bhsd->bhtd", w, vv).transpose(0, 2, 1, 3).reshape(b, t, inner)
                x = x + nn.Dense(d, dtype=self.dtype, name=f"l{i}_out")(att)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_ln1")(x)
            if use_ff[i] and ff_dims[i] > 0:
                hcur = nn.Dense(ff_dims[i], dtype=self.dtype, name=f"l{i}_fc1")(x)
                hcur = jax.nn.gelu(hcur, approximate=False)
                x = x + nn.Dense(d, dtype=self.dtype, name=f"l{i}_fc2")(hcur)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_ln2")(x)
        if not post_norm_layers:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="encoder_norm")(x)
        return x


def convert_dphubert_state_dict(sd: dict, cfg: dict) -> dict:
    def dense(prefix):
        return {"kernel": np.transpose(sd[prefix + ".weight"], (1, 0)), "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    p: dict = {
        "proj_norm": ln("encoder.feature_projection.layer_norm"),
        "proj": dense("encoder.feature_projection.projection"),
        "pos_kernel": np.transpose(
            sd["encoder.transformer.pos_conv_embed.conv.weight_v"], (2, 1, 0)
        ),
        "pos_g": sd["encoder.transformer.pos_conv_embed.conv.weight_g"].reshape(-1),
        "pos_bias": sd["encoder.transformer.pos_conv_embed.conv.bias"],
        "encoder_norm": ln("encoder.transformer.layer_norm"),
    }
    for i in range(len(cfg["extractor_conv_layer_config"])):
        pre = f"feature_extractor.conv_layers.{i}."
        p[f"conv_{i}"] = {"kernel": np.transpose(sd[pre + "conv.weight"], (2, 1, 0))}
        if pre + "conv.bias" in sd:
            p[f"conv_{i}"]["bias"] = sd[pre + "conv.bias"]
        if i == 0 and pre + "layer_norm.weight" in sd:
            p["group_norm"] = ln(pre + "layer_norm")
    n_layers = cfg["encoder_num_layers"]
    use_attn = cfg.get("encoder_use_attention", [True] * n_layers)
    use_ff = cfg.get("encoder_use_feed_forward", [True] * n_layers)
    for i in range(n_layers):
        pre = f"encoder.transformer.layers.{i}."
        if use_attn[i] and cfg["encoder_num_heads"][i] > 0:
            p[f"l{i}_q"] = dense(pre + "attention.q_proj")
            p[f"l{i}_k"] = dense(pre + "attention.k_proj")
            p[f"l{i}_v"] = dense(pre + "attention.v_proj")
            p[f"l{i}_out"] = dense(pre + "attention.out_proj")
        p[f"l{i}_ln1"] = ln(pre + "layer_norm")
        if use_ff[i] and cfg["encoder_ff_interm_features"][i] > 0:
            p[f"l{i}_fc1"] = dense(pre + "feed_forward.intermediate_dense")
            p[f"l{i}_fc2"] = dense(pre + "feed_forward.output_dense")
        p[f"l{i}_ln2"] = ln(pre + "final_layer_norm")
    return p


class DPHubertSpeechEncoder:
    """SpeechEncoder-protocol wrapper (vencoder/DPHubert.py:7-29)."""

    def __init__(self, variables: dict, cfg: dict):
        self.name = "dphubert"
        self.hidden_dim = cfg["encoder_embed_dim"]
        self.net = DPHubertEncoder(cfg)
        self.variables = variables
        self._fn = jax.jit(lambda v, wav: self.net.apply(v, wav))

    def encode(self, wav16k: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav16k, np.float32)
        n_frames = (len(wav) - 400) // 320 + 1
        bucket = int(np.ceil(len(wav) / 16000)) * 16000
        wav = np.pad(wav, (0, bucket - len(wav)))
        out = np.asarray(self._fn(self.variables, jnp.asarray(wav[None])))[0]
        return out[:n_frames]


def load_dphubert_encoder(checkpoint_path: str) -> DPHubertSpeechEncoder:
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    cfg = dict(ckpt["config"])
    cfg.pop("aux_num_out", None)
    sd = {k: v.float().numpy() for k, v in ckpt["state_dict"].items() if hasattr(v, "numpy")}
    params = convert_dphubert_state_dict(sd, cfg)
    return DPHubertSpeechEncoder({"params": jax.tree.map(jnp.asarray, params)}, cfg)
