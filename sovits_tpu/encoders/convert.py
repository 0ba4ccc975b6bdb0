"""Checkpoint converters for speech encoders (torch -> Wav2Vec2Encoder).

Two source formats:
- bshall HuBERT-soft state_dict (the reference's hubertsoft checkpoint,
  vencoder/hubert/hubert_model.py:210-222),
- fairseq HuBERT/ContentVec checkpoints (the reference's vec768l12 /
  vec256l9 / cnhubertlarge, loaded via fairseq in
  vencoder/ContentVec768L12.py:12-15).
"""

from __future__ import annotations

import numpy as np


def _dense(w, b=None):
    out = {"kernel": np.transpose(w, (1, 0))}
    if b is not None:
        out["bias"] = b
    return out


def _ln(w, b):
    return {"scale": w, "bias": b}


def _mha_from_qkvo(qw, qb, kw, kb, vw, vb, ow, ob, n_heads: int):
    """torch per-projection weights -> flax MultiHeadDotProductAttention."""
    d = qw.shape[1]
    head = d // n_heads

    def in_proj(w, b):
        return {
            "kernel": np.transpose(w, (1, 0)).reshape(d, n_heads, head),
            "bias": b.reshape(n_heads, head),
        }

    return {
        "query": in_proj(qw, qb),
        "key": in_proj(kw, kb),
        "value": in_proj(vw, vb),
        "out": {
            "kernel": np.transpose(ow, (1, 0)).reshape(n_heads, head, d),
            "bias": ob,
        },
    }


def _pos_conv(weight_g, weight_v, bias):
    # torch weight_norm dim=2: g (1, 1, kw); v (out, in/g, kw)
    return {
        "kernel": np.transpose(weight_v, (2, 1, 0)),
        "g_k": weight_g.reshape(-1),
        "bias": bias,
    }


def from_bshall_hubert(sd: dict, n_layers: int = 12, n_heads: int = 12) -> dict:
    """bshall HubertSoft state_dict (numpy) -> Wav2Vec2Encoder params."""
    p: dict = {
        "feature_extractor": {
            "group_norm": _ln(sd["feature_extractor.norm0.weight"], sd["feature_extractor.norm0.bias"]),
        },
        "feat_norm": _ln(
            sd["feature_projection.norm.weight"], sd["feature_projection.norm.bias"]
        ),
        "feat_proj": _dense(
            sd["feature_projection.projection.weight"],
            sd["feature_projection.projection.bias"],
        ),
        "pos_conv": _pos_conv(
            sd["positional_embedding.conv.weight_g"],
            sd["positional_embedding.conv.weight_v"],
            sd["positional_embedding.conv.bias"],
        ),
        "encoder_norm": _ln(sd["norm.weight"], sd["norm.bias"]),
    }
    for i in range(7):
        p["feature_extractor"][f"conv_{i}"] = {
            "kernel": np.transpose(sd[f"feature_extractor.conv{i}.weight"], (2, 1, 0))
        }
    for i in range(n_layers):
        pre = f"encoder.layers.{i}."
        in_w = sd[pre + "self_attn.in_proj_weight"]
        in_b = sd[pre + "self_attn.in_proj_bias"]
        d = in_w.shape[1]
        qw, kw, vw = in_w[:d], in_w[d : 2 * d], in_w[2 * d :]
        qb, kb, vb = in_b[:d], in_b[d : 2 * d], in_b[2 * d :]
        p[f"layer_{i}"] = {
            "self_attn": _mha_from_qkvo(
                qw, qb, kw, kb, vw, vb,
                sd[pre + "self_attn.out_proj.weight"],
                sd[pre + "self_attn.out_proj.bias"],
                n_heads,
            ),
            "fc1": _dense(sd[pre + "linear1.weight"], sd[pre + "linear1.bias"]),
            "fc2": _dense(sd[pre + "linear2.weight"], sd[pre + "linear2.bias"]),
            "norm1": _ln(sd[pre + "norm1.weight"], sd[pre + "norm1.bias"]),
            "norm2": _ln(sd[pre + "norm2.weight"], sd[pre + "norm2.bias"]),
        }
    if "proj.weight" in sd:
        p["final_proj"] = _dense(sd["proj.weight"], sd["proj.bias"])
    return p


def from_fairseq_hubert(
    sd: dict, n_layers: int = 12, n_heads: int = 12, final_proj: bool = False
) -> dict:
    """fairseq HuBERT/ContentVec state_dict (numpy) -> Wav2Vec2Encoder params.

    Key layout: feature_extractor.conv_layers.N.0, post_extract_proj,
    encoder.pos_conv.0, encoder.layers.N.{self_attn.*_proj, fc1, fc2,
    self_attn_layer_norm, final_layer_norm}, encoder.layer_norm, final_proj.
    """
    p: dict = {
        "feature_extractor": {
            "group_norm": _ln(
                sd["feature_extractor.conv_layers.0.2.weight"],
                sd["feature_extractor.conv_layers.0.2.bias"],
            ),
        },
        "feat_norm": _ln(sd["layer_norm.weight"], sd["layer_norm.bias"]),
        "feat_proj": _dense(
            sd["post_extract_proj.weight"], sd["post_extract_proj.bias"]
        ),
        "pos_conv": _pos_conv(
            sd["encoder.pos_conv.0.weight_g"],
            sd["encoder.pos_conv.0.weight_v"],
            sd["encoder.pos_conv.0.bias"],
        ),
        "encoder_norm": _ln(
            sd["encoder.layer_norm.weight"], sd["encoder.layer_norm.bias"]
        ),
    }
    n_convs = 1 + max(
        int(k.split(".")[2])
        for k in sd
        if k.startswith("feature_extractor.conv_layers.")
    )
    for i in range(n_convs):
        p["feature_extractor"][f"conv_{i}"] = {
            "kernel": np.transpose(
                sd[f"feature_extractor.conv_layers.{i}.0.weight"], (2, 1, 0)
            )
        }
    for i in range(n_layers):
        pre = f"encoder.layers.{i}."
        p[f"layer_{i}"] = {
            "self_attn": _mha_from_qkvo(
                sd[pre + "self_attn.q_proj.weight"],
                sd[pre + "self_attn.q_proj.bias"],
                sd[pre + "self_attn.k_proj.weight"],
                sd[pre + "self_attn.k_proj.bias"],
                sd[pre + "self_attn.v_proj.weight"],
                sd[pre + "self_attn.v_proj.bias"],
                sd[pre + "self_attn.out_proj.weight"],
                sd[pre + "self_attn.out_proj.bias"],
                n_heads,
            ),
            "fc1": _dense(sd[pre + "fc1.weight"], sd[pre + "fc1.bias"]),
            "fc2": _dense(sd[pre + "fc2.weight"], sd[pre + "fc2.bias"]),
            "norm1": _ln(
                sd[pre + "self_attn_layer_norm.weight"],
                sd[pre + "self_attn_layer_norm.bias"],
            ),
            "norm2": _ln(
                sd[pre + "final_layer_norm.weight"],
                sd[pre + "final_layer_norm.bias"],
            ),
        }
    if final_proj and "final_proj.weight" in sd:
        p["final_proj"] = _dense(sd["final_proj.weight"], sd["final_proj.bias"])
    return p
