"""Synthetic fairseq-layout HuBERT/ContentVec checkpoints for converter tests.

The reference loads ContentVec via fairseq (vencoder/ContentVec768L12.py:12-15);
fairseq is not installed here, so these fixtures replicate the exact key
names/shapes of a fairseq HuBERT state dict (hubert_base spec: 7-layer conv
extractor 512ch, 12x768 post-norm transformer, grouped pos_conv k=128 g=16)
so `from_fairseq_hubert` key mapping is exercised against a real layout.
"""

from __future__ import annotations

import numpy as np

# (out, in, kernel) per conv layer, hubert_base feature extractor
HUBERT_BASE_CONVS = [
    (512, 1, 10),
    (512, 512, 3),
    (512, 512, 3),
    (512, 512, 3),
    (512, 512, 3),
    (512, 512, 2),
    (512, 512, 2),
]


def make_fairseq_hubert_sd(
    d_model: int = 768,
    n_layers: int = 12,
    ffn_dim: int = 3072,
    conv_specs=None,
    pos_conv_kernel: int = 128,
    pos_conv_groups: int = 16,
    final_proj_dim: int | None = None,
    seed: int = 0,
    scale: float = 0.05,
) -> dict[str, np.ndarray]:
    """Random numpy state dict with fairseq HuBERT key layout."""
    rng = np.random.default_rng(seed)
    conv_specs = conv_specs or HUBERT_BASE_CONVS

    def r(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    sd: dict[str, np.ndarray] = {}
    for i, (out, inp, k) in enumerate(conv_specs):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = r(out, inp, k)
    # group norm only on layer 0 (fairseq conv_layers.0.2 = Fp32GroupNorm)
    sd["feature_extractor.conv_layers.0.2.weight"] = 1.0 + r(conv_specs[0][0]) * 0.1
    sd["feature_extractor.conv_layers.0.2.bias"] = r(conv_specs[0][0])

    feat_dim = conv_specs[-1][0]
    sd["layer_norm.weight"] = 1.0 + r(feat_dim) * 0.1
    sd["layer_norm.bias"] = r(feat_dim)
    sd["post_extract_proj.weight"] = r(d_model, feat_dim)
    sd["post_extract_proj.bias"] = r(d_model)

    # pos_conv: torch weight_norm(conv, dim=2) over (out, in/groups, kw)
    sd["encoder.pos_conv.0.weight_g"] = np.abs(
        1.0 + r(1, 1, pos_conv_kernel) * 0.1
    ).astype(np.float32)
    sd["encoder.pos_conv.0.weight_v"] = r(
        d_model, d_model // pos_conv_groups, pos_conv_kernel
    )
    sd["encoder.pos_conv.0.bias"] = r(d_model)

    for i in range(n_layers):
        pre = f"encoder.layers.{i}."
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[pre + f"self_attn.{proj}.weight"] = r(d_model, d_model)
            sd[pre + f"self_attn.{proj}.bias"] = r(d_model)
        sd[pre + "fc1.weight"] = r(ffn_dim, d_model)
        sd[pre + "fc1.bias"] = r(ffn_dim)
        sd[pre + "fc2.weight"] = r(d_model, ffn_dim)
        sd[pre + "fc2.bias"] = r(d_model)
        sd[pre + "self_attn_layer_norm.weight"] = 1.0 + r(d_model) * 0.1
        sd[pre + "self_attn_layer_norm.bias"] = r(d_model)
        sd[pre + "final_layer_norm.weight"] = 1.0 + r(d_model) * 0.1
        sd[pre + "final_layer_norm.bias"] = r(d_model)

    sd["encoder.layer_norm.weight"] = 1.0 + r(d_model) * 0.1
    sd["encoder.layer_norm.bias"] = r(d_model)
    if final_proj_dim:
        sd["final_proj.weight"] = r(final_proj_dim, d_model)
        sd["final_proj.bias"] = r(final_proj_dim)
    # keys fairseq has that the converter must ignore
    sd["label_embs_concat"] = r(504, 256)
    sd["mask_emb"] = r(d_model)
    return sd


def save_as_torch_ckpt(sd: dict, path: str) -> None:
    """Write in fairseq's on-disk layout: {'model': state_dict} of tensors."""
    import torch

    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, path)
