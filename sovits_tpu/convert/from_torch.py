"""Convert reference (torch) state_dicts into sovits_tpu param trees.

The reference ships/loads ``G_*.pth`` checkpoints (utils.py:155-200); these
converters map each torch module's flat state_dict into the corresponding
flax param subtree so reference-trained weights load into the TPU models.
They are also the bridge used by the parity test-suite.

Input convention: a dict name -> numpy array (a torch ``state_dict`` with
tensors already converted via ``.numpy()``), and a prefix selecting the
submodule.

Layout maps:
- Conv1d       torch (out, in/g, kw)  -> flax kernel (kw, in/g, out)
- ConvT1d      torch (in, out, kw)    -> flax kernel (kw, in, out)
- weight-norm  weight_g (out,1,1)     -> g (out,)   [ConvT: g_in (in,)]
- Dense(1x1)   torch (out, in, 1)     -> kernel (in, out)
- Linear       torch (out, in)        -> kernel (in, out)
- Embedding / LayerNorm: identical values, renamed.
"""

from __future__ import annotations

import numpy as np


def _sub(sd: dict, prefix: str) -> dict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def conv1d(sd: dict, prefix: str = "") -> dict:
    """Plain nn.Conv1d -> Conv1d{kernel, bias}."""
    sd = _sub(sd, prefix)
    out = {"kernel": np.transpose(sd["weight"], (2, 1, 0))}
    if "bias" in sd:
        out["bias"] = sd["bias"]
    return out


def conv1d_wn(sd: dict, prefix: str = "") -> dict:
    """weight_norm'd nn.Conv1d -> Conv1d{kernel, g, bias}."""
    sd = _sub(sd, prefix)
    out = {
        "kernel": np.transpose(sd["weight_v"], (2, 1, 0)),
        "g": sd["weight_g"].reshape(-1),
    }
    if "bias" in sd:
        out["bias"] = sd["bias"]
    return out


def conv1d_maybe_wn(sd: dict, prefix: str = "") -> dict:
    s = _sub(sd, prefix)
    return conv1d_wn(s) if "weight_v" in s else conv1d(s)


def separable_conv1d_wn(sd: dict, prefix: str = "") -> dict:
    """Depthwise_Separable_Conv1D (DSConv.py:5-40) -> SeparableConv1d."""
    return {
        "depth": conv1d_maybe_wn(sd, prefix + "depth_conv."),
        "point": conv1d_maybe_wn(sd, prefix + "point_conv."),
    }


def conv_transpose1d_wn(sd: dict, prefix: str = "") -> dict:
    """weight_norm'd nn.ConvTranspose1d -> ConvTranspose1d{kernel, g_in, bias}."""
    sd = _sub(sd, prefix)
    out = {
        "kernel": np.transpose(sd["weight_v"], (2, 0, 1)),
        "g_in": sd["weight_g"].reshape(-1),
    }
    if "bias" in sd:
        out["bias"] = sd["bias"]
    return out


def dense_from_conv1x1(sd: dict, prefix: str = "") -> dict:
    """1x1 nn.Conv1d -> flax Dense{kernel, bias}."""
    sd = _sub(sd, prefix)
    out = {"kernel": np.transpose(sd["weight"][:, :, 0], (1, 0))}
    if "bias" in sd:
        out["bias"] = sd["bias"]
    return out


def dense(sd: dict, prefix: str = "") -> dict:
    """nn.Linear -> flax Dense{kernel, bias}."""
    sd = _sub(sd, prefix)
    out = {"kernel": np.transpose(sd["weight"], (1, 0))}
    if "bias" in sd:
        out["bias"] = sd["bias"]
    return out


def embedding(sd: dict, prefix: str = "") -> dict:
    return {"embedding": _sub(sd, prefix)["weight"]}


def layer_norm(sd: dict, prefix: str = "") -> dict:
    sd = _sub(sd, prefix)
    return {"scale": sd["gamma"], "bias": sd["beta"]}


def wavenet(sd: dict, prefix: str = "", n_layers: int | None = None, separable: bool = False) -> dict:
    """modules.WN -> WaveNet params (modules/modules.py:73-146)."""
    if n_layers is None:
        n_layers = 1 + max(
            int(k.split(".")[1]) for k in _sub(sd, prefix) if k.startswith("in_layers.")
        )
    out = {}
    if any(k.startswith(prefix + "cond_layer.") for k in sd):
        out["cond"] = conv1d_wn(sd, prefix + "cond_layer.")
    in_conv = separable_conv1d_wn if separable else conv1d_wn
    for i in range(n_layers):
        out[f"in_{i}"] = in_conv(sd, prefix + f"in_layers.{i}.")
        out[f"res_skip_{i}"] = conv1d_wn(sd, prefix + f"res_skip_layers.{i}.")
    return out


def mha(sd: dict, prefix: str = "") -> dict:
    """attentions.MultiHeadAttention -> MultiHeadAttention params."""
    out = {
        "query": dense_from_conv1x1(sd, prefix + "conv_q."),
        "key": dense_from_conv1x1(sd, prefix + "conv_k."),
        "value": dense_from_conv1x1(sd, prefix + "conv_v."),
        "out": dense_from_conv1x1(sd, prefix + "conv_o."),
    }
    s = _sub(sd, prefix)
    if "emb_rel_k" in s:
        out["emb_rel_k"] = s["emb_rel_k"]
        out["emb_rel_v"] = s["emb_rel_v"]
    return out


def ffn(sd: dict, prefix: str = "") -> dict:
    return {
        "conv1": conv1d(sd, prefix + "conv_1."),
        "conv2": conv1d(sd, prefix + "conv_2."),
    }


def attn_encoder(sd: dict, prefix: str = "", n_layers: int | None = None) -> dict:
    """attentions.Encoder -> Encoder params (attentions.py:73-107)."""
    if n_layers is None:
        n_layers = 1 + max(
            int(k.split(".")[1])
            for k in _sub(sd, prefix)
            if k.startswith("attn_layers.")
        )
    out = {}
    for i in range(n_layers):
        out[f"attn_{i}"] = mha(sd, prefix + f"attn_layers.{i}.")
        out[f"norm1_{i}"] = layer_norm(sd, prefix + f"norm_layers_1.{i}.")
        out[f"ffn_{i}"] = ffn(sd, prefix + f"ffn_layers.{i}.")
        out[f"norm2_{i}"] = layer_norm(sd, prefix + f"norm_layers_2.{i}.")
    return out


def attn_fft(sd: dict, prefix: str = "", n_layers: int | None = None) -> dict:
    """attentions.FFT -> FFT params (attentions.py:12-70)."""
    if n_layers is None:
        n_layers = 1 + max(
            int(k.split(".")[1])
            for k in _sub(sd, prefix)
            if k.startswith("self_attn_layers.")
        )
    out = {}
    if any(k.startswith(prefix + "cond_layer.") for k in sd):
        out["cond"] = conv1d_wn(sd, prefix + "cond_layer.")
        out["cond_pre"] = conv1d(sd, prefix + "cond_pre.")
    for i in range(n_layers):
        out[f"attn_{i}"] = mha(sd, prefix + f"self_attn_layers.{i}.")
        out[f"norm0_{i}"] = layer_norm(sd, prefix + f"norm_layers_0.{i}.")
        out[f"ffn_{i}"] = ffn(sd, prefix + f"ffn_layers.{i}.")
        out[f"norm1_{i}"] = layer_norm(sd, prefix + f"norm_layers_1.{i}.")
    return out


def coupling_layer(
    sd: dict, prefix: str = "", transformer: bool = False, shared_inner: bool = False
) -> dict:
    """ResidualCouplingLayer / TransformerCouplingLayer params."""
    out = {
        "pre": conv1d(sd, prefix + "pre."),
        "post": conv1d(sd, prefix + "post."),
    }
    if not shared_inner:
        if transformer:
            out["enc"] = attn_fft(sd, prefix + "enc.")
        else:
            out["enc"] = wavenet(sd, prefix + "enc.")
    return out


def coupling_block(
    sd: dict,
    prefix: str = "",
    n_flows: int = 4,
    transformer: bool = False,
    share_parameter: bool = False,
) -> dict:
    """ResidualCouplingBlock / TransformerCouplingBlock (models.py:15-92).

    Reference stores couplings at flows.{0,2,4,...} (odd slots are Flips).
    """
    out = {}
    for i in range(n_flows):
        out[f"coupling_{i}"] = coupling_layer(
            sd, prefix + f"flows.{2 * i}.", transformer, share_parameter
        )
    if share_parameter:
        if transformer:
            out["shared_enc"] = attn_fft(sd, prefix + "wn.")
        else:
            out["shared_wn"] = wavenet(sd, prefix + "wn.")
    return out
