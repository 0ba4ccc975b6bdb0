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


def resblock(sd: dict, prefix: str = "", n: int = 3, two_stage: bool = True) -> dict:
    """ResBlock1 (convs1+convs2) or ResBlock2 (convs) -> ResBlock params."""
    out = {}
    if two_stage:
        for j in range(n):
            out[f"conv1_{j}"] = conv1d_maybe_wn(sd, prefix + f"convs1.{j}.")
            out[f"conv2_{j}"] = conv1d_maybe_wn(sd, prefix + f"convs2.{j}.")
    else:
        for j in range(n):
            out[f"conv_{j}"] = conv1d_maybe_wn(sd, prefix + f"convs.{j}.")
    return out


def _source_module(sd: dict, prefix: str) -> dict:
    """SourceModuleHnNSF.l_linear -> fused merge params."""
    d = dense(sd, prefix + "l_linear.")
    return {"merge_kernel": d["kernel"], "merge_bias": d["bias"]}


def nsf_hifigan_generator(
    sd: dict,
    prefix: str = "",
    n_upsamples: int = 5,
    n_kernels: int = 3,
    resblock_type: str = "1",
    n_dilations: int = 3,
) -> dict:
    """vdecoder/hifigan Generator state_dict -> Generator params."""
    out = {
        "conv_pre": conv1d_wn(sd, prefix + "conv_pre."),
        "conv_post": conv1d_wn(sd, prefix + "conv_post."),
        "m_source": _source_module(sd, prefix + "m_source."),
    }
    if any(k.startswith(prefix + "cond.") for k in sd):
        out["cond"] = conv1d(sd, prefix + "cond.")
    for i in range(n_upsamples):
        out[f"up_{i}"] = conv_transpose1d_wn(sd, prefix + f"ups.{i}.")
        out[f"noise_conv_{i}"] = conv1d(sd, prefix + f"noise_convs.{i}.")
        for j in range(n_kernels):
            out[f"resblock_{i}_{j}"] = resblock(
                sd,
                prefix + f"resblocks.{i * n_kernels + j}.",
                n=n_dilations if resblock_type == "1" else 2,
                two_stage=resblock_type == "1",
            )
    return out


def conv2d_wn(sd: dict, prefix: str = "") -> dict:
    """weight_norm'd nn.Conv2d -> Conv2d{kernel, g, bias}.

    torch (out, in, kh, kw) -> flax (kh, kw, in, out).
    """
    sd = _sub(sd, prefix)
    out = {
        "kernel": np.transpose(sd["weight_v"], (2, 3, 1, 0)),
        "g": sd["weight_g"].reshape(-1),
    }
    if "bias" in sd:
        out["bias"] = sd["bias"]
    return out


def conv1d_sn(sd: dict, prefix: str = "") -> tuple[dict, dict]:
    """spectral_norm'd nn.Conv1d -> (params{kernel,bias}, spectral{u,v})."""
    sd = _sub(sd, prefix)
    params = {"kernel": np.transpose(sd["weight_orig"], (2, 1, 0))}
    if "bias" in sd:
        params["bias"] = sd["bias"]
    return params, {"u": sd["weight_u"], "v": sd["weight_v"]}


def conv2d_sn(sd: dict, prefix: str = "") -> tuple[dict, dict]:
    """spectral_norm'd nn.Conv2d -> (params{kernel,bias}, spectral{u,v})."""
    sd = _sub(sd, prefix)
    params = {"kernel": np.transpose(sd["weight_orig"], (2, 3, 1, 0))}
    if "bias" in sd:
        params["bias"] = sd["bias"]
    return params, {"u": sd["weight_u"], "v": sd["weight_v"]}


def discriminator_p(sd: dict, prefix: str = "") -> dict:
    out = {f"conv_{i}": conv2d_wn(sd, prefix + f"convs.{i}.") for i in range(5)}
    out["conv_post"] = conv2d_wn(sd, prefix + "conv_post.")
    return out


def discriminator_s(sd: dict, prefix: str = "") -> dict:
    out = {f"conv_{i}": conv1d_wn(sd, prefix + f"convs.{i}.") for i in range(6)}
    out["conv_post"] = conv1d_wn(sd, prefix + "conv_post.")
    return out


def multi_period_discriminator(sd: dict, prefix: str = "", periods=(2, 3, 5, 7, 11)) -> dict:
    """models.MultiPeriodDiscriminator (models.py:230-252): slot 0 is the
    scale disc, slots 1..5 the period discs."""
    out = {"disc_s": discriminator_s(sd, prefix + "discriminators.0.")}
    for i, p in enumerate(periods):
        out[f"disc_p{p}"] = discriminator_p(sd, prefix + f"discriminators.{i + 1}.")
    return out


def multi_period_discriminator_spectral(
    sd: dict, prefix: str = "", periods=(2, 3, 5, 7, 11)
) -> dict:
    """use_spectral_norm=True variant (models.py:168,203): returns full
    variables {params, spectral} with the torch power-iteration state."""
    params: dict = {"disc_s": {}}
    spectral: dict = {"disc_s": {}}

    def put(tree_p, tree_s, name, pair):
        tree_p[name], tree_s[name] = pair

    for i in range(6):
        put(params["disc_s"], spectral["disc_s"], f"conv_{i}",
            conv1d_sn(sd, prefix + f"discriminators.0.convs.{i}."))
    put(params["disc_s"], spectral["disc_s"], "conv_post",
        conv1d_sn(sd, prefix + "discriminators.0.conv_post."))
    for i, p in enumerate(periods):
        params[f"disc_p{p}"], spectral[f"disc_p{p}"] = {}, {}
        for j in range(5):
            put(params[f"disc_p{p}"], spectral[f"disc_p{p}"], f"conv_{j}",
                conv2d_sn(sd, prefix + f"discriminators.{i + 1}.convs.{j}."))
        put(params[f"disc_p{p}"], spectral[f"disc_p{p}"], "conv_post",
            conv2d_sn(sd, prefix + f"discriminators.{i + 1}.conv_post."))
    return {"params": params, "spectral": spectral}


def synthesizer(
    sd: dict,
    prefix: str = "",
    n_flows: int = 4,
    use_transformer_flow: bool = False,
    flow_share_parameter: bool = False,
    use_automatic_f0_prediction: bool = True,
    vol_embedding: bool = False,
    n_upsamples: int = 5,
    n_resblock_kernels: int = 3,
    resblock_type: str = "1",
) -> dict:
    """models.SynthesizerTrn state_dict -> Synthesizer params (models.py:339-533)."""
    out = {
        "emb_g": embedding(sd, prefix + "emb_g."),
        "emb_uv": embedding(sd, prefix + "emb_uv."),
        "pre": conv1d(sd, prefix + "pre."),
        "enc_p": {
            "f0_emb": embedding(sd, prefix + "enc_p.f0_emb."),
            "enc": attn_encoder(sd, prefix + "enc_p.enc_."),
            "proj": conv1d(sd, prefix + "enc_p.proj."),
        },
        "enc_q": {
            "pre": conv1d(sd, prefix + "enc_q.pre."),
            "enc": wavenet(sd, prefix + "enc_q.enc."),
            "proj": conv1d(sd, prefix + "enc_q.proj."),
        },
        "flow": coupling_block(
            sd,
            prefix + "flow.",
            n_flows=n_flows,
            transformer=use_transformer_flow,
            share_parameter=flow_share_parameter,
        ),
        "dec": nsf_hifigan_generator(
            sd,
            prefix + "dec.",
            n_upsamples=n_upsamples,
            n_kernels=n_resblock_kernels,
            resblock_type=resblock_type,
        ),
    }
    if vol_embedding:
        out["emb_vol"] = dense(sd, prefix + "emb_vol.")
    if use_automatic_f0_prediction:
        out["f0_decoder"] = {
            "prenet": conv1d(sd, prefix + "f0_decoder.prenet."),
            "decoder": attn_fft(sd, prefix + "f0_decoder.decoder."),
            "proj": conv1d(sd, prefix + "f0_decoder.proj."),
            "f0_prenet": conv1d(sd, prefix + "f0_decoder.f0_prenet."),
            "cond": conv1d(sd, prefix + "f0_decoder.cond."),
        }
    return out


def diffusion_wavenet(sd: dict, prefix: str = "", n_layers: int = 20) -> dict:
    """diffusion/wavenet.py WaveNet -> DiffusionWaveNet params."""
    out = {
        "input_projection": conv1d(sd, prefix + "input_projection."),
        "mlp1": dense(sd, prefix + "mlp.0."),
        "mlp2": dense(sd, prefix + "mlp.2."),
        "skip_projection": conv1d(sd, prefix + "skip_projection."),
        "output_projection": conv1d(sd, prefix + "output_projection."),
    }
    for i in range(n_layers):
        p = prefix + f"residual_layers.{i}."
        out[f"layer_{i}"] = {
            "dilated_conv": conv1d(sd, p + "dilated_conv."),
            "diffusion_projection": dense(sd, p + "diffusion_projection."),
            "conditioner_projection": conv1d(sd, p + "conditioner_projection."),
            "output_projection": conv1d(sd, p + "output_projection."),
        }
    return out


def unit2mel(sd: dict, prefix: str = "", n_layers: int = 20) -> dict:
    """diffusion/unit2mel.py Unit2Mel -> Unit2Mel params."""
    out = {
        "unit_embed": dense(sd, prefix + "unit_embed."),
        "f0_embed": dense(sd, prefix + "f0_embed."),
        "volume_embed": dense(sd, prefix + "volume_embed."),
        "denoiser": diffusion_wavenet(sd, prefix + "decoder.denoise_fn.", n_layers),
    }
    if prefix + "spk_embed.weight" in sd:
        out["spk_embed"] = embedding(sd, prefix + "spk_embed.")
    if prefix + "aug_shift_embed.weight" in sd:
        out["aug_shift_embed"] = {
            "kernel": np.transpose(sd[prefix + "aug_shift_embed.weight"], (1, 0))
        }
    return out


def _snake_act(sd: dict, prefix: str) -> dict:
    return {"act": {"alpha": sd[prefix + "act.alpha"], "beta": sd[prefix + "act.beta"]}}


def snake_resblock(sd: dict, prefix: str = "", n: int = 3, two_stage: bool = True) -> dict:
    """hifiganwithsnake ResBlock1/2 (models.py:36-110) -> SnakeResBlock params."""
    out = {}
    if two_stage:
        for j in range(n):
            out[f"conv1_{j}"] = conv1d_maybe_wn(sd, prefix + f"convs1.{j}.")
            out[f"conv2_{j}"] = conv1d_maybe_wn(sd, prefix + f"convs2.{j}.")
            out[f"act1_{j}"] = _snake_act(sd, prefix + f"activations.{2 * j}.")
            out[f"act2_{j}"] = _snake_act(sd, prefix + f"activations.{2 * j + 1}.")
    else:
        for j in range(n):
            out[f"conv_{j}"] = conv1d_maybe_wn(sd, prefix + f"convs.{j}.")
            out[f"act_{j}"] = _snake_act(sd, prefix + f"activations.{j}.")
    return out


def snake_hifigan_generator(
    sd: dict,
    prefix: str = "",
    n_upsamples: int = 5,
    n_kernels: int = 3,
    resblock_type: str = "1",
    n_dilations: int = 3,
) -> dict:
    """hifiganwithsnake Generator (models.py:338-416) -> SnakeGenerator params."""
    out = {
        "conv_pre": conv1d_wn(sd, prefix + "conv_pre."),
        "conv_post": conv1d_wn(sd, prefix + "conv_post."),
        "m_source": _source_module(sd, prefix + "m_source."),
        "snake_post": _snake_act(sd, prefix + "snake_post."),
    }
    if any(k.startswith(prefix + "cond.") for k in sd):
        out["cond"] = conv1d(sd, prefix + "cond.")
    for i in range(n_upsamples):
        out[f"up_{i}"] = conv_transpose1d_wn(sd, prefix + f"ups.{i}.")
        out[f"noise_conv_{i}"] = conv1d(sd, prefix + f"noise_convs.{i}.")
        out[f"snake_{i}"] = _snake_act(sd, prefix + f"snakes.{i}.")
        for j in range(n_kernels):
            out[f"resblock_{i}_{j}"] = snake_resblock(
                sd,
                prefix + f"resblocks.{i * n_kernels + j}.",
                n=n_dilations if resblock_type == "1" else 2,
                two_stage=resblock_type == "1",
            )
    return out
