"""Fairseq/ContentVec converter verification (VERDICT r1 #4).

fairseq itself is not installed, so the oracle is a torch reconstruction of
fairseq's HuBERT extract_features path (hubert_base, layer_norm_first=False)
built directly from the same state dict the converter consumes:
conv extractor (group-norm layer 0, exact GELU, no bias) -> layer_norm ->
post_extract_proj -> +pos_conv (grouped, weight-normed, SamePad trim, GELU)
-> encoder.layer_norm -> N post-LN transformer layers [-> final_proj].
Ref: /root/reference/vencoder/ContentVec768L12.py:7-37 (fairseq
extract_features(output_layer=12)).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests.fairseq_fixture import make_fairseq_hubert_sd

from sovits_tpu.encoders.convert import from_fairseq_hubert
from sovits_tpu.encoders.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

CONV_SPECS_TINY = [  # same strides/kernels as hubert_base, narrower
    (64, 1, 10),
    (64, 64, 3),
    (64, 64, 3),
    (64, 64, 3),
    (64, 64, 3),
    (64, 64, 2),
    (64, 64, 2),
]


def torch_fairseq_forward(sd, wav, n_layers, n_heads, output_layer, final_proj):
    """Reconstruction of fairseq HubertModel.extract_features (inference)."""
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.from_numpy(wav)[None, None, :]  # [B, 1, L]
    n_convs = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("feature_extractor.conv_layers.")
    )
    for i in range(n_convs):
        w = t[f"feature_extractor.conv_layers.{i}.0.weight"]
        stride = 5 if i == 0 else (3 if w.shape[2] == 3 else 2)
        # strides actually come from the spec: k=10 -> s=5, k=3 -> s=2, k=2 -> s=2
        stride = {10: 5, 3: 2, 2: 2}[w.shape[2]]
        x = F.conv1d(x, w, stride=stride)
        if i == 0:
            x = F.group_norm(
                x,
                num_groups=w.shape[0],
                weight=t["feature_extractor.conv_layers.0.2.weight"],
                bias=t["feature_extractor.conv_layers.0.2.bias"],
            )
        x = F.gelu(x)
    x = x.transpose(1, 2)  # [B, T, 512]
    x = F.layer_norm(x, (x.shape[-1],), t["layer_norm.weight"], t["layer_norm.bias"])
    x = F.linear(x, t["post_extract_proj.weight"], t["post_extract_proj.bias"])

    # pos_conv: weight_norm dim=2, grouped, SamePad removes last (even k)
    g = t["encoder.pos_conv.0.weight_g"]
    v = t["encoder.pos_conv.0.weight_v"]
    w = v * (g / v.norm(dim=(0, 1), keepdim=True))
    k = w.shape[2]
    groups = v.shape[0] // v.shape[1]
    pc = F.conv1d(
        x.transpose(1, 2), w, t["encoder.pos_conv.0.bias"],
        padding=k // 2, groups=groups,
    )
    if k % 2 == 0:
        pc = pc[:, :, :-1]
    x = x + F.gelu(pc).transpose(1, 2)
    x = F.layer_norm(
        x, (x.shape[-1],), t["encoder.layer_norm.weight"], t["encoder.layer_norm.bias"]
    )

    d = x.shape[-1]
    head = d // n_heads
    for i in range(output_layer):
        pre = f"encoder.layers.{i}."
        q = F.linear(x, t[pre + "self_attn.q_proj.weight"], t[pre + "self_attn.q_proj.bias"])
        kk = F.linear(x, t[pre + "self_attn.k_proj.weight"], t[pre + "self_attn.k_proj.bias"])
        vv = F.linear(x, t[pre + "self_attn.v_proj.weight"], t[pre + "self_attn.v_proj.bias"])

        def split(z):
            return z.view(1, -1, n_heads, head).transpose(1, 2)

        attn = torch.softmax(split(q) @ split(kk).transpose(-1, -2) / head**0.5, dim=-1)
        h = (attn @ split(vv)).transpose(1, 2).reshape(1, -1, d)
        h = F.linear(h, t[pre + "self_attn.out_proj.weight"], t[pre + "self_attn.out_proj.bias"])
        x = F.layer_norm(
            x + h, (d,), t[pre + "self_attn_layer_norm.weight"], t[pre + "self_attn_layer_norm.bias"]
        )
        h = F.gelu(F.linear(x, t[pre + "fc1.weight"], t[pre + "fc1.bias"]))
        h = F.linear(h, t[pre + "fc2.weight"], t[pre + "fc2.bias"])
        x = F.layer_norm(
            x + h, (d,), t[pre + "final_layer_norm.weight"], t[pre + "final_layer_norm.bias"]
        )
    if final_proj:
        x = F.linear(x, t["final_proj.weight"], t["final_proj.bias"])
    return x.detach().numpy()[0]


@pytest.mark.parametrize(
    "name,output_layer,final_proj",
    [("vec768l12-tiny", 4, False), ("vec256l9-tiny", 3, True)],
)
def test_fairseq_converter_parity(name, output_layer, final_proj):
    d_model, n_layers, n_heads, ffn = 96, 4, 4, 192
    sd = make_fairseq_hubert_sd(
        d_model=d_model, n_layers=n_layers, ffn_dim=ffn,
        conv_specs=CONV_SPECS_TINY, pos_conv_kernel=16, pos_conv_groups=4,
        final_proj_dim=48 if final_proj else None, seed=3, scale=0.08,
    )
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(4000) * 0.1).astype(np.float32)

    ref = torch_fairseq_forward(sd, wav, n_layers, n_heads, output_layer, final_proj)

    cfg = Wav2Vec2Config(
        d_model=d_model, n_layers=n_layers, n_heads=n_heads, ffn_dim=ffn,
        conv_layers=tuple((c, k, {10: 5, 3: 2, 2: 2}[k]) for c, _i, k in CONV_SPECS_TINY),
        output_layer=output_layer,
        final_proj_dim=48 if final_proj else None,
        pos_conv_kernel=16, pos_conv_groups=4,
    )
    params = from_fairseq_hubert(sd, output_layer, n_heads, final_proj=final_proj)
    net = Wav2Vec2Encoder(cfg)
    got = np.asarray(net.apply({"params": jax.tree.map(jnp.asarray, params)}, wav[None]))[0]

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fairseq_full_size_loads_through_factory(tmp_path):
    """The CLI path: torch.save'd fairseq ckpt -> get_speech_encoder."""
    from tests.fairseq_fixture import save_as_torch_ckpt

    from sovits_tpu.encoders import get_speech_encoder

    sd = make_fairseq_hubert_sd(final_proj_dim=256)
    path = tmp_path / "fixture.pt"
    save_as_torch_ckpt(sd, str(path))
    enc = get_speech_encoder("vec768l12", str(path))
    wav = np.zeros(8000, np.float32)
    out = enc.encode(wav)
    assert out.shape == ((8000 - 400) // 320 + 1, 768)
    assert np.isfinite(out).all()
