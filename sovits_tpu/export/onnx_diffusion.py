"""Diffusion ONNX export: the four MoeSS artifacts, self-contained.

The reference ships a torch-traced diffusion ONNX bundle
(diffusion/onnx_export.py:135-235, diffusion/diffusion_onnx.py:482-570):

- ``{name}_encoder.onnx``  (hubert, mel2ph, f0, volume, spk_mix) -> the
  Unit2Mel condition track ``mel_pred`` [B, n_hidden, T]
- ``{name}_denoise.onnx``  (noise [1,1,M,T], time int64 [1],
  condition [1,H,T]) -> ``noise_pred`` (the WaveNet denoiser)
- ``{name}_pred.onnx``     (noise, noise_pred, time, time_prev) ->
  ``noise_pred_o`` (the PLMS x-prediction arithmetic with the
  alphas_cumprod table baked in, diffusion_onnx.py:473-480)
- ``{name}_after.onnx``    x [1,1,M,T] -> ``mel_out`` [1,M,T]
  (denormalize, diffusion_onnx.py:170-183)

MoeSS drives the PLMS loop runtime-side (predict_stage0-3 arithmetic on
the noise history, diffusion_onnx.py:67-88); tests/test_onnx_diffusion.py
replays that exact loop through these graphs and pins it against the JAX
``DiffusionSchedule.sample_plms``. Emission uses the same from-scratch
protobuf writer as the synthesizer export (onnx_proto.py); no ``onnx``
package is required.
"""

from __future__ import annotations

import numpy as np

from . import onnx_proto as P
from .onnx_graph import GraphBuilder


def _dense(g: GraphBuilder, x, params, hint):
    """flax Dense (kernel [in, out]) as MatMul + Add."""
    y = g.matmul(x, g.init(np.asarray(params["kernel"], np.float32), hint + "_w"))
    return g.add(y, g.init(np.asarray(params["bias"], np.float32), hint + "_b"))


def _conv_w(params):
    """flax Conv1d kernel [k, Ci, Co] -> ONNX [Co, Ci, k]."""
    return np.transpose(np.asarray(params["kernel"], np.float32), (2, 1, 0))


def build_encoder_onnx(params: dict, model) -> bytes:
    """Unit2Mel conditioning track (onnx_export.py:84-107 contract).

    Inputs (batch 1): hubert [1, Tu, C], mel2ph [1, T] int64 (1-based; 0
    hits the zero pad frame), f0 [1, T], volume [1, T], and — when
    n_spk > 1 — a per-frame ``spk_mix`` [T, n_spk] (CharaMix). Output
    ``mel_pred`` [1, n_hidden, T].
    """
    g = GraphBuilder("sovits_tpu_diffusion_encoder")
    n_spk = model.n_spk or 1
    hubert = g.input("hubert", [1, "Tu", model.input_channel])
    mel2ph = g.input("mel2ph", [1, "T"], P.DT_INT64)
    f0 = g.input("f0", [1, "T"])
    volume = g.input("volume", [1, "T"])

    # units[mel2ph]: pad one zero frame at the front, gather along time
    upad = g.pad(hubert, [0, 1, 0, 0, 0, 0])  # [1, Tu+1, C]
    idx = g.squeeze(mel2ph, [0])  # [T]
    units = g.gather(upad, idx, axis=1)  # [1, T, C]

    x = _dense(g, units, params["unit_embed"], "unit_embed")
    lf0 = g.n(
        "Log",
        [g.add(g.const_f32([1.0]), g.div(g.unsqueeze(f0, [2]), g.const_f32([700.0])))],
    )
    x = g.add(x, _dense(g, lf0, params["f0_embed"], "f0_embed"))
    x = g.add(
        x, _dense(g, g.unsqueeze(volume, [2]), params["volume_embed"], "volume_embed")
    )
    if n_spk > 1:
        spk_mix = g.input("spk_mix", ["T", n_spk])
        table = g.init(
            np.asarray(params["spk_embed"]["embedding"], np.float32), "spk_table"
        )
        mix = g.matmul(spk_mix, table)  # [T, H]
        x = g.add(x, g.unsqueeze(mix, [0]))
    out = g.transpose(x, [0, 2, 1])  # [1, H, T]
    g.output("mel_pred", [1, model.n_hidden, "T"])
    g.n_named("Identity", [out], ["mel_pred"])
    return g.model_bytes()


def build_denoise_onnx(params: dict, model) -> bytes:
    """DiffusionWaveNet as the MoeSS ``denoise`` graph
    (diffusion_onnx.py:129-176 topology; models/diffusion/wavenet.py)."""
    g = GraphBuilder("sovits_tpu_diffusion_denoise")
    c = model.n_chans
    dn = params["denoiser"]
    noise = g.input("noise", [1, 1, model.out_dims, "T"])
    time = g.input("time", [1], P.DT_INT64)
    cond = g.input("condition", [1, model.n_hidden, "T"])

    spec = g.squeeze(noise, [1])  # [1, M, T]
    x = g.conv1d(spec, _conv_w(dn["input_projection"]),
                 dn["input_projection"]["bias"], hint="in_proj")
    x = g.relu(x)

    # sinusoidal step embedding (wavenet.py:23-29)
    half = c // 2
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1))).astype(
        np.float32
    )
    tf = g.cast(g.unsqueeze(time, [1]), P.DT_FLOAT)  # [1, 1]
    ang = g.mul(tf, g.init(freqs[None, :], "freqs"))  # [1, half]
    emb = g.concat([g.n("Sin", [ang]), g.n("Cos", [ang])], axis=1)  # [1, c]

    def mish(v):
        return g.mul(v, g.tanh(g.n("Softplus", [v])))

    emb = mish(_dense(g, emb, dn["mlp1"], "mlp1"))
    emb = _dense(g, emb, dn["mlp2"], "mlp2")  # [1, c]

    skips = None
    for i in range(model.n_layers):
        lp = dn[f"layer_{i}"]
        step = _dense(g, emb, lp["diffusion_projection"], f"l{i}_step")
        y = g.add(x, g.unsqueeze(step, [2]))  # [1, c, T]
        y = g.conv1d(y, _conv_w(lp["dilated_conv"]), lp["dilated_conv"]["bias"],
                     pads=(1, 1), hint=f"l{i}_dil")
        y = g.add(
            y,
            g.conv1d(cond, _conv_w(lp["conditioner_projection"]),
                     lp["conditioner_projection"]["bias"], hint=f"l{i}_cond"),
        )
        gate, filt = g.split(y, axis=1, sizes=[c, c])
        y = g.mul(g.sigmoid(gate), g.tanh(filt))
        y = g.conv1d(y, _conv_w(lp["output_projection"]),
                     lp["output_projection"]["bias"], hint=f"l{i}_out")
        residual, skip = g.split(y, axis=1, sizes=[c, c])
        x = g.div(g.add(x, residual), g.const_f32([np.sqrt(2.0)]))
        skips = skip if skips is None else g.add(skips, skip)

    x = g.div(skips, g.const_f32([np.sqrt(float(model.n_layers))]))
    x = g.relu(g.conv1d(x, _conv_w(dn["skip_projection"]),
                        dn["skip_projection"]["bias"], hint="skip_proj"))
    x = g.conv1d(x, _conv_w(dn["output_projection"]),
                 dn["output_projection"]["bias"], hint="out_proj")
    out = g.unsqueeze(x, [1])  # [1, 1, M, T]
    g.output("noise_pred", [1, 1, model.out_dims, "T"])
    g.n_named("Identity", [out], ["noise_pred"])
    return g.model_bytes()


def build_pred_onnx(model) -> bytes:
    """PLMS x-prediction arithmetic (diffusion_onnx.py:473-480 get_x_pred)
    with the schedule's alphas_cumprod baked in as an initializer."""
    sched = model.schedule
    g = GraphBuilder("sovits_tpu_diffusion_pred")
    x1 = g.input("noise", [1, 1, model.out_dims, "T"])
    noise_t = g.input("noise_pred", [1, 1, model.out_dims, "T"])
    t1 = g.input("time", [1], P.DT_INT64)
    t_prev = g.input("time_prev", [1], P.DT_INT64)

    ac = g.init(np.asarray(sched.alphas_cumprod, np.float32), "alphas_cumprod")
    a_t = g.reshape(g.gather(ac, t1), shape_vals=[1, 1, 1, 1])
    a_prev = g.reshape(g.gather(ac, t_prev), shape_vals=[1, 1, 1, 1])
    a_t_sq = g.n("Sqrt", [a_t])
    a_prev_sq = g.n("Sqrt", [a_prev])
    one = g.const_f32([1.0])
    term_x = g.div(one, g.mul(a_t_sq, g.add(a_t_sq, a_prev_sq)))
    denom = g.mul(
        a_t_sq,
        g.add(
            g.n("Sqrt", [g.mul(g.sub(one, a_prev), a_t)]),
            g.n("Sqrt", [g.mul(g.sub(one, a_t), a_prev)]),
        ),
    )
    inner = g.sub(g.mul(term_x, x1), g.mul(g.div(one, denom), noise_t))
    x_delta = g.mul(g.sub(a_prev, a_t), inner)
    out = g.add(x1, x_delta)
    g.output("noise_pred_o", [1, 1, model.out_dims, "T"])
    g.n_named("Identity", [out], ["noise_pred_o"])
    return g.model_bytes()


def build_after_onnx(model) -> bytes:
    """Denormalization tail (diffusion_onnx.py:170-183 AfterDiffusion)."""
    sched = model.schedule
    g = GraphBuilder("sovits_tpu_diffusion_after")
    x = g.input("x", [1, 1, model.out_dims, "T"])
    y = g.squeeze(x, [1])  # [1, M, T]
    span = float(sched.spec_max - sched.spec_min)
    y = g.add(
        g.mul(g.div(g.add(y, g.const_f32([1.0])), g.const_f32([2.0])),
              g.const_f32([span])),
        g.const_f32([float(sched.spec_min)]),
    )
    g.output("mel_out", [1, model.out_dims, "T"])
    g.n_named("Identity", [y], ["mel_out"])
    return g.model_bytes()


def build_diffusion_onnx(params: dict, model) -> dict[str, bytes]:
    """All four MoeSS diffusion artifacts, keyed by suffix."""
    return {
        "encoder": build_encoder_onnx(params, model),
        "denoise": build_denoise_onnx(params, model),
        "pred": build_pred_onnx(model),
        "after": build_after_onnx(model),
    }
