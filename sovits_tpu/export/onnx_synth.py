"""SynthesizerTrn -> ONNX with the reference's MoeSS io contract.

Mirrors onnxexport/model_onnx_speaker_mix.py:334-365 + onnx_export.py:24-110:
inputs  c [1, T, ssl], f0 [1, T], mel2ph [1, T], uv [1, T],
        noise [1, inter, T], sid ([1] int64, or [T, S] f32 with CharaMix),
        vol [1, T] (only when vol_embedding)
output  audio [1, 1, T*hop]

Semantics follow the reference's export-time model, not the training model:
c is gathered by mel2ph over a front-padded frame axis, the prior is
z_p = m_p + noise * exp(logs_p) with the CALLER-provided noise (the
noise_scale lives in the consumer, onnxexport model forward), x_mask is all
ones (dropped — every mask multiply is identity), and predict_f0 is False
(the artifact the reference emits has predict_f0=False; MoeSS drives f0).

Weight-norm is folded into plain kernels at export. Batch is fixed at 1
(MoeSS calls it that way); the frame axis is dynamic.
"""

from __future__ import annotations

import numpy as np

from . import onnx_proto as P
from .onnx_graph import GraphBuilder

F0_BIN = 256
F0_MEL_MIN = 1127.0 * np.log(1.0 + 50.0 / 700.0)
F0_MEL_MAX = 1127.0 * np.log(1.0 + 1100.0 / 700.0)


# ---------------------------------------------------------------------------
# weight folding
# ---------------------------------------------------------------------------


def _conv_w(p: dict) -> tuple[np.ndarray, np.ndarray | None]:
    """Conv1d params -> (w [Co, Ci/g, k], b), weight-norm folded."""
    v = np.asarray(p["kernel"], np.float32)  # [k, Ci/g, Co]
    if "g" in p:
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        v = v * (np.asarray(p["g"], np.float32).reshape(1, 1, -1) / norm)
    w = np.ascontiguousarray(v.transpose(2, 1, 0))
    b = np.asarray(p["bias"], np.float32) if "bias" in p else None
    return w, b


def _convt_w(p: dict) -> tuple[np.ndarray, np.ndarray | None]:
    """ConvTranspose1d params -> (w [Ci, Co, k], b), weight-norm folded."""
    v = np.asarray(p["kernel"], np.float32)  # [k, Ci, Co]
    if "g_in" in p:
        norm = np.sqrt((v**2).sum(axis=(0, 2), keepdims=True))
        v = v * (np.asarray(p["g_in"], np.float32).reshape(1, -1, 1) / norm)
    w = np.ascontiguousarray(v.transpose(1, 2, 0))
    b = np.asarray(p["bias"], np.float32) if "bias" in p else None
    return w, b


# ---------------------------------------------------------------------------
# module builders (g: GraphBuilder; x names are value names in the graph)
# ---------------------------------------------------------------------------


def _dense(g: GraphBuilder, x_ntc: str, p: dict) -> str:
    y = g.matmul(x_ntc, g.init(np.asarray(p["kernel"], np.float32), "dw"))
    if "bias" in p:
        y = g.add(y, g.init(np.asarray(p["bias"], np.float32), "db"))
    return y


def _conv(g: GraphBuilder, x_ncw: str, p: dict, pads, stride=1, dilation=1,
          group=1, hint="conv") -> str:
    w, b = _conv_w(p)
    return g.conv1d(x_ncw, w, b, pads=pads, stride=stride, dilation=dilation,
                    group=group, hint=hint)


def _layer_norm(g: GraphBuilder, x_ntc: str, p: dict, eps: float = 1e-5) -> str:
    # opset 16 ReduceMean takes axes as an attribute (moved to input in 18)
    m = g.n("ReduceMean", [x_ntc], axes=[-1], keepdims=1)
    d = g.sub(x_ntc, m)
    var = g.n("ReduceMean", [g.mul(d, d)], axes=[-1], keepdims=1)
    y = g.div(d, g.n("Sqrt", [g.add(var, g.const_f32(eps, "eps"))]))
    y = g.mul(y, g.init(np.asarray(p["scale"], np.float32), "ln_g"))
    return g.add(y, g.init(np.asarray(p["bias"], np.float32), "ln_b"))


def _rel_emb_matrix(g: GraphBuilder, t_range: str, emb: np.ndarray, window: int) -> str:
    """[T, T, d] matrix E[i, j] = emb[j - i + w] masked to |j - i| <= w."""
    row = g.unsqueeze(t_range, [1])  # [T, 1]
    col = g.unsqueeze(t_range, [0])  # [1, T]
    diff = g.sub(col, row)  # [T, T] int64
    idx = g.add(
        g.n("Clip", [diff, g.const_i64(-window, "lo"), g.const_i64(window, "hi")]),
        g.const_i64(window, "w"),
    )
    gathered = g.gather(g.init(np.asarray(emb, np.float32), "rel"), idx, axis=0)
    in_band = g.n(
        "Less",
        [g.n("Abs", [diff]), g.const_i64(window + 1, "w1")],
    )
    mask = g.unsqueeze(g.cast(in_band, P.DT_FLOAT), [2])  # [T, T, 1]
    return g.mul(gathered, mask)


def _attention(
    g: GraphBuilder, x: str, p: dict, n_heads: int, window: int | None,
    causal: bool, t_range: str,
) -> str:
    """MultiHeadAttention (nn/attention.py:108-300), all-ones padding mask.
    x [1, T, C]."""
    c = np.asarray(p["query"]["kernel"]).shape[0]
    dh = c // n_heads
    q = _dense(g, x, p["query"])
    k = _dense(g, x, p["key"])
    v = _dense(g, x, p["value"])
    def heads(t):
        return g.transpose(g.reshape(t, [0, 0, n_heads, dh]), [0, 2, 1, 3])
    q = g.mul(heads(q), g.const_f32(1.0 / np.sqrt(dh), "scale"))
    k = heads(k)
    v = heads(v)
    scores = g.matmul(q, g.transpose(k, [0, 1, 3, 2]))  # [1, H, T, T]
    if window is not None:
        embm_k = _rel_emb_matrix(g, t_range, p["emb_rel_k"][0], window)
        scores = g.add(scores, g.einsum("bhtd,tsd->bhts", [q, embm_k]))
    if causal:
        row = g.unsqueeze(t_range, [1])
        col = g.unsqueeze(t_range, [0])
        fut = g.n("Greater", [col, row])  # j > i masked
        neg = g.const_f32(-1e4, "neg")
        scores = g.n("Where", [fut, neg, scores])
    attn = g.softmax(scores, axis=-1)
    out = g.matmul(attn, v)  # [1, H, T, dh]
    if window is not None:
        embm_v = _rel_emb_matrix(g, t_range, p["emb_rel_v"][0], window)
        out = g.add(out, g.einsum("bhts,tsd->bhtd", [attn, embm_v]))
    out = g.reshape(g.transpose(out, [0, 2, 1, 3]), [0, 0, c])
    return _dense(g, out, p["out"])


def _ffn(g: GraphBuilder, x: str, p: dict, kernel_size: int, causal: bool) -> str:
    if kernel_size == 1:
        pads = (0, 0)
    elif causal:
        pads = (kernel_size - 1, 0)
    else:
        pads = ((kernel_size - 1) // 2, kernel_size // 2)
    y = g.transpose(x, [0, 2, 1])
    y = _conv(g, y, p["conv1"], pads, hint="ffn1")
    y = g.relu(y)
    y = _conv(g, y, p["conv2"], pads, hint="ffn2")
    return g.transpose(y, [0, 2, 1])


def _encoder(
    g: GraphBuilder, x: str, p: dict, n_layers: int, n_heads: int,
    kernel_size: int, t_range: str, window: int = 4,
) -> str:
    """nn.attention.Encoder (post-LN, windowed relative attention)."""
    for i in range(n_layers):
        y = _attention(g, x, p[f"attn_{i}"], n_heads, window, False, t_range)
        x = _layer_norm(g, g.add(x, y), p[f"norm1_{i}"])
        y = _ffn(g, x, p[f"ffn_{i}"], kernel_size, causal=False)
        x = _layer_norm(g, g.add(x, y), p[f"norm2_{i}"])
    return x


def _gated(g: GraphBuilder, x_ncw: str, cond_ncw: str, h: int) -> str:
    s = g.add(x_ncw, cond_ncw)
    a, b = g.split(s, axis=1, sizes=[h, h])
    return g.mul(g.tanh(a), g.sigmoid(b))


def _wavenet(
    g: GraphBuilder, x_ncw: str, p: dict, n_layers: int, kernel_size: int,
    dilation_rate: int, h: int, g_ncw: str | None,
) -> str:
    """nn.wavenet.WaveNet in NCW (masks dropped: all ones)."""
    g_all = None
    if g_ncw is not None and "cond" in p:
        g_all = _conv(g, g_ncw, p["cond"], (0, 0), hint="wn_cond")
    out = None
    zero = g.const_f32(0.0, "zero")
    for i in range(n_layers):
        dilation = dilation_rate**i
        pad = (kernel_size - 1) * dilation // 2
        x_in = _conv(g, x_ncw, p[f"in_{i}"], (pad, pad), dilation=dilation,
                     hint=f"wn_in{i}")
        if g_all is not None:
            g_l = g.slice_(g_all, [i * 2 * h], [(i + 1) * 2 * h], [1])
            acts = _gated(g, x_in, g_l, h)
        else:
            acts = _gated(g, x_in, zero, h)
        last = i == n_layers - 1
        rs = _conv(g, acts, p[f"res_skip_{i}"], (0, 0), hint=f"wn_rs{i}")
        if not last:
            res, skip = g.split(rs, axis=1, sizes=[h, h])
            x_ncw = g.add(x_ncw, res)
            out = skip if out is None else g.add(out, skip)
        else:
            out = rs if out is None else g.add(out, rs)
    return out


def _flip(g: GraphBuilder, x_ncw: str, channels: int) -> str:
    rev = g.const_i64(list(range(channels - 1, -1, -1)), "flip")
    return g.gather(x_ncw, rev, axis=1)


def _fft_stack(
    g: GraphBuilder, x: str, p: dict, n_layers: int, n_heads: int,
    kernel_size: int, h: int, g_ncw: str | None, t_range: str,
) -> str:
    """nn.attention.FFT (causal, isflow conditioning) — x is [1, T, C] NTC."""
    g_all = None
    if g_ncw is not None and "cond" in p:
        g_all = _conv(g, g_ncw, p["cond"], (0, 0), hint="fft_cond")
    for i in range(n_layers):
        if g_all is not None:
            xc = g.transpose(_conv(g, g.transpose(x, [0, 2, 1]), p["cond_pre"],
                                   (0, 0), hint="fft_pre"), [0, 2, 1])
            g_l = g.slice_(g_all, [i * 2 * h], [(i + 1) * 2 * h], [1])
            # gated_tanh_sigmoid on NTC: transpose cond to NTC and split last
            g_l_ntc = g.transpose(g_l, [0, 2, 1])
            s = g.add(xc, g_l_ntc)
            a, b = g.split(s, axis=2, sizes=[h, h])
            x = g.mul(g.tanh(a), g.sigmoid(b))
        y = _attention(g, x, p[f"attn_{i}"], n_heads, None, True, t_range)
        x = _layer_norm(g, g.add(x, y), p[f"norm0_{i}"])
        y = _ffn(g, x, p[f"ffn_{i}"], kernel_size, causal=True)
        x = _layer_norm(g, g.add(x, y), p[f"norm1_{i}"])
    return x


def _flow_reverse(
    g: GraphBuilder, x_ncw: str, p: dict, hps, g_ncw: str, t_range: str,
) -> str:
    """flow(z_p, reverse=True): n couplings + flips, reversed order."""
    channels = hps.model.inter_channels
    half = channels // 2
    hidden = hps.model.hidden_channels
    transformer = bool(getattr(hps.model, "use_transformer_flow", False))
    n_flows = 4 if not transformer else int(getattr(hps.model, "n_flow_layer", 4))
    shared_key = "shared_wn" if not transformer else "shared_enc"
    shared = p.get(shared_key)
    for i in reversed(range(n_flows)):
        x_ncw = _flip(g, x_ncw, channels)
        cp = p[f"coupling_{i}"]
        x0 = g.slice_(x_ncw, [0], [half], [1])
        x1 = g.slice_(x_ncw, [half], [channels], [1])
        h = _conv(g, x0, cp["pre"], (0, 0), hint="cpl_pre")
        inner = cp.get("enc", shared)
        if transformer:
            h_ntc = _fft_stack(
                g, g.transpose(h, [0, 2, 1]), inner,
                int(getattr(hps.model, "n_layers_trans_flow", 3)),
                hps.model.n_heads, 5, hidden, g_ncw, t_range,
            )
            h = g.transpose(h_ntc, [0, 2, 1])
        else:
            h = _wavenet(
                g, h, inner, int(getattr(hps.model, "n_flow_layer", 4)), 5, 1,
                hidden, g_ncw,
            )
        m = _conv(g, h, cp["post"], (0, 0), hint="cpl_post")
        x1 = g.sub(x1, m)
        x_ncw = g.concat([x0, x1], axis=1)
    return x_ncw


def _f0_coarse(g: GraphBuilder, f0: str) -> str:
    """dsp/f0.f0_to_coarse (utils.py:69-80): mel-scale bins in [1, 255]."""
    mel = g.mul(
        g.n("Log", [g.add(g.const_f32(1.0, "one"),
                          g.div(f0, g.const_f32(700.0, "c700")))]),
        g.const_f32(1127.0, "c1127"),
    )
    a = (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN)
    b = F0_MEL_MIN * a - 1.0
    scaled = g.sub(g.mul(mel, g.const_f32(a, "a")), g.const_f32(b, "b"))
    pos = g.n("Greater", [mel, g.const_f32(0.0, "z")])
    mel = g.n("Where", [pos, scaled, mel])
    coarse = g.n("Round", [mel])
    coarse = g.n("Clip", [coarse, g.const_f32(1.0, "cl"), g.const_f32(255.0, "ch")])
    return g.cast(coarse, P.DT_INT64)


def _sine_source(
    g: GraphBuilder, f0: str, p: dict, upp: int, sample_rate: int,
    sine_amp: float = 0.1,
) -> str:
    """Deterministic SourceModuleHnNSF (models/nsf_hifigan.py:40-168):
    f0 [1, T] -> har_source [1, 1, T*upp] (NCW). No additive noise (the
    reference's ONNX SineGen also drops randomness at export)."""
    h = np.asarray(p["merge_kernel"], np.float32).shape[0]
    harmonics = np.arange(1, h + 1, dtype=np.float32).reshape(1, h, 1)
    f0_h = g.mul(g.unsqueeze(f0, [1]), g.init(harmonics, "harm"))  # [1, H, T]
    rad = g.div(f0_h, g.const_f32(float(sample_rate), "sr"))
    rad = g.sub(rad, g.n("Floor", [rad]))  # % 1.0
    frame_adv = g.mul(rad, g.const_f32(float(upp), "upp"))
    frame_adv = g.sub(frame_adv, g.n("Floor", [frame_adv]))
    csum = g.cumsum(frame_adv, axis=2)
    base = g.sub(csum, frame_adv)  # exclusive cumsum
    offsets = np.arange(1, upp + 1, dtype=np.float32).reshape(1, 1, 1, upp)
    phase = g.add(
        g.unsqueeze(base, [3]),
        g.mul(g.unsqueeze(rad, [3]), g.init(offsets, "offsets")),
    )  # [1, H, T, upp]
    sines = g.mul(
        g.n("Sin", [g.mul(phase, g.const_f32(2.0 * np.pi, "twopi"))]),
        g.const_f32(sine_amp, "amp"),
    )
    uv = g.cast(g.n("Greater", [f0, g.const_f32(0.0, "vth")]), P.DT_FLOAT)
    sines = g.mul(sines, g.unsqueeze(uv, [1, 3]))  # [1, H, T, upp]
    w = np.asarray(p["merge_kernel"], np.float32)[:, 0]
    merged = g.einsum("bhtu,h->btu", [sines, g.init(w, "merge_w")])
    merged = g.add(merged, g.const_f32(float(np.asarray(p["merge_bias"])[0]), "merge_b"))
    har = g.tanh(g.reshape(merged, [1, 1, -1]))  # [1, 1, T*upp]
    return har


def _generator(
    g: GraphBuilder, z_ncw: str, f0: str, p: dict, hps, g_ncw: str,
) -> str:
    """NSF-HiFiGAN Generator (models/nsf_hifigan.py:185-358) in NCW."""
    m = hps.model
    ups = list(m.upsample_rates)
    upk = list(m.upsample_kernel_sizes)
    upp = int(np.prod(ups))
    har = _sine_source(g, f0, p["m_source"], upp, hps.data.sampling_rate)

    x = _conv(g, z_ncw, p["conv_pre"], (3, 3), hint="dec_pre")
    if "cond" in p:
        x = g.add(x, _conv(g, g_ncw, p["cond"], (0, 0), hint="dec_cond"))
    num_kernels = len(m.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(ups, upk)):
        x = g.leaky_relu(x, 0.1)
        w, b = _convt_w(p[f"up_{i}"])
        x = g.conv_transpose1d(x, w, b, stride=u, padding=(k - u + 1) // 2,
                               hint=f"up{i}")
        if i + 1 < len(ups):
            stride_f0 = int(np.prod(ups[i + 1 :]))
            xs = _conv(
                g, har, p[f"noise_conv_{i}"],
                ((stride_f0 + 1) // 2, (stride_f0 + 1) // 2),
                stride=stride_f0, hint=f"noise{i}",
            )
        else:
            xs = _conv(g, har, p[f"noise_conv_{i}"], (0, 0), hint=f"noise{i}")
        x = g.add(x, xs)
        acc = None
        for j, (rk, rd) in enumerate(
            zip(m.resblock_kernel_sizes, m.resblock_dilation_sizes)
        ):
            rb = p[f"resblock_{i}_{j}"]
            xr = x
            for jj, d in enumerate(rd):
                pad1 = (rk - 1) * d // 2
                pad2 = (rk - 1) // 2
                xt = g.leaky_relu(xr, 0.1)
                xt = _conv(g, xt, rb[f"conv1_{jj}"], (pad1, pad1), dilation=d,
                           hint=f"rb{i}{j}c1")
                xt = g.leaky_relu(xt, 0.1)
                xt = _conv(g, xt, rb[f"conv2_{jj}"], (pad2, pad2),
                           hint=f"rb{i}{j}c2")
                xr = g.add(xt, xr)
            acc = xr if acc is None else g.add(acc, xr)
        x = g.div(acc, g.const_f32(float(num_kernels), "nk"))
    x = g.leaky_relu(x, 0.01)
    x = _conv(g, x, p["conv_post"], (3, 3), hint="dec_post")
    return g.tanh(x)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def build_synthesizer_onnx(params: dict, hps, chara_mix: bool | None = None) -> bytes:
    """Emit the SoVits ONNX model bytes from a jax params pytree + hparams."""
    m = hps.model
    if getattr(m, "vocoder_name", "nsf-hifigan") not in ("nsf-hifigan",):
        raise NotImplementedError(
            "ONNX export currently covers the nsf-hifigan decoder "
            "(the snake variant stays on the StableHLO path)"
        )
    n_spk = int(m.n_speakers)
    if chara_mix is None:
        chara_mix = n_spk > 1
    vol_embedding = bool(getattr(m, "vol_embedding", False))
    hidden = int(m.hidden_channels)
    inter = int(m.inter_channels)
    upp = int(np.prod(m.upsample_rates))

    g = GraphBuilder("sovits_tpu")
    c = g.input("c", [1, "T", int(m.ssl_dim)])
    f0 = g.input("f0", [1, "T"])
    mel2ph = g.input("mel2ph", [1, "T"], P.DT_INT64)
    uv = g.input("uv", [1, "T"])
    noise = g.input("noise", [1, inter, "T"])
    if chara_mix:
        sid = g.input("sid", ["T", n_spk])
    else:
        sid = g.input("sid", [1], P.DT_INT64)
    vol = g.input("vol", [1, "T"]) if vol_embedding else None

    t_frames = g.squeeze(g.shape_dim(mel2ph, 1), [0])  # scalar T
    t_range = g.n("Range", [
        g.init(np.asarray(0, np.int64), "r0"),
        g.cast(t_frames, P.DT_INT64),
        g.init(np.asarray(1, np.int64), "r1"),
    ])

    # c gather by mel2ph (front-pad frame axis, model_onnx_speaker_mix:335-337)
    c_pad = g.pad(c, [0, 1, 0, 0, 0, 0])  # [1, T+1, ssl]
    c_flat = g.squeeze(c_pad, [0])  # [T+1, ssl]
    idx = g.squeeze(mel2ph, [0])  # [T]
    c_sel = g.unsqueeze(g.gather(c_flat, idx, axis=0), [0])  # [1, T, ssl]

    # speaker conditioning [1, gin, Tg]
    emb_g = np.asarray(params["emb_g"]["embedding"], np.float32)  # [S, gin]
    if chara_mix:
        g_pf = g.matmul(sid, g.init(emb_g, "spk_table"))  # [T, gin]
        g_ncw = g.unsqueeze(g.transpose(g_pf, [1, 0]), [0])  # [1, gin, T]
    else:
        g_emb = g.gather(g.init(emb_g, "spk_table"), sid, axis=0)  # [1, gin]
        g_ncw = g.unsqueeze(g.transpose(g_emb, [1, 0]), [0])  # [1, gin, 1]

    # prenet: pre(c) + emb_uv + vol (synthesizer.py:365-371)
    x_ncw = _conv(g, g.transpose(c_sel, [0, 2, 1]), params["pre"], (2, 2),
                  hint="prenet")
    uv_tab = np.asarray(params["emb_uv"]["embedding"], np.float32)  # [2, H]
    uv_idx = g.squeeze(g.cast(uv, P.DT_INT64), [0])  # [T]
    uv_emb = g.gather(g.init(uv_tab, "uv_table"), uv_idx, axis=0)  # [T, H]
    x_ncw = g.add(x_ncw, g.unsqueeze(g.transpose(uv_emb, [1, 0]), [0]))
    if vol_embedding:
        w = np.asarray(params["emb_vol"]["kernel"], np.float32)  # [1, H]
        bvol = np.asarray(params["emb_vol"]["bias"], np.float32)
        v_emb = g.add(
            g.matmul(g.unsqueeze(vol, [2]), g.init(w, "vol_w")),
            g.init(bvol, "vol_b"),
        )  # [1, T, H]
        x_ncw = g.add(x_ncw, g.transpose(v_emb, [0, 2, 1]))

    # enc_p: f0 embedding + relative-attention encoder + proj
    ep = params["enc_p"]
    f0_tab = np.asarray(ep["f0_emb"]["embedding"], np.float32)  # [256, H]
    coarse = g.squeeze(_f0_coarse(g, f0), [0])  # [T]
    f0_emb = g.unsqueeze(g.gather(g.init(f0_tab, "f0_table"), coarse, axis=0), [0])
    x_ntc = g.add(g.transpose(x_ncw, [0, 2, 1]), f0_emb)
    x_ntc = _encoder(g, x_ntc, ep["enc"], int(m.n_layers), int(m.n_heads),
                     int(m.kernel_size), t_range)
    stats = _conv(g, g.transpose(x_ntc, [0, 2, 1]), ep["proj"], (0, 0),
                  hint="enc_proj")  # [1, 2*inter, T]
    m_p, logs_p = g.split(stats, axis=1, sizes=[inter, inter])
    z_p = g.add(m_p, g.mul(noise, g.exp(logs_p)))

    z = _flow_reverse(g, z_p, params["flow"], hps, g_ncw, t_range)
    audio = _generator(g, z, f0, params["dec"], hps, g_ncw)
    g.n_named("Identity", [audio], ["audio"])
    g.output("audio", [1, 1, "T_samples"])
    _ = upp
    return g.model_bytes(opset=16)


def moevs_config(hps, name: str, chara_mix: bool) -> dict:
    """MoeSS sidecar (onnx_export.py:113-131)."""
    spk = list(getattr(hps, "spk", {}).keys()) if hasattr(hps, "spk") else []
    gin = int(hps.model.gin_channels)
    vec_lay = "layer-12" if gin == 768 else "layer-9"
    return {
        "Folder": name,
        "Name": name,
        "Type": "SoVits",
        "Rate": int(hps.data.sampling_rate),
        "Hop": int(hps.data.hop_length),
        "Hubert": f"vec-{gin}-{vec_lay}",
        "SoVits4": True,
        "SoVits3": False,
        "CharaMix": bool(chara_mix),
        "Volume": bool(getattr(hps.model, "vol_embedding", False)),
        "HiddenSize": gin,
        "Characters": spk,
        "Cluster": "",
    }
