"""ONNX emission: load-and-run parity vs the jax synthesizer (VERDICT r2 #6).

Builds a tiny random-init Synthesizer, emits real ONNX bytes
(export/onnx_synth.py — self-contained protobuf, no `onnx` package), then
executes them with the in-repo numpy runtime (export/onnx_run.py) and
compares the audio against `Synthesizer.infer` run in the ONNX contract's
deterministic mode (noise=0 == sample_noise=False, predict_f0=False,
mel2ph=arange(1, T+1) == identity frame selection).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sovits_tpu import config as scfg
from sovits_tpu.export.onnx_proto import parse_model
from sovits_tpu.export.onnx_run import run_model
from sovits_tpu.export.onnx_synth import build_synthesizer_onnx, moevs_config
from sovits_tpu.models import factory


def tiny_hps(**model_over):
    hps = scfg.default_config()
    hps.data["filter_length"] = 128
    hps.data["hop_length"] = 64
    hps.data["win_length"] = 128
    hps.model["ssl_dim"] = 16
    hps.model["gin_channels"] = 8
    hps.model["hidden_channels"] = 32
    hps.model["inter_channels"] = 16
    hps.model["filter_channels"] = 48
    hps.model["n_heads"] = 2
    hps.model["n_layers"] = 2
    hps.model["n_speakers"] = 3
    hps.model["upsample_rates"] = [4, 4]
    hps.model["upsample_kernel_sizes"] = [8, 8]
    hps.model["upsample_initial_channel"] = 32
    hps.model["resblock_kernel_sizes"] = [3, 5]
    hps.model["resblock_dilation_sizes"] = [[1, 2], [1, 2]]
    for k, v in model_over.items():
        hps.model[k] = v
    return hps


def build_tiny(hps, seed=0):
    syn = factory.build_synthesizer(hps, dtype=jnp.float32)
    params = factory.init_synthesizer_params(
        syn, jax.random.PRNGKey(seed), hps, t_frames=8
    )
    return syn, jax.tree.map(np.asarray, params)


def run_both(hps, syn, params, t=13, spk_id=1, chara_mix=False, seed=1):
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((1, t, hps.model.ssl_dim)).astype(np.float32)
    f0 = rng.uniform(80, 400, (1, t)).astype(np.float32)
    f0[0, :2] = 0.0  # unvoiced head
    uv = (f0 > 0).astype(np.float32)

    wav_jax, _ = syn.apply(
        {"params": params},
        jnp.asarray(c), jnp.asarray(f0), jnp.asarray(uv),
        jnp.asarray([spk_id], jnp.int32),
        predict_f0=False, sample_noise=False,
        method=syn.infer,
    )

    mb = build_synthesizer_onnx(params, hps, chara_mix=chara_mix)
    feeds = {
        "c": c,
        "f0": f0,
        "mel2ph": np.arange(1, t + 1, dtype=np.int64)[None],
        "uv": uv,
        "noise": np.zeros((1, hps.model.inter_channels, t), np.float32),
    }
    if chara_mix:
        mix = np.zeros((t, hps.model.n_speakers), np.float32)
        mix[:, spk_id] = 1.0
        feeds["sid"] = mix
    else:
        feeds["sid"] = np.asarray([spk_id], np.int64)
    audio = run_model(mb, feeds)["audio"]
    return np.asarray(wav_jax), audio, mb


def test_onnx_parity_single_speaker():
    hps = tiny_hps()
    syn, params = build_tiny(hps)
    wav_jax, audio, mb = run_both(hps, syn, params, chara_mix=False)
    assert audio.shape == (1, 1, 13 * 16)
    got = audio[0, 0]
    want = wav_jax[0, :, 0]
    assert np.abs(got - want).max() < 2e-4, np.abs(got - want).max()


def test_onnx_parity_chara_mix_one_hot():
    """One-hot CharaMix weights == plain speaker-id export."""
    hps = tiny_hps()
    syn, params = build_tiny(hps)
    wav_jax, audio, _ = run_both(hps, syn, params, chara_mix=True, spk_id=2)
    assert np.abs(audio[0, 0] - wav_jax[0, :, 0]).max() < 2e-4


def test_onnx_parity_vol_embedding():
    hps = tiny_hps(vol_embedding=True)
    syn, params = build_tiny(hps)
    t = 11
    rng = np.random.default_rng(3)
    c = rng.standard_normal((1, t, hps.model.ssl_dim)).astype(np.float32)
    f0 = rng.uniform(100, 300, (1, t)).astype(np.float32)
    uv = np.ones((1, t), np.float32)
    vol = np.abs(rng.standard_normal((1, t))).astype(np.float32)

    wav_jax, _ = syn.apply(
        {"params": params}, jnp.asarray(c), jnp.asarray(f0), jnp.asarray(uv),
        jnp.asarray([0], jnp.int32), predict_f0=False, sample_noise=False,
        vol=jnp.asarray(vol), method=syn.infer,
    )
    mb = build_synthesizer_onnx(params, hps, chara_mix=False)
    audio = run_model(mb, {
        "c": c, "f0": f0, "mel2ph": np.arange(1, t + 1, dtype=np.int64)[None],
        "uv": uv, "noise": np.zeros((1, hps.model.inter_channels, t), np.float32),
        "sid": np.asarray([0], np.int64), "vol": vol,
    })["audio"]
    assert np.abs(audio[0, 0] - np.asarray(wav_jax)[0, :, 0]).max() < 2e-4


def test_onnx_noise_input_is_live():
    """Nonzero noise must flow through exp(logs_p): output changes, finite."""
    hps = tiny_hps()
    syn, params = build_tiny(hps)
    _wav, audio0, mb = run_both(hps, syn, params)
    t = 13
    rng = np.random.default_rng(7)
    feeds = {
        "c": rng.standard_normal((1, t, hps.model.ssl_dim)).astype(np.float32),
        "f0": rng.uniform(80, 400, (1, t)).astype(np.float32),
        "mel2ph": np.arange(1, t + 1, dtype=np.int64)[None],
        "uv": np.ones((1, t), np.float32),
        "noise": np.zeros((1, hps.model.inter_channels, t), np.float32),
        "sid": np.asarray([1], np.int64),
    }
    a0 = run_model(mb, feeds)["audio"]
    feeds["noise"] = 0.5 * rng.standard_normal(
        (1, hps.model.inter_channels, t)
    ).astype(np.float32)
    a1 = run_model(mb, feeds)["audio"]
    assert np.isfinite(a1).all()
    assert np.abs(a1 - a0).max() > 1e-4


def test_onnx_model_structure_and_sidecar():
    hps = tiny_hps()
    _syn, params = build_tiny(hps)
    mb = build_synthesizer_onnx(params, hps, chara_mix=False)
    m = parse_model(mb)
    assert m.opset == 16 and m.ir_version == 8
    assert [n for n, _, _ in m.graph.inputs] == ["c", "f0", "mel2ph", "uv", "noise", "sid"]
    assert [n for n, _, _ in m.graph.outputs] == ["audio"]
    ops = {n.op_type for n in m.graph.nodes}
    assert {"Conv", "ConvTranspose", "MatMul", "Softmax", "CumSum", "Einsum"} <= ops
    cfg = moevs_config(hps, "tiny", chara_mix=False)
    assert cfg["Type"] == "SoVits" and cfg["Rate"] == hps.data.sampling_rate


def test_onnx_transformer_flow_parity():
    hps = tiny_hps(use_transformer_flow=True, n_layers_trans_flow=1)
    syn, params = build_tiny(hps)
    wav_jax, audio, _ = run_both(hps, syn, params)
    assert np.abs(audio[0, 0] - wav_jax[0, :, 0]).max() < 2e-4


@pytest.mark.slow
def test_onnx_fullsize_parity_mel_l1():
    """Full-size synthesizer emitted and EXECUTED (r3 VERDICT next #6).

    All other ONNX tests use t=13 frames and 16-48-dim channels; this emits
    the production config (192/768 channels, 5 upsample stages, window-4
    rel-emb at T>>9) and runs a ~1.1 s clip through the numpy runtime,
    asserting mel-L1 vs the jax forward < 1e-3 (the BASELINE.md north-star
    tolerance, mirroring the reference's pre-export forward check
    onnx_export.py:93-99). Catches size-dependent emitter bugs the tiny
    configs cannot (Gather/Range index arithmetic, ConvTranspose padding at
    stride 8, f0-coarse bucketing at full bin count).
    """
    from sovits_tpu.dsp import stft as dsp_stft

    hps = scfg.default_config()
    t = 96  # ~1.1 s at hop 512 / 44.1 kHz
    syn, params = build_tiny(hps)  # full-size: tiny_hps overrides NOT applied

    rng = np.random.default_rng(17)
    c = (0.3 * rng.standard_normal((1, t, hps.model.ssl_dim))).astype(np.float32)
    f0 = rng.uniform(100, 400, (1, t)).astype(np.float32)
    f0[0, :3] = 0.0
    uv = (f0 > 0).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        wav_jax, _ = syn.apply(
            {"params": params}, jnp.asarray(c), jnp.asarray(f0),
            jnp.asarray(uv), jnp.asarray([0], jnp.int32),
            predict_f0=False, sample_noise=False, method=syn.infer,
        )
    wav_jax = np.asarray(wav_jax)[0, :, 0]

    mb = build_synthesizer_onnx(params, hps, chara_mix=False)
    audio = run_model(mb, {
        "c": c, "f0": f0,
        "mel2ph": np.arange(1, t + 1, dtype=np.int64)[None],
        "uv": uv,
        "noise": np.zeros((1, hps.model.inter_channels, t), np.float32),
        "sid": np.asarray([0], np.int64),
    })["audio"][0, 0]

    n = min(len(wav_jax), len(audio))
    assert n == t * hps.data.hop_length
    d = hps.data
    mel_kw = dict(
        n_fft=d.filter_length, n_mels=d.n_mel_channels,
        sample_rate=d.sampling_rate, hop_length=d.hop_length,
        win_length=d.win_length, fmin=d.mel_fmin, fmax=d.mel_fmax,
    )
    mel_jax = np.asarray(dsp_stft.mel_spectrogram(jnp.asarray(wav_jax[None, :n]), **mel_kw))
    mel_onnx = np.asarray(dsp_stft.mel_spectrogram(jnp.asarray(audio[None, :n]), **mel_kw))
    l1 = float(np.abs(mel_jax - mel_onnx).mean())
    assert l1 < 1e-3, l1
