"""spk-mix timeline + HTTP API tests."""

import http.client
import io
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from scipy.io import wavfile

from sovits_tpu.infer.spkmix import build_spk_mix_frames
from sovits_tpu.serving.api import make_handler, parse_multipart, wav_bytes_to_array

from tests.test_infer import FakeEncoder, _tone, SR  # noqa: F401 (fixture deps)


def test_spk_mix_frames_ramps_and_normalization():
    mix = {0: [[0.0, 0.5, 1.0, 0.0]], 1: [[0.5, 1.0, 0.0, 1.0]]}
    w = build_spk_mix_frames(mix, 100, 4)
    assert w.shape == (100, 4)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    # first frame: all weight on speaker 0; frame 75: all on speaker 1
    assert w[0, 0] == 1.0
    assert w[75, 1] == 1.0
    # zero frames (gap) fall back to uniform over the mapped speakers
    mix_gap = {0: [[0.0, 0.4, 1.0, 0.0]], 1: [[0.6, 1.0, 0.0, 1.0]]}
    w2 = build_spk_mix_frames(mix_gap, 100, 4)
    np.testing.assert_allclose(w2.sum(axis=1), 1.0, atol=1e-5)


def test_spk_mix_validation_errors():
    with pytest.raises(ValueError):
        build_spk_mix_frames({0: [[0.5, 0.5, 1, 1]]}, 100, 4)  # zero length
    with pytest.raises(ValueError):
        build_spk_mix_frames({0: [[0.0, 0.4, 1, 1], [0.5, 1.0, 1, 1]]}, 100, 4)  # gap
    with pytest.raises(ValueError):
        build_spk_mix_frames({0: [[0.0, 1.0, -1, 1]]}, 100, 4)  # negative


def _multipart_body(fields: dict) -> tuple[bytes, str]:
    boundary = "testboundary123"
    parts = []
    for name, value in fields.items():
        parts.append(f"--{boundary}\r\n".encode())
        if isinstance(value, bytes):
            parts.append(
                f'Content-Disposition: form-data; name="{name}"; filename="f.wav"\r\n'
                "Content-Type: audio/wav\r\n\r\n".encode()
            )
            parts.append(value)
        else:
            parts.append(
                f'Content-Disposition: form-data; name="{name}"\r\n\r\n'.encode()
            )
            parts.append(str(value).encode())
        parts.append(b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    return b"".join(parts), f"multipart/form-data; boundary={boundary}"


def test_parse_multipart_roundtrip():
    wav = _tone(220, 0.2)
    buf = io.BytesIO()
    wavfile.write(buf, SR, (wav * 32767).astype(np.int16))
    body, ctype = _multipart_body({"sample": buf.getvalue(), "fPitchChange": 2})
    fields = parse_multipart({"Content-Type": ctype}, body)
    assert float(fields["fPitchChange"]) == 2.0
    got, sr = wav_bytes_to_array(fields["sample"])
    assert sr == SR and abs(len(got) - len(wav)) < 3


def test_http_api_endpoints(svc):
    handler = make_handler(svc, None, {"raw_infer": True, "f0_predictor": "yin"})
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        wav = _tone(220, 0.4)
        buf = io.BytesIO()
        wavfile.write(buf, SR, (wav * 32767).astype(np.int16))
        body, ctype = _multipart_body(
            {"sample": buf.getvalue(), "fPitchChange": 0, "sampleRate": SR, "sSpeakId": 0}
        )
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/voiceChangeModel", body, {"Content-Type": ctype})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()[:200]
        out, out_sr = wav_bytes_to_array(resp.read())
        assert out_sr == SR
        assert len(out) > 0 and np.isfinite(out).all()
    finally:
        server.shutdown()


def test_slice_inference_spk_mix(svc):
    mix = {0: [[0.0, 1.0, 1.0, 0.0]], 1: [[0.0, 1.0, 0.0, 1.0]]}
    audio_in = _tone(220, 1.2)
    out = svc.slice_inference(
        audio_in, SR, mix, 0, f0_predictor="yin", noice_scale=0.0, use_spk_mix=True
    )
    assert np.isfinite(out).all() and len(out) > 0


def test_enhancer_runs_fresh_init():
    from sovits_tpu.infer.enhancer import Enhancer

    enh = Enhancer(
        "nsf-hifigan", None,
        config={
            "sampling_rate": 8000, "num_mels": 16, "n_fft": 256, "win_size": 256,
            "hop_size": 64, "fmin": 40, "fmax": 4000,
            "upsample_rates": [4, 4, 4], "upsample_kernel_sizes": [8, 8, 8],
            "upsample_initial_channel": 32,
        },
    )
    wav = _tone(220, 0.4)
    f0 = np.full(len(wav) // 64, 220.0, np.float32)
    out, out_sr = enh.enhance(wav, SR, f0, 64, adaptive_key=0)
    assert out_sr == 8000
    assert np.isfinite(out).all() and len(out) > 0
    out2, _ = enh.enhance(wav, SR, f0, 64, adaptive_key=2)
    assert np.isfinite(out2).all()


def test_tts_voice_catalogue_and_language_detection():
    """Full edge-TTS catalogue + auto language pick (edgetts/tts.py:12-32)."""
    from sovits_tpu.serving.tts import (
        SUPPORTED_VOICES,
        VOICES_BY_LOCALE,
        detect_language,
        pick_voice,
    )

    assert len(SUPPORTED_VOICES) >= 290  # the reference ships ~300 voices
    assert len(VOICES_BY_LOCALE) >= 130
    assert SUPPORTED_VOICES["zh-CN-XiaoxiaoNeural"] == "zh-CN"
    assert SUPPORTED_VOICES["en-US-AriaNeural"] == "en-US"
    # language-code and locale inputs resolve to catalogued voices
    for lang in ("zh-cn", "ja", "ko", "en", "de-DE", "fr-FR"):
        v = pick_voice(lang, seed=0)
        assert v in SUPPORTED_VOICES, v
    # explicit voice ids pass through
    assert pick_voice("en-US-GuyNeural") == "en-US-GuyNeural"
    # unknown language falls back to en-US
    assert pick_voice("xx-unknown", seed=0).startswith("en-US")
    # heuristic auto-detect (langdetect absent in this image)
    assert detect_language("こんにちは") == "ja"
    assert detect_language("你好") == "zh-cn"
    assert detect_language("안녕") == "ko"
    assert detect_language("hello world") == "en"


def test_webui_model_scan(tmp_path):
    from sovits_tpu.serving.webui import scan_local_models

    d = tmp_path / "logs" / "44k"
    d.mkdir(parents=True)
    (d / "config.json").write_text("{}")
    (d / "model.npz").write_bytes(b"x")
    found = scan_local_models(str(tmp_path / "logs"))
    assert any(c.endswith("model.npz") for c, _ in found)
