"""webUI smoke tests (r2 VERDICT next #9).

gradio is absent in this image, so the real app can't launch; a minimal
test double (tests/gradio_stub.py) lets ``build_app()`` construct the full
tab surface and lets us EXECUTE the click callbacks against the shared tiny
Svc checkpoint — keeping the UI honest without the dependency.
Reference surface: /root/reference/webUI.py:275-427.
"""

import sys

import numpy as np
import pytest

import tests.gradio_stub as gradio_stub

sys.modules.setdefault("gradio", gradio_stub)

from sovits_tpu.serving import webui  # noqa: E402


@pytest.fixture()
def app(svc, monkeypatch):
    # webui's load_model constructs Svc(ckpt, cfg) with the default (real)
    # speech encoder; reuse the session fixture's FakeEncoder instead.
    ckpt, cfg = svc._test_paths
    real_svc = type(svc)

    def _svc(net_g_path, config_path, **kw):
        return real_svc(net_g_path, config_path, encoder=svc._encoder, **kw)

    import sovits_tpu.infer.svc as svc_mod

    monkeypatch.setattr(svc_mod, "Svc", _svc)
    return webui.build_app(), ckpt, cfg


def test_build_app_tab_surface(app):
    blocks, _, _ = app
    assert blocks.tabs() == [
        "Inference", "Text-to-Speech", "Model compression", "Local models"
    ]
    labels = [c["label"] for c in blocks.clicks]
    assert {"Load", "Unload", "Convert", "Synthesize + Convert",
            "Compress", "Scan"} <= set(labels)


def test_load_convert_unload_callbacks(app):
    blocks, ckpt, cfg = app

    # convert before load -> graceful status
    out, status = blocks.click_fn("Convert")(
        (8000, np.zeros(800, np.int16)), "spk0", 0, "dio", False, 0.0, -40, 0.4
    )
    assert out is None and "load" in status

    status = blocks.click_fn("Load")(ckpt, cfg)
    assert status.startswith("loaded")

    sr = 8000
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    (out_sr, out_wav), status = blocks.click_fn("Convert")(
        (sr, wav), "spk0", 0, "dio", False, 0.0, -40, 0.4
    )
    assert status == "ok"
    assert out_wav.dtype == np.int16 and len(out_wav) > 0
    assert np.isfinite(out_wav).all()

    assert blocks.click_fn("Unload")() == "unloaded"


def test_compress_and_scan_callbacks(app, tmp_path):
    blocks, ckpt, cfg = app

    out_npz = tmp_path / "release.npz"
    status = blocks.click_fn("Compress")(ckpt, cfg, str(out_npz))
    assert out_npz.exists() and "wrote" in status
    flat = np.load(out_npz)
    assert len(flat.files) > 0
    assert not any(k.startswith("enc_q") for k in flat.files)

    # scan finds (ckpt, config) pairs laid out like logs/44k
    import shutil
    from pathlib import Path

    root = tmp_path / "logs"
    d = root / "44k"
    d.mkdir(parents=True)
    shutil.copy(cfg, d / "config.json")
    shutil.copytree(ckpt, d / "ckpt")
    found = blocks.click_fn("Scan")(str(root))
    assert len(found) == 1
    assert Path(found[0][0]).name == "ckpt"
