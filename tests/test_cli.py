"""CLI tests: resample, flist/config generation, featurization, model tools."""

import numpy as np
from scipy.io import wavfile

from tests.tiny import tiny_hps

from sovits_tpu import config as scfg
from sovits_tpu.cli import preprocess_features, preprocess_flist_config, resample as cli_resample
from sovits_tpu.cli.tools import flatten_params, unflatten_params
from sovits_tpu.f0 import get_f0_predictor


def _write_wav(path, sr, seconds, freq=220.0):
    t = np.arange(int(sr * seconds)) / sr
    wav = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    path.parent.mkdir(parents=True, exist_ok=True)
    wavfile.write(path, sr, wav)


def test_resample_cli(tmp_path):
    raw = tmp_path / "dataset_raw"
    for spk in ("a", "b"):
        _write_wav(raw / spk / "x.wav", 22050, 0.5)
    out = tmp_path / "dataset" / "8k"
    cli_resample.main(["--sr2", "8000", "--in_dir", str(raw), "--out_dir2", str(out), "--workers", "1"])
    sr, wav = wavfile.read(out / "a" / "x.wav")
    assert sr == 8000
    assert abs(len(wav) - 4000) < 10
    peak = np.abs(wav).max() / 32767.0
    assert 0.9 < peak <= 0.99


def test_flist_config_cli(tmp_path, monkeypatch):
    ds = tmp_path / "dataset" / "44k"
    for spk in ("alice", "bob"):
        for i in range(4):
            _write_wav(ds / spk / f"c{i}.wav", 8000, 0.1)
    cfg_path = tmp_path / "config.json"
    preprocess_flist_config.main(
        [
            "--source_dir", str(ds),
            "--train_list", str(tmp_path / "train.txt"),
            "--val_list", str(tmp_path / "val.txt"),
            "--speech_encoder", "hubertsoft",
            "--config_out", str(cfg_path),
        ]
    )
    hps = scfg.load_config(cfg_path)
    assert hps.model.ssl_dim == 256  # ENCODER_DIMS wiring
    assert dict(hps.spk.items()) == {"alice": 0, "bob": 1}
    train = (tmp_path / "train.txt").read_text().strip().splitlines()
    val = (tmp_path / "val.txt").read_text().strip().splitlines()
    assert len(val) == 4 and len(train) == 4  # 2 val per speaker


class FakeEncoder:
    def encode(self, wav16k):
        n = max((len(wav16k) - 400) // 320 + 1, 1)
        return np.zeros((n, 24), np.float32)


def test_preprocess_features(tmp_path):
    hps = tiny_hps()
    p = tmp_path / "clip.wav"
    _write_wav(p, hps.data.sampling_rate, 0.5)
    f0p = get_f0_predictor("yin", hps.data.hop_length, hps.data.sampling_rate)
    rng = np.random.default_rng(0)
    preprocess_features.process_one(str(p), hps, FakeEncoder(), f0p, use_diff=True, rng=rng)

    units = np.load(str(p) + ".soft.npy")
    f0, uv = np.load(str(p) + ".f0.npy", allow_pickle=True)
    spec = np.load(str(p) + ".spec.npy")
    vol = np.load(str(p) + ".vol.npy")
    mel = np.load(str(p) + ".mel.npy")
    n_frames = 4000 // hps.data.hop_length
    assert f0.shape == (n_frames,) and uv.shape == (n_frames,)
    assert spec.shape == (hps.data.filter_length // 2 + 1, n_frames)
    assert vol.shape == (n_frames,)
    assert mel.shape == (n_frames, hps.data.n_mel_channels)
    assert units.shape[0] == 24
    assert (np.load(str(p) + ".aug_vol.npy") >= 0).all()


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones((2, 2)), "c": np.zeros(3)}, "d": np.arange(4)}
    flat = flatten_params(tree)
    assert set(flat) == {"a/b", "a/c", "d"}
    rt = unflatten_params(flat)
    np.testing.assert_array_equal(rt["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(rt["d"], tree["d"])
