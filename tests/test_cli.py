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


TINY_VOCODER_CONFIG = {
    "sampling_rate": 8000, "num_mels": 16, "n_fft": 256, "win_size": 256,
    "hop_size": 64, "fmin": 40, "fmax": 4000,
    "upsample_rates": [4, 4, 4], "upsample_kernel_sizes": [8, 8, 8],
    "upsample_initial_channel": 32,
}


def test_preprocess_features(tmp_path):
    from sovits_tpu.models.diffusion import NsfHifiGANVocoder, nv_mel_spectrogram

    hps = tiny_hps()
    p = tmp_path / "clip.wav"
    _write_wav(p, hps.data.sampling_rate, 0.5)
    f0p = get_f0_predictor("yin", hps.data.hop_length, hps.data.sampling_rate)
    rng = np.random.default_rng(0)
    voc = NsfHifiGANVocoder(config=TINY_VOCODER_CONFIG)
    preprocess_features.process_one(
        str(p), hps, FakeEncoder(), f0p, use_diff=True, rng=rng, mel_extractor=voc
    )

    units = np.load(str(p) + ".soft.npy")
    f0, uv = np.load(str(p) + ".f0.npy", allow_pickle=True)
    spec = np.load(str(p) + ".spec.npy")
    vol = np.load(str(p) + ".vol.npy")
    mel = np.load(str(p) + ".mel.npy")
    n_frames = 4000 // hps.data.hop_length
    assert f0.shape == (n_frames,) and uv.shape == (n_frames,)
    assert spec.shape == (hps.data.filter_length // 2 + 1, n_frames)
    assert vol.shape == (n_frames,)
    # diffusion mel follows the *vocoder's* contract (128-mel nvSTFT in the
    # full-size config; 16 here), NOT the VITS n_mel_channels formula —
    # preprocess_hubert_f0.py:84-103
    assert mel.shape[1] == voc.dimension
    assert abs(mel.shape[0] - n_frames) <= 1
    assert units.shape[0] == 24
    assert (np.load(str(p) + ".aug_vol.npy") >= 0).all()

    # aug mel must have the keyshift actually applied: recompute with the
    # saved keyshift and the saved gain and compare
    aug_mel, keyshift = np.load(str(p) + ".aug_mel.npy", allow_pickle=True)
    assert aug_mel.shape[1] == voc.dimension
    assert float(keyshift) != 0.0
    vol_plain = np.load(str(p) + ".vol.npy")
    aug_vol = np.load(str(p) + ".aug_vol.npy")
    gain = np.median(aug_vol[vol_plain > 1e-6] / vol_plain[vol_plain > 1e-6])
    from sovits_tpu.train.data import load_wav

    wav, _sr = load_wav(str(p))
    import jax.numpy as jnp

    expect = np.asarray(nv_mel_spectrogram(
        jnp.asarray(wav[None] * gain), 8000, 256, 16, 64, 256, 40, 4000,
        keyshift=float(keyshift),
    )[0])
    t = min(expect.shape[0], aug_mel.shape[0])
    np.testing.assert_allclose(aug_mel[:t], expect[:t], rtol=1e-3, atol=1e-3)


def test_preprocess_to_diffusion_roundtrip(tmp_path, monkeypatch):
    """Run the real --use_diff preprocessing CLI, train the diffusion model on
    its artifacts, and round-trip through DiffusionRefiner (VERDICT r1 #2)."""
    import yaml

    import sovits_tpu.encoders
    from sovits_tpu.infer.diffusion_wrapper import DiffusionRefiner
    from sovits_tpu.train.diffusion import load_diffusion_config, train_diffusion

    hps = tiny_hps()
    paths = []
    for i in range(3):
        p = tmp_path / "data" / "spk0" / f"c{i}.wav"
        _write_wav(p, hps.data.sampling_rate, 0.5, freq=180.0 + 30 * i)
        paths.append(str(p))
    flist = tmp_path / "train.txt"
    flist.write_text("\n".join(paths) + "\n")
    hps.data["training_files"] = str(flist)
    hps.data["validation_files"] = str(flist)
    hps.model["speech_encoder"] = "fake"
    scfg.save_config(hps, tmp_path / "config.json")

    diff_cfg = {
        "data": {
            "sampling_rate": 8000, "block_size": 64, "duration": 0.256,
            "encoder_out_channels": 24,
            "training_files": str(flist), "validation_files": str(flist),
        },
        "model": {"n_layers": 2, "n_chans": 16, "n_hidden": 12, "timesteps": 20,
                  "k_step_max": 0, "n_spk": 2, "use_pitch_aug": True},
        "train": {"batch_size": 8, "interval_log": 1, "interval_val": 2, "lr": 1e-4},
        "infer": {"speedup": 4, "method": "dpm-solver++"},
        "env": {"expdir": str(tmp_path / "diffexp")},
        "vocoder": {"type": "nsf-hifigan", "ckpt": "missing",
                    "config": TINY_VOCODER_CONFIG},
        "spk": {"spk0": 0},
    }
    (tmp_path / "diffusion.yaml").write_text(yaml.safe_dump(diff_cfg))

    monkeypatch.setattr(
        sovits_tpu.encoders, "get_speech_encoder", lambda *a, **k: FakeEncoder()
    )
    preprocess_features.main([
        "-c", str(tmp_path / "config.json"),
        "--diffusion_config", str(tmp_path / "diffusion.yaml"),
        "--use_diff", "--f0_predictor", "yin",
    ])
    for p in paths:
        mel = np.load(p + ".mel.npy")
        assert mel.shape[1] == 16  # vocoder contract, not VITS n_mel_channels
        aug_mel, _ks = np.load(p + ".aug_mel.npy", allow_pickle=True)
        assert np.asarray(aug_mel).shape[1] == 16

    args = load_diffusion_config(tmp_path / "diffusion.yaml")
    train_diffusion(args, max_steps=2, vocoder_dim=16)
    model_npz = sorted((tmp_path / "diffexp").glob("model_*.npz"))[-1]

    refiner = DiffusionRefiner(str(model_npz), str(tmp_path / "diffusion.yaml"))

    class _StubSvc:
        target_sample = 8000
        hop_size = 64
        unit_interpolate_mode = "nearest"
        encoder = FakeEncoder()

    wav, _sr = __import__("sovits_tpu.train.data", fromlist=["load_wav"]).load_wav(paths[0])
    f0 = np.full(len(wav) // 64, 200.0, np.float32)
    units = np.load(paths[0] + ".soft.npy").T[: len(f0)]
    out = refiner.refine(_StubSvc(), wav, units, f0, None, np.int32(0), k_step=20)
    assert out.ndim == 1 and np.isfinite(out).all()


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones((2, 2)), "c": np.zeros(3)}, "d": np.arange(4)}
    flat = flatten_params(tree)
    assert set(flat) == {"a/b", "a/c", "d"}
    rt = unflatten_params(flat)
    np.testing.assert_array_equal(rt["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(rt["d"], tree["d"])


def test_preprocess_features_worker_pool(tmp_path, monkeypatch):
    """--workers N runs the host-DSP f0 pass in a process pool."""
    import sovits_tpu.encoders

    hps = tiny_hps()
    paths = []
    for i in range(4):
        p = tmp_path / "d" / f"w{i}.wav"
        _write_wav(p, hps.data.sampling_rate, 0.3, freq=200.0 + 20 * i)
        paths.append(str(p))
    flist = tmp_path / "fl.txt"
    flist.write_text("\n".join(paths) + "\n")
    hps.data["training_files"] = str(flist)
    hps.data["validation_files"] = str(flist)
    scfg.save_config(hps, tmp_path / "config.json")
    monkeypatch.setattr(
        sovits_tpu.encoders, "get_speech_encoder", lambda *a, **k: FakeEncoder()
    )
    preprocess_features.main([
        "-c", str(tmp_path / "config.json"), "--f0_predictor", "dio",
        "--workers", "2",
    ])
    for p in paths:
        f0, uv = np.load(p + ".f0.npy", allow_pickle=True)
        assert len(f0) == 2400 // hps.data.hop_length
        assert np.isfinite(np.asarray(f0, np.float64)).all()
