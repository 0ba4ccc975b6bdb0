"""Diffusion trainer + refiner integration tests (tiny shapes, CPU mesh)."""

from pathlib import Path

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from sovits_tpu.models.diffusion import NsfHifiGANVocoder, nv_mel_spectrogram
from sovits_tpu.train.diffusion import (
    DiffusionDataset,
    build_unit2mel,
    load_diffusion_config,
    measure_rtf,
    train_diffusion,
)


def _write_diff_dataset(root, n_files=3, frames=24, hop=64, sr=8000, units_dim=8, mels=16):
    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)
    spk = root / "spk0"
    spk.mkdir()
    paths = []
    for i in range(n_files):
        p = spk / f"c{i}.wav"
        p.touch()
        np.save(str(p) + ".f0.npy", np.array(
            [np.full(frames, 200.0, np.float32), np.ones(frames, np.float32)], dtype=object
        ), allow_pickle=True)
        np.save(str(p) + ".vol.npy", np.abs(rng.standard_normal(frames)).astype(np.float32) * 0.1)
        np.save(str(p) + ".mel.npy", (rng.standard_normal((frames, mels)) * 2 - 6).astype(np.float32))
        np.save(str(p) + ".soft.npy", rng.standard_normal((units_dim, frames)).astype(np.float32))
        np.save(str(p) + ".aug_mel.npy", np.array(
            [(rng.standard_normal((frames, mels)) * 2 - 6).astype(np.float32), 2.0], dtype=object
        ), allow_pickle=True)
        np.save(str(p) + ".aug_vol.npy", np.abs(rng.standard_normal(frames)).astype(np.float32) * 0.1)
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths) + "\n")
    return paths


def _tiny_diff_config(tmp_path):
    cfg = {
        "data": {
            "sampling_rate": 8000,
            "block_size": 64,
            "duration": 0.128,  # 16 frames
            "encoder_out_channels": 8,
            "training_files": str(tmp_path / "data" / "train.txt"),
            "validation_files": str(tmp_path / "data" / "train.txt"),
        },
        "model": {"n_layers": 2, "n_chans": 16, "n_hidden": 12, "timesteps": 20,
                  "k_step_max": 0, "n_spk": 2, "use_pitch_aug": True},
        "train": {"batch_size": 8, "interval_log": 1, "interval_val": 4, "lr": 1e-4},
        "infer": {"speedup": 4, "method": "dpm-solver++"},
        "env": {"expdir": str(tmp_path / "exp")},
        "spk": {"spk0": 0},
    }
    path = tmp_path / "diffusion.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return load_diffusion_config(path)


def test_diffusion_dataset_and_trainer(tmp_path):
    args = _tiny_diff_config(tmp_path)
    _write_diff_dataset(tmp_path / "data", frames=24, hop=64, mels=16, units_dim=8)

    ds = DiffusionDataset(args.data.training_files, args)
    ex = ds.example(0, np.random.default_rng(0))
    assert ex["units"].shape == (ds.frames, 8)
    assert ex["mel"].shape == (ds.frames, 16)

    params = train_diffusion(args, max_steps=3, vocoder_dim=16)
    assert params is not None
    assert (tmp_path / "exp" / "model_3.npz").exists()
    assert (tmp_path / "exp" / "metrics.jsonl").exists()

    model = build_unit2mel(args, vocoder_dim=16)
    rtf = measure_rtf(model, {"params": jax.device_get(params)}, ds, args, n_clips=1)
    assert rtf > 0


def test_nv_mel_extractor_shapes_and_keyshift():
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((1, 8000)) * 0.1, jnp.float32)
    mel = nv_mel_spectrogram(wav, 8000, 512, 20, 128, 512, 40, 4000)
    assert mel.shape[2] == 20
    assert np.isfinite(np.asarray(mel)).all()
    mel_shift = nv_mel_spectrogram(wav, 8000, 512, 20, 128, 512, 40, 4000, keyshift=2.0)
    assert mel_shift.shape[2] == 20
    t = min(mel.shape[1], mel_shift.shape[1])
    assert not np.allclose(np.asarray(mel)[:, :t], np.asarray(mel_shift)[:, :t])


def test_vocoder_facade_fresh_init():
    voc = NsfHifiGANVocoder(
        config={
            "sampling_rate": 8000,
            "num_mels": 16,
            "n_fft": 256,
            "win_size": 256,
            "hop_size": 64,
            "fmin": 40,
            "fmax": 4000,
            "upsample_rates": [4, 4, 4],
            "upsample_kernel_sizes": [8, 8, 8],
            "upsample_initial_channel": 32,
        }
    )
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(64 * 20) * 0.1).astype(np.float32)
    mel = voc.extract(wav[None], 8000)
    assert mel.shape == (1, 20, 16)
    f0 = jnp.full((1, mel.shape[1]), 200.0)
    out = voc.infer(mel, f0)
    assert out.shape == (1, mel.shape[1] * 64, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_only_diffusion_end_to_end(tmp_path):
    """Train a tiny diffusion model, then run the only-diffusion Svc path."""
    import yaml as _yaml
    from scipy.io import wavfile as _wavfile

    from tests.conftest import FakeEncoder
    from tests.tiny import make_synthetic_dataset, tiny_hps

    from sovits_tpu import config as scfg
    from sovits_tpu.infer.svc import Svc
    from sovits_tpu.models import MultiPeriodDiscriminator, factory
    from sovits_tpu.train import checkpoint as ckpt_lib
    from sovits_tpu.train.step import create_train_state, make_optimizer

    # tiny VITS checkpoint + config (the Svc shell still needs one)
    hps = tiny_hps()
    make_synthetic_dataset(tmp_path / "data", hps, n_per_spk=1)
    scfg.save_config(hps, tmp_path / "config.json")
    syn = factory.build_synthesizer(hps)
    g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
    d_params = factory.init_discriminator_params(
        MultiPeriodDiscriminator(), jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
    )
    tx = make_optimizer(hps)
    mgr = ckpt_lib.CheckpointManager(tmp_path / "ckpt", keep=1)
    mgr.save(0, create_train_state(g_params, d_params, tx, tx), extra={"epoch": 0})
    mgr.close()

    # tiny diffusion model matching the same 8 kHz / hop-64 geometry,
    # 16-mel vocoder built from config (fresh init)
    mels = 16
    diff_cfg = {
        "data": {
            "sampling_rate": 8000, "block_size": 64, "duration": 0.128,
            "encoder_out_channels": 24,
            "training_files": str(tmp_path / "difftrain.txt"),
        },
        "model": {"n_layers": 2, "n_chans": 16, "n_hidden": 12, "timesteps": 20,
                  "k_step_max": 0, "n_spk": 2, "use_pitch_aug": False},
        "train": {"batch_size": 8, "interval_log": 1, "interval_val": 2, "lr": 1e-4},
        "infer": {"speedup": 4, "method": "dpm-solver++"},
        "env": {"expdir": str(tmp_path / "diffexp")},
        "vocoder": {"type": "nsf-hifigan", "ckpt": "missing", "config": {
            "sampling_rate": 8000, "num_mels": mels, "n_fft": 256, "win_size": 256,
            "hop_size": 64, "fmin": 40, "fmax": 4000,
            "upsample_rates": [4, 4, 4], "upsample_kernel_sizes": [8, 8, 8],
            "upsample_initial_channel": 32,
        }},
        "spk": {"spk0": 0},
    }
    (tmp_path / "diffusion.yaml").write_text(_yaml.safe_dump(diff_cfg))
    _write_diff_dataset(tmp_path / "diffdata", n_files=3, frames=24, hop=64,
                        sr=8000, units_dim=24, mels=mels)
    (tmp_path / "difftrain.txt").write_text(
        "\n".join(str(p) for p in sorted((tmp_path / "diffdata" / "spk0").glob("*.wav"))) + "\n"
    )
    from sovits_tpu.train.diffusion import load_diffusion_config, train_diffusion

    args = load_diffusion_config(tmp_path / "diffusion.yaml")
    train_diffusion(args, max_steps=2, vocoder_dim=mels)
    model_npz = sorted((tmp_path / "diffexp").glob("model_*.npz"))[-1]

    svc = Svc(
        str(tmp_path / "ckpt"), str(tmp_path / "config.json"), encoder=FakeEncoder(),
        only_diffusion=True,
        diffusion_model_path=str(model_npz),
        diffusion_config_path=str(tmp_path / "diffusion.yaml"),
    )
    sr = 8000
    t = np.arange(sr // 2) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audio, n_samples, n_frames = svc.infer("spk0", 0, wav, sr=sr, f0_predictor="yin", k_step=20)
    assert np.isfinite(audio).all()
    assert n_frames == len(wav) // 64


def test_diffusion_trainer_resume_and_val(tmp_path):
    """Resume restores params+opt_state and continues the step count
    (logger/utils.py:102-127 semantics); val loss + RTF are logged."""
    import json

    args = _tiny_diff_config(tmp_path)
    _write_diff_dataset(tmp_path / "data", frames=24, hop=64, mels=16, units_dim=8)

    train_diffusion(args, max_steps=4, vocoder_dim=16)
    assert (tmp_path / "exp" / "model_4.npz").exists()
    assert (tmp_path / "exp" / "ckpt").exists()

    # resume: runs only steps 5..6
    train_diffusion(args, max_steps=6, vocoder_dim=16)
    assert (tmp_path / "exp" / "model_6.npz").exists()

    metrics = [json.loads(line) for line in
               (tmp_path / "exp" / "metrics.jsonl").read_text().splitlines()]
    keys = {k for m in metrics for k in m}
    assert "loss/val_diffusion" in keys and "val_rtf" in keys
    # steps_per_sec must reflect this run's steps, not cumulative/elapsed
    rates = [m["steps_per_sec"] for m in metrics if "steps_per_sec" in m]
    assert all(r > 0 for r in rates)


def test_diffusion_dataset_ram_cache(tmp_path):
    args = _tiny_diff_config(tmp_path)
    paths = _write_diff_dataset(tmp_path / "data", frames=24, hop=64, mels=16, units_dim=8)
    ds = DiffusionDataset(args.data.training_files, args, cache_all_data=True)
    assert ds._cache is not None and len(ds._cache) == len(paths)
    ex = ds.example(0, np.random.default_rng(0))
    # delete the files: cached dataset must still serve examples
    for p in paths:
        for suffix in (".f0.npy", ".vol.npy", ".mel.npy", ".soft.npy"):
            (tmp_path / "data" / "spk0" / (Path(p).name + suffix)).unlink()
    from pathlib import Path as _P  # noqa
    ex2 = ds.example(0, np.random.default_rng(0))
    np.testing.assert_array_equal(ex["units"], ex2["units"])
