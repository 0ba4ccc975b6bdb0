"""Shared tiny config + synthetic dataset helpers for fast CPU tests."""

import numpy as np
from scipy.io import wavfile

import jax.numpy as jnp

from sovits_tpu import config as scfg
from sovits_tpu.dsp import stft as dsp_stft

TINY_OVERRIDES = {
    "train.segment_size": 256,
    "train.batch_size": 8,
    "data.sampling_rate": 8000,
    "data.filter_length": 128,
    "data.hop_length": 64,
    "data.win_length": 128,
    "data.n_mel_channels": 20,
    "data.mel_fmax": 4000,
    "data.pad_to_frames": 16,
    "model.inter_channels": 32,
    "model.hidden_channels": 32,
    "model.filter_channels": 64,
    "model.n_layers": 1,
    "model.upsample_rates": [4, 4, 4],
    "model.upsample_kernel_sizes": [8, 8, 8],
    "model.upsample_initial_channel": 32,
    "model.gin_channels": 16,
    "model.ssl_dim": 24,
    "model.n_speakers": 4,
    "model.n_flow_layer": 2,
}


def tiny_hps(**extra):
    o = dict(TINY_OVERRIDES)
    o.update(extra)
    return scfg.default_config(**o)


def make_synthetic_dataset(root, hps, n_speakers=2, n_per_spk=3, seconds=0.5):
    """Write tiny wavs + preprocessed artifacts + filelists under root."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    sr = hps.data.sampling_rate
    hop = hps.data.hop_length
    paths = []
    spk_map = {}
    for s in range(n_speakers):
        spk = f"spk{s}"
        spk_map[spk] = s
        d = root / spk
        d.mkdir(exist_ok=True)
        for i in range(n_per_spk):
            n = int(sr * seconds)
            n -= n % hop
            t = np.arange(n) / sr
            freq = 150.0 + 50 * s + 10 * i
            wav = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
            p = d / f"clip{i}.wav"
            wavfile.write(p, sr, (wav * 32767).astype(np.int16))
            frames = n // hop
            f0 = np.full(frames, freq, np.float32)
            uv = np.ones(frames, np.float32)
            np.save(str(p) + ".f0.npy", np.array([f0, uv], dtype=object))
            spec = np.asarray(
                dsp_stft.spectrogram(
                    jnp.asarray(wav[None]),
                    hps.data.filter_length,
                    hop,
                    hps.data.win_length,
                )[0]
            )  # [T, F]
            np.save(str(p) + ".spec.npy", spec.T)  # store [F, T] like reference
            units = rng.standard_normal((hps.model.ssl_dim, frames)).astype(np.float32)
            np.save(str(p) + ".soft.npy", units)
            vol = np.abs(wav).reshape(frames, hop).mean(axis=1)
            np.save(str(p) + ".vol.npy", vol.astype(np.float32))
            paths.append(str(p))

    train_list = root / "train.txt"
    val_list = root / "val.txt"
    train_list.write_text("\n".join(paths[:-1]) + "\n")
    val_list.write_text(paths[-1] + "\n")
    hps.data["training_files"] = str(train_list)
    hps.data["validation_files"] = str(val_list)
    hps["spk"] = scfg.HParams(**spk_map)
    return paths
