"""Diffusion vocoder facade: mel-driven pretrained NSF-HiFiGAN.

Equivalent of diffusion/vocoder.py:8-95 + the standalone generator
(vdecoder/nsf_hifigan/models.py:221-278): ``extract`` produces mels at the
vocoder's rate with the nvSTFT contract (keyshift-capable, asymmetric pad,
1e-9 magnitude floor, log clamp 1e-5 — nvSTFT.py:71-125), ``infer`` decodes
mel+f0 with the mel-conditioned Generator (no speaker embedding).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ...dsp.audio import resample
from ...dsp.mel import hann_window, mel_filterbank
from ...dsp.stft import frame_signal
from ..nsf_hifigan import Generator


def nv_mel_spectrogram(
    y: jax.Array,  # [B, L]
    sample_rate: int = 44100,
    n_fft: int = 2048,
    n_mels: int = 128,
    hop_length: int = 512,
    win_length: int = 2048,
    fmin: float = 40.0,
    fmax: float = 16000.0,
    keyshift: float = 0.0,
) -> jax.Array:
    """nvSTFT.get_mel (vdecoder/nsf_hifigan/nvSTFT.py:71-125) -> [B, T, M].

    keyshift scales the analysis window by 2^(keyshift/12) and renormalizes
    bins (pitch augmentation for diffusion training).
    """
    factor = 2 ** (keyshift / 12.0)
    n_fft_new = int(np.round(n_fft * factor))
    win_new = int(np.round(win_length * factor))
    hop_new = int(np.round(hop_length * factor))

    y = y.astype(jnp.float32)
    pad_left = (win_new - hop_new) // 2
    pad_right = max((win_new - hop_new + 1) // 2, win_new - y.shape[-1] - pad_left)
    mode = "reflect" if pad_right < y.shape[-1] else "constant"
    y = jnp.pad(y, ((0, 0), (pad_left, pad_right)), mode=mode)

    frames = frame_signal(y, win_new, hop_new)
    frames = frames * jnp.asarray(hann_window(win_new))
    spec = jnp.fft.rfft(frames, n=n_fft_new, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)  # [B,T,F_new]
    if keyshift != 0:
        size = n_fft // 2 + 1
        if mag.shape[-1] < size:
            mag = jnp.pad(mag, ((0, 0), (0, 0), (0, size - mag.shape[-1])))
        mag = mag[..., :size] * (win_length / win_new)
    fbank = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.matmul(mag, fbank, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


DEFAULT_NSF_CONFIG = {
    # the published 44.1 kHz community nsf_hifigan checkpoint config
    "sampling_rate": 44100,
    "num_mels": 128,
    "n_fft": 2048,
    "win_size": 2048,
    "hop_size": 512,
    "fmin": 40,
    "fmax": 16000,
    "resblock": "1",
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "upsample_rates": [8, 8, 2, 2, 2],
    "upsample_initial_channel": 512,
    "upsample_kernel_sizes": [16, 16, 4, 4, 4],
}


class NsfHifiGANVocoder:
    """Pretrained mel->wav NSF-HiFiGAN (vocoder.type 'nsf-hifigan').

    ``ckpt_path`` points at the torch checkpoint (dict with 'generator');
    config.json next to it is honored (vdecoder/nsf_hifigan/models.py:17-36).
    log10 variant: mel is scaled by log10(e) before decoding (vocoder.py:87-95).
    """

    def __init__(self, ckpt_path: str | None = None, log10: bool = False, config: dict | None = None):
        self.h = dict(DEFAULT_NSF_CONFIG)
        if ckpt_path:
            cfg = Path(ckpt_path).parent / "config.json"
            if cfg.exists():
                self.h.update(json.loads(cfg.read_text()))
        if config:
            self.h.update(config)
        self.log10 = log10

        self.net = Generator(
            sampling_rate=self.h["sampling_rate"],
            inter_channels=self.h["num_mels"],
            resblock=self.h["resblock"],
            resblock_kernel_sizes=tuple(self.h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(map(tuple, self.h["resblock_dilation_sizes"])),
            upsample_rates=tuple(self.h["upsample_rates"]),
            upsample_initial_channel=self.h["upsample_initial_channel"],
            upsample_kernel_sizes=tuple(self.h["upsample_kernel_sizes"]),
            gin_channels=0,
        )
        # Params are loaded lazily: `extract` (mel analysis, used by the
        # preprocessing CLI) needs only the config, not generator weights.
        self._ckpt_path = ckpt_path
        self._params = None
        self._infer = jax.jit(
            lambda params, mel, f0: self.net.apply({"params": params}, mel, f0, rng=None)
        )

    @property
    def params(self) -> dict:
        if self._params is None:
            if self._ckpt_path and Path(self._ckpt_path).exists():
                self._params = self._load(self._ckpt_path)
            else:
                # fresh init (tests / training-from-scratch)
                t = 8
                self._params = self.net.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, t, self.h["num_mels"])),
                    jnp.zeros((1, t)),
                )["params"]
        return self._params

    @params.setter
    def params(self, value):
        self._params = value

    def _load(self, path: str) -> dict:
        import torch

        from ...convert import from_torch as ft

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: v.float().numpy() for k, v in ckpt["generator"].items()}
        return jax.tree.map(
            jnp.asarray,
            ft.nsf_hifigan_generator(
                sd,
                n_upsamples=len(self.h["upsample_rates"]),
                n_kernels=len(self.h["resblock_kernel_sizes"]),
                resblock_type=self.h["resblock"],
            ),
        )

    @property
    def sample_rate(self) -> int:
        return self.h["sampling_rate"]

    @property
    def hop_size(self) -> int:
        return self.h["hop_size"]

    @property
    def dimension(self) -> int:
        return self.h["num_mels"]

    def extract(self, audio: np.ndarray, sample_rate: int, keyshift: float = 0.0) -> jax.Array:
        """audio [B, L] at sample_rate -> mel [B, T, M] at vocoder rate."""
        audio = np.asarray(audio, np.float32)
        if sample_rate != self.sample_rate:
            audio = resample(audio, sample_rate, self.sample_rate)
        return nv_mel_spectrogram(
            jnp.asarray(audio),
            self.sample_rate,
            self.h["n_fft"],
            self.h["num_mels"],
            self.h["hop_size"],
            self.h["win_size"],
            self.h["fmin"],
            self.h["fmax"],
            keyshift,
        )

    def infer(self, mel: jax.Array, f0: jax.Array) -> jax.Array:
        """mel [B, T, M] + f0 [B, T] -> wav [B, T*hop, 1]."""
        f0 = f0[:, : mel.shape[1]]
        if self.log10:
            mel = 0.434294 * mel
        return self._infer(self.params, mel, f0)
