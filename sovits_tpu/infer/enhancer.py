"""NSF-HiFiGAN output enhancer (modules/enhancer.py:10-105 equivalent).

Re-vocodes the synthesizer output through the pretrained mel->wav
NSF-HiFiGAN: extract mel at an adaptively-shifted rate (adaptive_key shifts
formants by 2^(-key/12)), decode with the true f0, resample back.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..dsp.audio import resample
from ..models.diffusion.vocoder import NsfHifiGANVocoder


class Enhancer:
    def __init__(self, enhancer_type: str = "nsf-hifigan", ckpt: str | None = None,
                 config: dict | None = None):
        if enhancer_type != "nsf-hifigan":
            raise ValueError(f"unknown enhancer: {enhancer_type}")
        self.vocoder = NsfHifiGANVocoder(ckpt, config=config)

    def enhance(
        self,
        audio: np.ndarray,  # [T]
        sample_rate: int,
        f0: np.ndarray,  # [n_frames]
        hop_size: int,
        adaptive_key: float = 0,
        silence_front: float = 0,
    ) -> tuple[np.ndarray, int]:
        enh_sr = self.vocoder.sample_rate
        enh_hop = self.vocoder.hop_size

        start_frame = int(silence_front * sample_rate / hop_size)
        real_silence_front = start_frame * hop_size / sample_rate
        audio = audio[int(np.round(real_silence_front * sample_rate)) :]
        f0 = np.asarray(f0, np.float64)[start_frame:]

        adaptive_factor = 2.0 ** (-adaptive_key / 12.0)
        adaptive_sr = 100 * int(np.round(enh_sr / adaptive_factor / 100))
        real_factor = enh_sr / adaptive_sr

        audio_res = (
            audio if sample_rate == adaptive_sr else resample(audio, sample_rate, adaptive_sr)
        )
        n_frames = int(len(audio_res) // enh_hop + 1)

        f0_scaled = f0 * real_factor
        time_org = (hop_size / sample_rate) * np.arange(len(f0_scaled)) / real_factor
        time_frame = (enh_hop / enh_sr) * np.arange(n_frames)
        f0_res = np.interp(
            time_frame, time_org, f0_scaled, left=f0_scaled[0], right=f0_scaled[-1]
        ).astype(np.float32)

        # The adaptive-rate audio is analyzed AS IF at the enhancer rate —
        # that nominal-rate mismatch is the formant-shift trick
        # (enhancer.py:80-105: get_mel uses the enhancer's STFT params on
        # adaptive-rate audio), so no resample happens here.
        mel = self.vocoder.extract(audio_res[None], self.vocoder.sample_rate)
        out = self.vocoder.infer(mel, jnp.asarray(f0_res[None]))
        enhanced = np.asarray(out)[0, :, 0]

        if adaptive_sr != enh_sr:
            enhanced = resample(enhanced, adaptive_sr, enh_sr)
        if start_frame > 0:
            enhanced = np.pad(enhanced, (int(np.round(enh_sr * real_silence_front)), 0))
        return enhanced, enh_sr
