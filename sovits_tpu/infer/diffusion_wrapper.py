"""Shallow-diffusion refinement hook for the Svc facade.

Mirrors the diffusion branch of Svc.infer (infer_tool.py:299-328): extract
the gt mel of the VITS output at the vocoder rate, q-sample it to k_step,
denoise with Unit2Mel conditioned on units/f0/volume, decode with the
pretrained NSF-HiFiGAN.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


class DiffusionRefiner:
    def __init__(self, model_path: str, config_path: str | None = None):
        from ..models.diffusion import NsfHifiGANVocoder
        from ..train.diffusion import load_diffusion_config, load_torch_unit2mel

        config_path = config_path or str(Path(model_path).parent / "config.yaml")
        self.args = load_diffusion_config(config_path)
        vocoder_cfg = self.args.vocoder.config.to_dict() if self.args.vocoder.config else None
        self.vocoder = NsfHifiGANVocoder(
            self.args.vocoder.ckpt if Path(str(self.args.vocoder.ckpt)).exists() else None,
            config=vocoder_cfg,
        )
        if str(model_path).endswith(".npz"):
            from ..cli.tools import unflatten_params
            from ..train.diffusion import build_unit2mel

            self.model = build_unit2mel(self.args, self.vocoder.dimension)
            self.variables = {
                "params": jax.tree.map(
                    jnp.asarray, unflatten_params(dict(np.load(model_path)))
                )
            }
        else:
            self.model, self.variables = load_torch_unit2mel(
                model_path, self.args, self.vocoder.dimension
            )

    def refine(self, svc, audio: np.ndarray, units: np.ndarray, f0: np.ndarray,
               vol, spk, k_step: int, second_encoding: bool = False,
               seed: int = 52468) -> np.ndarray:
        from ..dsp import stft as dsp_stft
        from ..dsp.audio import repeat_expand, resample

        if second_encoding:
            audio16k = resample(audio, svc.target_sample, 16000)
            units = np.asarray(svc.encoder.encode(audio16k))
            units = np.asarray(
                repeat_expand(jnp.asarray(units), len(f0), svc.unit_interpolate_mode)
            )
        if vol is None:
            vol = np.asarray(
                dsp_stft.energy(jnp.asarray(audio[None]), svc.hop_size)
            )

        gt_mel = self.vocoder.extract(audio[None], svc.target_sample)
        t = int(gt_mel.shape[1])
        n = min(t, len(f0), units.shape[0], vol.shape[-1])

        mel = self.model.apply(
            self.variables,
            jnp.asarray(units[None, :n]),
            jnp.asarray(f0[None, :n].astype(np.float32)),
            jnp.asarray(vol.reshape(1, -1)[:, :n].astype(np.float32)),
            spk_id=jnp.asarray(spk).reshape(-1).astype(jnp.int32)
            if np.issubdtype(np.asarray(spk).dtype, np.integer)
            else jnp.asarray(spk),
            gt_spec=gt_mel[:, :n],
            infer=True,
            infer_speedup=self.args.infer.speedup,
            sampler=self.args.infer.method,
            k_step=k_step,
            rngs={"noise": jax.random.PRNGKey(seed)},
        )
        out = self.vocoder.infer(mel, jnp.asarray(f0[None, :n].astype(np.float32)))
        return np.asarray(out)[0, :, 0]
