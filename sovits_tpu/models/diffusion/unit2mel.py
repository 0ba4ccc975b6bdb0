"""Unit2Mel: units + f0 + volume (+ speaker / aug-shift) -> mel via diffusion.

Equivalent of diffusion/unit2mel.py:61-166. The conditioning track is a sum
of linear embeddings; the decoder is the diffusion WaveNet driven by a
DiffusionSchedule. Explicit PRNG keys; spk-mix supported as a weight vector
over the speaker embedding table (unit2mel.py:148-161).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .gaussian import DiffusionSchedule
from .wavenet import DiffusionWaveNet


class Unit2Mel(nn.Module):
    input_channel: int = 768
    n_spk: int = 1
    use_pitch_aug: bool = False
    out_dims: int = 128
    n_layers: int = 20
    n_chans: int = 384
    n_hidden: int = 256
    timesteps: int = 1000
    k_step_max: int = 1000
    spec_min: float = -12.0
    spec_max: float = 2.0
    dtype: Any = jnp.float32

    @property
    def schedule(self) -> DiffusionSchedule:
        k = self.k_step_max if 0 < self.k_step_max < self.timesteps else self.timesteps
        return DiffusionSchedule(
            timesteps=self.timesteps,
            k_step=k,
            spec_min=self.spec_min,
            spec_max=self.spec_max,
        )

    def setup(self):
        self.unit_embed = nn.Dense(self.n_hidden, dtype=self.dtype)
        self.f0_embed = nn.Dense(self.n_hidden, dtype=self.dtype)
        self.volume_embed = nn.Dense(self.n_hidden, dtype=self.dtype)
        if self.use_pitch_aug:
            self.aug_shift_embed = nn.Dense(
                self.n_hidden, use_bias=False, dtype=self.dtype
            )
        if self.n_spk is not None and self.n_spk > 1:
            self.spk_embed = nn.Embed(self.n_spk, self.n_hidden, dtype=self.dtype)
        self.denoiser = DiffusionWaveNet(
            in_dims=self.out_dims,
            n_layers=self.n_layers,
            n_chans=self.n_chans,
            n_hidden=self.n_hidden,
            dtype=self.dtype,
        )

    def condition(
        self,
        units: jax.Array,  # [B, T, C]
        f0: jax.Array,  # [B, T]
        volume: jax.Array,  # [B, T]
        spk_id: jax.Array | None = None,  # int [B] or mix weights [B, S] / [B, T, S]
        aug_shift: jax.Array | None = None,  # [B]
    ) -> jax.Array:
        x = (
            self.unit_embed(units)
            + self.f0_embed(jnp.log(1.0 + f0 / 700.0)[..., None])
            + self.volume_embed(volume[..., None])
        )
        if self.n_spk is not None and self.n_spk > 1 and spk_id is not None:
            if jnp.issubdtype(spk_id.dtype, jnp.integer):
                x = x + self.spk_embed(spk_id)[:, None, :]
            else:
                table = self.spk_embed.embedding.astype(x.dtype)
                if spk_id.ndim == 2:  # static mix [B, S]
                    x = x + (spk_id @ table)[:, None, :]
                else:  # per-frame mix [B, T, S]
                    x = x + jnp.einsum("bts,sh->bth", spk_id, table)
        if self.use_pitch_aug and aug_shift is not None:
            x = x + self.aug_shift_embed(aug_shift[..., None] / 5.0)[:, None, :]
        return x

    def __call__(
        self,
        units,
        f0,
        volume,
        spk_id=None,
        aug_shift=None,
        gt_spec=None,  # [B, T, M]
        infer: bool = True,
        infer_speedup: int = 10,
        sampler: str = "dpm-solver++",  # the reference calls this `method`,
        # which collides with flax apply()'s reserved kwarg
        k_step: int = 300,
        rng: jax.Array | None = None,
    ):
        sched = self.schedule
        cond = self.condition(units, f0, volume, spk_id, aug_shift)

        def denoise_fn(x, t, c):
            return self.denoiser(x, t, c)

        if not infer:
            if rng is None:
                rng = self.make_rng("noise")
            rng_t, rng_n = jax.random.split(rng)
            spec = sched.norm_spec(gt_spec)
            t = jax.random.randint(rng_t, (units.shape[0],), 0, sched.k_step)
            noise = jax.random.normal(rng_n, spec.shape)
            return sched.p_losses(denoise_fn, spec, t, cond, noise)

        if gt_spec is not None and k_step > sched.k_step:
            raise ValueError(
                "shallow diffusion k_step exceeds the model's k_step_max "
                f"({k_step} > {sched.k_step})"  # unit2mel.py:141-145
            )
        if gt_spec is None and sched.k_step != self.timesteps:
            raise ValueError(
                "a k_step_max-limited model can only run shallow diffusion"
            )
        if rng is None:
            rng = self.make_rng("noise")
        return sched.sample(
            denoise_fn,
            cond,
            self.out_dims,
            gt_spec,
            k_step,
            infer_speedup,
            sampler,
            rng,
        )
