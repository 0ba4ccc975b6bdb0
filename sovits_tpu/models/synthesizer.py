"""The SoftVC-VITS synthesizer: content+f0+speaker -> waveform.

Functional equivalent of the reference's SynthesizerTrn (models.py:339-533)
with its sub-encoders:

- ``ContentEncoder``  (prior, models.py:128-162): coarse-f0 embedding +
  windowed relative-attention transformer -> (m_p, logs_p),
- ``PosteriorEncoder`` (models.py:95-125): linear-spec -> 16-layer WN ->
  (m_q, logs_q), speaker-conditioned,
- ``F0Decoder``        (models.py:296-336): causal-FFT lf0 predictor,
- flow couplings and the NSF-HiFiGAN decoder.

TPU-first deltas from the reference (semantics preserved):
- explicit PRNG keys instead of global torch seeding (models.py:498-501),
- the training forward does not materialize the unused prior sample z_ptemp
  (models.py:483 draws it and drops it),
- random segment slicing runs in-graph via vmapped dynamic_slice,
- speaker conditioning g is [B, 1, gin] (or [B, T, gin] for per-frame
  speaker mixes — the EnableCharacterMix path, models.py:456-461,505-509).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dsp.f0 import f0_to_coarse, f0_to_lf0, lf0_to_f0, normalize_f0
from ..dsp.sequence import rand_slice_segments_with_pitch, sequence_mask
from ..nn.attention import FFT, Encoder
from ..nn.conv import Conv1d
from ..nn.flows import ResidualCouplingBlock, TransformerCouplingBlock
from ..nn.wavenet import WaveNet
from .nsf_hifigan import Generator


class ContentEncoder(nn.Module):
    """Prior encoder over content units (TextEncoder, models.py:128-162)."""

    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, H]
        x_mask: jax.Array,  # [B, T, 1]
        f0_coarse: jax.Array,  # [B, T] int bins
        noise_scale: float = 1.0,
        rng: jax.Array | None = None,
        deterministic: bool = True,
    ):
        x = x + nn.Embed(
            256, self.hidden_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="f0_emb"
        )(f0_coarse)
        x = Encoder(
            hidden_channels=self.hidden_channels,
            filter_channels=self.filter_channels,
            n_heads=self.n_heads,
            n_layers=self.n_layers,
            kernel_size=self.kernel_size,
            p_dropout=self.p_dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="enc",
        )(x * x_mask, x_mask, deterministic=deterministic)
        stats = Conv1d(
            features=self.out_channels * 2,
            kernel_size=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if rng is not None:
            z = (m + jax.random.normal(rng, m.shape, m.dtype) * jnp.exp(logs) * noise_scale) * x_mask
        else:
            z = m * x_mask
        return z, m, logs


class PosteriorEncoder(nn.Module):
    """Linear-spec -> WN -> gaussian posterior (Encoder, models.py:95-125)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        spec: jax.Array,  # [B, T, F]
        lengths: jax.Array,  # [B]
        g: jax.Array | None = None,
        rng: jax.Array | None = None,
    ):
        x_mask = sequence_mask(lengths, spec.shape[1])[..., None].astype(spec.dtype)
        x = Conv1d(
            features=self.hidden_channels,
            kernel_size=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pre",
        )(spec) * x_mask
        x = WaveNet(
            hidden_channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate,
            n_layers=self.n_layers,
            gin_channels=self.gin_channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="enc",
        )(x, x_mask, g=g)
        stats = Conv1d(
            features=self.out_channels * 2,
            kernel_size=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if rng is not None:
            z = (m + jax.random.normal(rng, m.shape, m.dtype) * jnp.exp(logs)) * x_mask
        else:
            z = m * x_mask
        return z, m, logs, x_mask


class F0Decoder(nn.Module):
    """Causal-FFT lf0 predictor (models.py:296-336)."""

    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    spk_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, H] (caller stop-gradients)
        norm_f0: jax.Array,  # [B, T, 1]
        x_mask: jax.Array,
        spk_emb: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        x = jax.lax.stop_gradient(x)
        if spk_emb is not None:
            x = x + Conv1d(
                features=self.hidden_channels,
                kernel_size=1,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="cond",
            )(spk_emb)
        x = x + Conv1d(
            features=self.hidden_channels,
            kernel_size=3,
            padding=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="f0_prenet",
        )(norm_f0)
        x = Conv1d(
            features=self.hidden_channels,
            kernel_size=3,
            padding=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="prenet",
        )(x) * x_mask
        x = FFT(
            hidden_channels=self.hidden_channels,
            filter_channels=self.filter_channels,
            n_heads=self.n_heads,
            n_layers=self.n_layers,
            kernel_size=self.kernel_size,
            p_dropout=self.p_dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="decoder",
        )(x * x_mask, x_mask, deterministic=deterministic)
        x = Conv1d(
            features=self.out_channels,
            kernel_size=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x) * x_mask
        return x


class Synthesizer(nn.Module):
    """Full SVC synthesizer (SynthesizerTrn, models.py:339-533)."""

    spec_channels: int = 1025
    segment_size: int = 20  # latent frames (segment_samples // hop)
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (8, 8, 2, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4, 4)
    gin_channels: int = 768
    ssl_dim: int = 768
    n_speakers: int = 200
    sampling_rate: int = 44100
    vol_embedding: bool = False
    use_depthwise_conv: bool = False
    use_automatic_f0_prediction: bool = True
    flow_share_parameter: bool = False
    n_flow_layer: int = 4
    n_layers_trans_flow: int = 3
    use_transformer_flow: bool = False
    n_layers_q: int = 16  # posterior WN depth (reference hardcodes 16, models.py:437)
    vocoder_name: str = "nsf-hifigan"  # or "nsf-snake-hifigan" (models.py:426-435)
    fused_tail: bool = False  # Pallas fused vocoder tail (inference engines)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.emb_g = nn.Embed(
            self.n_speakers, self.gin_channels, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.emb_uv = nn.Embed(
            2, self.hidden_channels, dtype=self.dtype, param_dtype=self.param_dtype
        )
        if self.vol_embedding:
            self.emb_vol = nn.Dense(
                self.hidden_channels, dtype=self.dtype, param_dtype=self.param_dtype
            )
        self.pre = Conv1d(
            features=self.hidden_channels,
            kernel_size=5,
            padding=2,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.enc_p = ContentEncoder(
            out_channels=self.inter_channels,
            hidden_channels=self.hidden_channels,
            filter_channels=self.filter_channels,
            n_heads=self.n_heads,
            n_layers=self.n_layers,
            kernel_size=self.kernel_size,
            p_dropout=self.p_dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.enc_q = PosteriorEncoder(
            in_channels=self.spec_channels,
            out_channels=self.inter_channels,
            hidden_channels=self.hidden_channels,
            kernel_size=5,
            dilation_rate=1,
            n_layers=self.n_layers_q,
            gin_channels=self.gin_channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.use_transformer_flow:
            # models.py:439: n_flows = n_flow_layer, depth = n_layers_trans_flow
            self.flow = TransformerCouplingBlock(
                channels=self.inter_channels,
                hidden_channels=self.hidden_channels,
                filter_channels=self.filter_channels,
                n_heads=self.n_heads,
                n_layers=self.n_layers_trans_flow,
                kernel_size=5,
                p_dropout=self.p_dropout,
                n_flows=self.n_flow_layer,
                gin_channels=self.gin_channels,
                share_parameter=self.flow_share_parameter,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
        else:
            # models.py:441: always 4 couplings; n_flow_layer is each WN's depth
            self.flow = ResidualCouplingBlock(
                channels=self.inter_channels,
                hidden_channels=self.hidden_channels,
                kernel_size=5,
                dilation_rate=1,
                n_layers=self.n_flow_layer,
                n_flows=4,
                gin_channels=self.gin_channels,
                share_parameter=self.flow_share_parameter,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
        if self.use_automatic_f0_prediction:
            self.f0_decoder = F0Decoder(
                out_channels=1,
                hidden_channels=self.hidden_channels,
                filter_channels=self.filter_channels,
                n_heads=self.n_heads,
                n_layers=self.n_layers,
                kernel_size=self.kernel_size,
                p_dropout=self.p_dropout,
                spk_channels=self.gin_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
        dec_cls = Generator
        if self.vocoder_name == "nsf-snake-hifigan":
            from .snake_hifigan import SnakeGenerator

            dec_cls = SnakeGenerator
        dec_extra = (
            {}
            if dec_cls is not Generator
            else {"separable": self.use_depthwise_conv, "fused_tail": self.fused_tail}
        )
        self.dec = dec_cls(
            sampling_rate=self.sampling_rate,
            inter_channels=self.inter_channels,
            resblock=self.resblock,
            resblock_kernel_sizes=tuple(self.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(map(tuple, self.resblock_dilation_sizes)),
            upsample_rates=tuple(self.upsample_rates),
            upsample_initial_channel=self.upsample_initial_channel,
            upsample_kernel_sizes=tuple(self.upsample_kernel_sizes),
            gin_channels=self.gin_channels,
            dtype=self.dtype,
            **dec_extra,
        )

    def _speaker_embedding(self, spk: jax.Array) -> jax.Array:
        """int ids [B] -> [B, 1, gin]; float mix [B, T, S] -> [B, T, gin]."""
        if jnp.issubdtype(spk.dtype, jnp.integer):
            if spk.ndim == 2:  # [B, 1]
                spk = spk[:, 0]
            return self.emb_g(spk)[:, None, :]
        # per-frame speaker mix: weights @ embedding table (models.py:505-509)
        return jnp.einsum("bts,sg->btg", spk, self.emb_g.embedding.astype(spk.dtype))

    def _prenet(self, c, uv, vol, x_mask):
        vol_emb = (
            self.emb_vol(vol[..., None])
            if (self.vol_embedding and vol is not None)
            else 0.0
        )
        return self.pre(c) * x_mask + self.emb_uv(uv.astype(jnp.int32)) + vol_emb

    def __call__(
        self,
        c: jax.Array,  # [B, T, ssl_dim] content units
        f0: jax.Array,  # [B, T] Hz
        uv: jax.Array,  # [B, T] voiced flag
        spec: jax.Array,  # [B, T, spec_channels]
        spk: jax.Array,  # [B] speaker ids
        c_lengths: jax.Array,  # [B]
        vol: jax.Array | None = None,  # [B, T]
        deterministic: bool = False,
    ):
        """Training forward (models.py:463-493)."""
        g = self._speaker_embedding(spk)
        x_mask = sequence_mask(c_lengths, c.shape[1])[..., None].astype(c.dtype)
        x = self._prenet(c, uv, vol, x_mask)

        if self.use_automatic_f0_prediction:
            lf0 = f0_to_lf0(f0)[..., None]  # [B, T, 1]
            norm_lf0 = normalize_f0(
                lf0, x_mask, uv, rng=None if deterministic else self.make_rng("noise")
            )
            pred_lf0 = self.f0_decoder(
                x, norm_lf0, x_mask, spk_emb=g, deterministic=deterministic
            )
        else:
            lf0 = norm_lf0 = pred_lf0 = jnp.zeros(())

        # prior stats (the reference's unused prior sample is not drawn)
        _, m_p, logs_p = self.enc_p(
            x, x_mask, f0_to_coarse(f0), rng=None, deterministic=deterministic
        )
        z, m_q, logs_q, spec_mask = self.enc_q(
            spec, c_lengths, g=g,
            rng=None if deterministic else self.make_rng("noise"),
        )
        z_p = self.flow(z, spec_mask, g=g, deterministic=deterministic)

        if deterministic:
            ids_slice = jnp.zeros((c.shape[0],), jnp.int32)
            z_slice = z[:, : self.segment_size]
            pitch_slice = f0[:, : self.segment_size]
        else:
            z_slice, pitch_slice, ids_slice = rand_slice_segments_with_pitch(
                self.make_rng("slice"), z, f0, c_lengths, self.segment_size
            )
        o = self.dec(
            z_slice,
            pitch_slice,
            g=g,
            rng=None if deterministic else self.make_rng("noise"),
        )
        return o, ids_slice, spec_mask, (z, z_p, m_p, logs_p, m_q, logs_q), pred_lf0, norm_lf0, lf0

    def infer(
        self,
        c: jax.Array,
        f0: jax.Array,
        uv: jax.Array,
        spk: jax.Array,
        noise_scale: float = 0.35,
        predict_f0: bool = False,
        vol: jax.Array | None = None,
        sample_noise: bool = True,
        lengths: jax.Array | None = None,
    ):
        """Inference (models.py:495-532). Returns (wav [B, T_samples, 1], f0).

        ``lengths`` masks padded frames — inputs are bucketed/padded to fixed
        lengths so the graph compiles once per bucket (XLA static shapes),
        where the reference just re-runs dynamic shapes (infer_tool.py:297).
        """
        z, f0, g = self.infer_pre(
            c, f0, uv, spk, noise_scale=noise_scale, predict_f0=predict_f0,
            vol=vol, sample_noise=sample_noise, lengths=lengths,
        )
        o = self.dec(
            z, f0, g=g, rng=self.make_rng("noise") if sample_noise else None
        )
        return o, f0

    def infer_pre(
        self,
        c: jax.Array,
        f0: jax.Array,
        uv: jax.Array,
        spk: jax.Array,
        noise_scale: float = 0.35,
        predict_f0: bool = False,
        vol: jax.Array | None = None,
        sample_noise: bool = True,
        lengths: jax.Array | None = None,
    ):
        """``infer`` up to (and excluding) the vocoder decode.

        Returns (z_masked [B, T, inter], f0 [B, T], g [B, ., gin]) — the
        decoder inputs. The sequence-parallel path decodes these latents
        time-sharded over a device mesh (parallel/sequence.sharded_decode,
        SURVEY §5.7); everything upstream (~3% of inference FLOPs) runs
        replicated.
        """
        g = self._speaker_embedding(spk)
        if lengths is None:
            lengths = jnp.full((c.shape[0],), c.shape[1])
        x_mask = sequence_mask(lengths, c.shape[1])[..., None].astype(c.dtype)
        x = self._prenet(c, uv, vol, x_mask)

        if self.use_automatic_f0_prediction and predict_f0:
            lf0 = f0_to_lf0(f0)[..., None]
            norm_lf0 = normalize_f0(lf0, x_mask, uv, rng=None)
            pred_lf0 = self.f0_decoder(x, norm_lf0, x_mask, spk_emb=g)
            f0 = lf0_to_f0(pred_lf0)[..., 0]

        z_p, m_p, logs_p = self.enc_p(
            x,
            x_mask,
            f0_to_coarse(f0),
            noise_scale=noise_scale,
            rng=self.make_rng("noise") if sample_noise else None,
        )
        z = self.flow(z_p, x_mask, g=g, reverse=True)
        return z * x_mask, f0, g
