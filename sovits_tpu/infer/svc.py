"""Svc — the inference facade (inference/infer_tool.py:116-546 equivalent).

Pipeline per clip (infer_tool.py:256-340):
  load/resample -> f0 predictor (+ transpose shift 2^(tran/12)) -> 16 kHz
  resample -> speech encoder -> repeat_expand to f0 frames -> optional
  cluster / feature-retrieval blend -> synthesizer infer -> optional
  loudness-envelope mix.

TPU-first: inputs are padded to length buckets so each bucket compiles once;
padded frames are masked in the synthesizer and trimmed from the output.
Model weights load from either a sovits_tpu orbax checkpoint directory or a
reference-trained torch G_*.pth (converted on the fly).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from .. import config as scfg
from ..dsp import stft as dsp_stft
from ..dsp.audio import change_rms, repeat_expand, resample
from ..f0 import get_f0_predictor
from ..models import Synthesizer, factory
from ..train import checkpoint as ckpt_lib
from . import slicer as slicer_mod

logger = logging.getLogger(__name__)

BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)


class F0FilterException(Exception):
    pass


def pad_array(arr: np.ndarray, target_length: int) -> np.ndarray:
    """Center-pad / center-crop to target length (infer_tool.py:84-106)."""
    n = len(arr)
    if n >= target_length:
        start = (n - target_length) // 2
        return arr[start : start + target_length]
    pad = target_length - n
    return np.pad(arr, (pad // 2, pad - pad // 2))


def split_list_by_n(data, n: int, pre: int = 0):
    for i in range(0, len(data), n):
        yield data[max(i - pre, 0) if i - pre >= 0 else i : i + n]


def crossfade(a: np.ndarray, b: np.ndarray, fade_len: int) -> np.ndarray:
    """Linear crossfade joining a's tail into b's head (maad-style)."""
    fade = np.linspace(0, 1, fade_len)
    mixed = a[-fade_len:] * (1 - fade) + b[:fade_len] * fade
    return np.concatenate([a[:-fade_len], mixed, b[fade_len:]])


class Svc:
    def __init__(
        self,
        net_g_path: str,
        config_path: str,
        encoder=None,
        cluster_model_path: str | None = None,
        feature_retrieval: bool = False,
        shallow_diffusion: bool = False,
        only_diffusion: bool = False,
        diffusion_model_path: str | None = None,
        diffusion_config_path: str | None = None,
        nsf_hifigan_enhance: bool = False,
        enhancer_ckpt: str | None = "pretrain/nsf_hifigan/model",
        dtype=jnp.float32,
    ):
        self.hps = scfg.load_config(config_path)
        self.target_sample = self.hps.data.sampling_rate
        self.hop_size = self.hps.data.hop_length
        self.spk2id = dict(self.hps.spk.items()) if self.hps.spk else {}
        self.unit_interpolate_mode = self.hps.data.unit_interpolate_mode or "left"
        self.vol_embedding = bool(self.hps.model.vol_embedding)

        self.model = factory.build_synthesizer(self.hps, dtype=dtype)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            init_params = factory.init_synthesizer_params(
                self.model, jax.random.PRNGKey(0), self.hps, t_frames=16
            )
        self.params = self._load_params(net_g_path, init_params)
        self._infer_jit = {}
        self.f0_predictor_object = None

        # encoder loads lazily: export/offline paths don't need it
        self._encoder = encoder
        self._encoder_name = self.hps.model.speech_encoder or "vec768l12"

        self.cluster = None
        self.feature_retrieval = feature_retrieval
        if cluster_model_path and Path(cluster_model_path).exists():
            from ..cluster import load_cluster_model

            self.cluster = load_cluster_model(cluster_model_path, feature_retrieval)

        self.diffusion = None
        self.only_diffusion = only_diffusion
        if (shallow_diffusion or only_diffusion) and diffusion_model_path:
            from .diffusion_wrapper import DiffusionRefiner

            self.diffusion = DiffusionRefiner(
                diffusion_model_path, diffusion_config_path
            )
        if only_diffusion and self.diffusion is None:
            raise FileNotFoundError("only_diffusion requires a diffusion model")

        # shallow diffusion supersedes the enhancer (infer_tool.py:183-184)
        self.enhancer = None
        if nsf_hifigan_enhance and not shallow_diffusion:
            from .enhancer import Enhancer

            self.enhancer = Enhancer("nsf-hifigan", enhancer_ckpt)

    @property
    def encoder(self):
        if self._encoder is None:
            from ..encoders import get_speech_encoder

            self._encoder = get_speech_encoder(self._encoder_name)
        return self._encoder

    def _load_params(self, path: str, init_params: dict) -> dict:
        p = Path(path)
        if p.suffix == ".npz":
            # compressed release model (cli/tools.py compress) — enc_q was
            # stripped, shape-tolerant merge restores it from init
            from ..cli.tools import unflatten_params

            loaded = jax.tree.map(
                lambda x: np.asarray(x, np.float32), unflatten_params(dict(np.load(p)))
            )
            return ckpt_lib.merge_pretrained(init_params, loaded)
        if p.suffix in (".pth", ".pt"):
            params, it = ckpt_lib.load_torch_generator(str(p), self.hps, init_params)
            logger.info("loaded torch checkpoint %s (iteration %s)", p, it)
            return params
        # orbax checkpoint dir written by the trainer
        from ..train.step import create_train_state, make_optimizer

        tx = make_optimizer(self.hps)
        from ..models import MultiPeriodDiscriminator

        disc = MultiPeriodDiscriminator()
        d_params = factory.init_discriminator_params(
            disc, jax.random.PRNGKey(1), seg_samples=self.hps.train.segment_size
        )
        state = create_train_state(init_params, d_params, tx, tx)
        mgr = ckpt_lib.CheckpointManager(p, keep=1)
        restored, _ = mgr.restore(state)
        mgr.close()
        if restored is None:
            raise FileNotFoundError(f"no checkpoint found under {p}")
        return restored.g_params

    # ------------------------------------------------------------------
    def get_unit_f0(
        self, wav: np.ndarray, tran: int, cluster_infer_ratio: float, speaker,
        f0_filter: bool = False, f0_predictor: str = "pm", cr_threshold: float = 0.05,
    ):
        """infer_tool.py:204-254: f0 + units aligned to f0 frames."""
        if (
            self.f0_predictor_object is None
            or self.f0_predictor_object.name != f0_predictor
        ):
            self.f0_predictor_object = get_f0_predictor(
                f0_predictor,
                hop_length=self.hop_size,
                sampling_rate=self.target_sample,
                threshold=cr_threshold,
            )
        # dispatch the device-side encoder FIRST (async), then run the f0
        # predictor's host DSP while the chip works — the two are
        # independent and this overlap hides the cheaper of the two
        wav16k = resample(wav, self.target_sample, 16000)
        encode_async = getattr(self.encoder, "encode_async", None)
        pending = encode_async(wav16k) if encode_async is not None else None

        f0, uv = self.f0_predictor_object.compute_f0_uv(wav)
        if f0_filter and float(np.sum(f0)) == 0.0:
            raise F0FilterException("No voice detected")
        f0 = f0 * 2 ** (tran / 12)

        if pending is not None:
            units = pending()  # [T_units, H]
        else:
            units = np.asarray(self.encoder.encode(wav16k))  # [T_units, H]
        units = np.asarray(
            repeat_expand(jnp.asarray(units), len(f0), self.unit_interpolate_mode)
        )

        if cluster_infer_ratio != 0 and self.cluster is not None:
            units = self.cluster.blend(
                units, speaker, cluster_infer_ratio, self.spk2id,
                retrieval=self.feature_retrieval,
            )
        return units, f0, uv

    def _jit_for_bucket(self, t: int):
        if t not in self._infer_jit:

            def fn(params, c, f0, uv, spk, vol, lengths, noise_scale,
                   predict_f0, key, sample_noise=True):
                return self.model.apply(
                    {"params": params},
                    c,
                    f0,
                    uv,
                    spk,
                    noise_scale=noise_scale,
                    predict_f0=predict_f0,
                    vol=vol,
                    lengths=lengths,
                    sample_noise=sample_noise,
                    rngs={"noise": key},
                    method=Synthesizer.infer,
                )

            self._infer_jit[t] = jax.jit(
                fn, static_argnames=("predict_f0", "sample_noise")
            )
        return self._infer_jit[t]

    def _prepare_chunk(
        self, speaker, tran, wav, sr, cluster_infer_ratio, f0_filter,
        f0_predictor, cr_threshold, spk_mix_frames=None,
    ) -> dict:
        """Host-side front end for one chunk: resample, f0, units, volume,
        speaker spec. The device synth runs later (possibly batched)."""
        if sr is not None and sr != self.target_sample:
            wav = resample(wav, sr, self.target_sample)
        wav = np.asarray(wav, dtype=np.float32)
        c, f0, uv = self.get_unit_f0(
            wav, tran, cluster_infer_ratio, speaker, f0_filter, f0_predictor,
            cr_threshold,
        )
        n_frames = len(f0)
        vol = None
        if self.vol_embedding or self.only_diffusion:
            vol = np.asarray(
                dsp_stft.energy(
                    jnp.asarray(wav[None, : n_frames * self.hop_size]), self.hop_size
                )
            )
        if spk_mix_frames is not None:
            mix = np.asarray(spk_mix_frames[:n_frames], np.float32)
            spk = ("mix", mix)
            spk_array = jnp.asarray(mix[None])
        else:
            spk_id = self.spk2id.get(speaker)
            if spk_id is None and isinstance(speaker, int):
                spk_id = speaker
            if spk_id is None:
                raise RuntimeError("The name you entered is not in the speaker list!")
            spk = ("id", int(spk_id))
            spk_array = jnp.asarray([int(spk_id)], jnp.int32)
        return dict(wav=wav, c=c, f0=f0, uv=uv, vol=vol, n_frames=n_frames,
                    spk=spk, spk_array=spk_array)

    def _run_synth_batch(
        self, items: list, noice_scale: float, auto_predict_f0: bool,
        seed: int, max_batch: int = 8, sample_noise: bool = True,
    ) -> list:
        """Run the synthesizer over prepared chunks, batching same-bucket
        chunks into one device dispatch (the reference runs batch-1 per
        chunk, infer_tool.py:460-482). Returns audio per item, in order.

        Note: within a batch the sampled prior noise differs per row (one
        PRNG key per dispatch), where sequential batch-1 calls with a fixed
        seed would give every chunk the *same* noise pattern. With
        noice_scale=0 the paths are bit-identical."""
        out: list = [None] * len(items)
        groups: dict = {}
        for idx, it in enumerate(items):
            bucket = next((b for b in BUCKETS if b >= it["n_frames"]), it["n_frames"])
            groups.setdefault((bucket, it["spk"][0]), []).append(idx)

        for (bucket, spk_kind), idxs in sorted(groups.items()):
            for start in range(0, len(idxs), max_batch):
                sub = idxs[start : start + max_batch]
                # pad the batch to a power of two to bound recompiles
                b_pad = 1 << (len(sub) - 1).bit_length()
                rows = sub + [sub[-1]] * (b_pad - len(sub))

                def pad_t(x):
                    return np.pad(
                        x, [(0, bucket - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
                    )

                def stack(key, dtype=np.float32):
                    return jnp.asarray(
                        np.stack([pad_t(np.asarray(items[i][key], dtype)) for i in rows])
                    )

                if spk_kind == "mix":
                    spk = jnp.asarray(
                        np.stack([pad_t(items[i]["spk"][1]) for i in rows])
                    )
                else:
                    spk = jnp.asarray(
                        [items[i]["spk"][1] for i in rows], jnp.int32
                    )
                vol = None
                if self.vol_embedding:
                    vol = jnp.asarray(
                        np.stack([pad_t(items[i]["vol"][0]) for i in rows])
                    )
                lengths = jnp.asarray(
                    [items[i]["n_frames"] for i in rows], jnp.int32
                )
                fn = self._jit_for_bucket(bucket)
                audio, _f0_out = fn(
                    self.params, stack("c"), stack("f0"), stack("uv"), spk, vol,
                    lengths, noice_scale, bool(auto_predict_f0),
                    # rbg keys: threefry sampling costs ~2 ms per 10 s clip
                    # on v5e (the sine source draws ~4M normals)
                    jax.random.key(seed, impl="rbg"), sample_noise,
                )
                audio = np.asarray(audio)
                for row, i in enumerate(sub):
                    n = items[i]["n_frames"]
                    out[i] = audio[row, : n * self.hop_size, 0]
        return out

    def infer(
        self,
        speaker,
        tran: int,
        wav: np.ndarray,
        sr: int | None = None,
        cluster_infer_ratio: float = 0.0,
        auto_predict_f0: bool = False,
        noice_scale: float = 0.4,
        f0_filter: bool = False,
        f0_predictor: str = "pm",
        cr_threshold: float = 0.05,
        k_step: int = 100,
        second_encoding: bool = False,
        loudness_envelope_adjustment: float = 1.0,
        seed: int = 52468,
        spk_mix_frames: np.ndarray | None = None,
        enhancer_adaptive_key: float = 0,
    ):
        """Convert one clip; returns (audio, n_samples, n_frames)."""
        item = self._prepare_chunk(
            speaker, tran, wav, sr, cluster_infer_ratio, f0_filter,
            f0_predictor, cr_threshold, spk_mix_frames,
        )
        n_frames = item["n_frames"]

        if self.only_diffusion:
            audio = self.infer_only_diffusion(
                item, k_step, second_encoding, loudness_envelope_adjustment, seed
            )
            return audio, audio.shape[-1], n_frames

        audio = self._run_synth_batch([item], noice_scale, auto_predict_f0, seed)[0]
        audio = self._post_chunk(
            item, audio, k_step, second_encoding,
            loudness_envelope_adjustment, enhancer_adaptive_key,
        )
        return audio, audio.shape[-1], n_frames

    def infer_seq_parallel(
        self,
        speaker,
        tran: int,
        wav: np.ndarray,
        sr: int | None = None,
        n_shards: int | None = None,
        cluster_infer_ratio: float = 0.0,
        auto_predict_f0: bool = False,
        noice_scale: float = 0.4,
        f0_predictor: str = "pm",
        cr_threshold: float = 0.05,
        seed: int = 52468,
        sample_noise: bool = True,
    ):
        """Full-song single-dispatch inference, vocoder decode time-sharded
        over the device mesh (`--seq_shard`; SURVEY §5.7).

        ``slice_inference`` scales long audio with a host-side chunk loop
        (as the reference does, infer_tool.py:460-495); this path instead
        keeps the whole song as ONE XLA dispatch: the prior/flow run
        replicated (~3% of inference FLOPs), then
        ``parallel.sequence.sharded_decode`` splits the NSF-HiFiGAN decode
        across ``n_shards`` devices with a ppermute halo exchange and an
        all-gathered sine-phase prefix, so collectives ride ICI and the
        result matches the monolithic decode away from the song edges.

        ``sample_noise`` draws BOTH the prior's noise and the NSF source's
        additive noise/random phases; the decode noise is counter-based per
        absolute frame (models/nsf_hifigan.py SourceModuleHnNSF
        noise_frames) so the sharded result equals a monolithic decode with
        the same key, seam-free. Per-frame speaker mixes are not supported
        here (g must be [B,1,gin]). Audio within
        ``required_halo_frames(dec)`` frames of the song edges may deviate
        slightly from the monolithic decode (edge-zone contract; the halo
        there is zero-filled rather than absent).
        Returns (audio, n_samples, n_frames) like ``infer``.
        """
        from jax.sharding import Mesh

        from ..parallel.sequence import required_halo_frames, sharded_decode

        if isinstance(speaker, dict):
            raise ValueError("seq-parallel inference does not support spk mix")

        item = self._prepare_chunk(
            speaker, tran, wav, sr, cluster_infer_ratio, False,
            f0_predictor, cr_threshold, None,
        )
        if item["spk"][0] == "mix":
            raise ValueError("seq-parallel inference does not support spk mix")
        n_frames = item["n_frames"]

        if not hasattr(self, "_seq_dec"):
            self._seq_dec = factory.build_decoder(self.hps, dtype=self.model.dtype)
            self._seq_halo = required_halo_frames(self._seq_dec)
            self._seq_decode_jit = {}
        devs = jax.devices()
        n = min(n_shards or len(devs), len(devs))
        # each shard must hold at least the halo, or the edge slices in
        # sharded_decode would be ill-formed (short clip + large --seq_shard)
        n = max(1, min(n, n_frames // max(self._seq_halo, 1)))
        mesh = Mesh(np.array(devs[:n]), ("seq",))
        t_pad = -(-n_frames // n) * n  # multiple of the mesh axis

        def pad_t(x, dtype=np.float32):
            x = np.asarray(x, dtype)
            return np.pad(x, [(0, t_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

        c = jnp.asarray(pad_t(item["c"]))[None]
        f0 = jnp.asarray(pad_t(item["f0"]))[None]
        uv = jnp.asarray(pad_t(item["uv"]))[None]
        vol = (
            jnp.asarray(pad_t(item["vol"][0]))[None]
            if (self.vol_embedding and item["vol"] is not None)
            else None
        )
        spk = item["spk_array"]
        lengths = jnp.asarray([n_frames], jnp.int32)

        if not hasattr(self, "_seq_pre_jit"):

            def pre(params, c, f0, uv, spk, vol, lengths, ns, pf, key, sn):
                return self.model.apply(
                    {"params": params}, c, f0, uv, spk, noise_scale=ns,
                    predict_f0=pf, vol=vol, lengths=lengths, sample_noise=sn,
                    rngs={"noise": key}, method=Synthesizer.infer_pre,
                )

            self._seq_pre_jit = jax.jit(
                pre, static_argnames=("pf", "sn")
            )

        z, f0_out, g = self._seq_pre_jit(
            self.params, c, f0, uv, spk, vol, lengths, noice_scale,
            bool(auto_predict_f0), jax.random.key(seed, impl="rbg"),
            bool(sample_noise),
        )

        # jit the sharded decode once per (n_shards, noise) combination so
        # repeated calls reuse the mesh/shard_map/compiled program
        cache_key = (n, bool(sample_noise))
        if cache_key not in self._seq_decode_jit:
            dec = self._seq_dec

            def decode(params, z, f0_out, g, key):
                return sharded_decode(
                    dec, params, z, f0_out, g, mesh, axis="seq",
                    rng=key if sample_noise else None,
                )

            self._seq_decode_jit[cache_key] = jax.jit(decode)
        wav_out = self._seq_decode_jit[cache_key](
            self.params["dec"], z, f0_out, g,
            jax.random.PRNGKey(seed),  # threefry: counter noise folds per frame
        )
        audio = np.asarray(wav_out)[0, : n_frames * self.hop_size, 0]
        return audio, audio.shape[-1], n_frames

    def infer_only_diffusion(self, item, k_step, second_encoding,
                             loudness_envelope_adjustment, seed: int = 52468):
        """infer_tool.py:300-328 only_diffusion branch: diffuse from the
        INPUT audio's mel (full k_step) and vocode — no VITS pass."""
        wav, n_frames = item["wav"], item["n_frames"]
        spk = item["spk_array"]
        if item["spk"][0] == "id":
            spk = np.asarray([item["spk"][1]])
        audio = self.diffusion.refine(
            self, wav[: n_frames * self.hop_size], item["c"], item["f0"],
            item["vol"],  # input-wav volume either way (infer_tool.py:296,308)
            spk, k_step, second_encoding, seed,
        )
        if loudness_envelope_adjustment != 1:
            audio = change_rms(
                wav, self.target_sample, audio, self.target_sample,
                loudness_envelope_adjustment,
            )
        return audio

    def _post_chunk(self, item, audio, k_step, second_encoding,
                    loudness_envelope_adjustment, enhancer_adaptive_key):
        """Per-chunk post stages: shallow diffusion / enhancer / loudness
        envelope (infer_tool.py:299-337)."""
        if self.diffusion is not None:
            audio = self.diffusion.refine(
                self, audio, item["c"], item["f0"], item["vol"],
                item["spk_array"], k_step, second_encoding,
            )
        elif self.enhancer is not None:
            audio, _ = self.enhancer.enhance(
                audio, self.target_sample, item["f0"][: item["n_frames"]],
                self.hop_size, adaptive_key=enhancer_adaptive_key,
            )
        if loudness_envelope_adjustment != 1:
            audio = change_rms(
                item["wav"], self.target_sample, audio, self.target_sample,
                loudness_envelope_adjustment,
            )
        return audio

    # ------------------------------------------------------------------
    def slice_inference(
        self,
        raw_audio: np.ndarray,
        sr: int,
        spk,
        tran: int,
        slice_db: float = -40,
        cluster_infer_ratio: float = 0.0,
        auto_predict_f0: bool = False,
        noice_scale: float = 0.4,
        pad_seconds: float = 0.5,
        clip_seconds: float = 0.0,
        lg_num: float = 0.0,
        lgr_num: float = 0.75,
        f0_predictor: str = "pm",
        cr_threshold: float = 0.05,
        k_step: int = 100,
        second_encoding: bool = False,
        loudness_envelope_adjustment: float = 1.0,
        use_spk_mix: bool = False,
        enhancer_adaptive_key: float = 0,
    ) -> np.ndarray:
        """Silence-sliced full-clip conversion (infer_tool.py:356-496).

        With use_spk_mix, ``spk`` is a spk_mix_map timeline
        ({speaker_id: [[begin, end, v0, v1], ...]}); per-frame weights are
        built over the whole output and sliced per chunk (the reference's
        global_frame accounting, infer_tool.py:390-454).
        """
        chunks = slicer_mod.cut(raw_audio, sr, db_thresh=slice_db)
        audio_data = slicer_mod.chunks2audio(raw_audio, chunks)
        per_size = int(clip_seconds * sr)

        mix_weights = None
        if use_spk_mix:
            from .spkmix import build_spk_mix_frames

            total_frames = sum(
                int(np.ceil(len(d) / sr * self.target_sample)) // self.hop_size
                + (0 if tag else 2 * int(self.target_sample * pad_seconds) // self.hop_size)
                for tag, d in audio_data
            )
            mix_weights = build_spk_mix_frames(
                spk, total_frames, self.hps.model.n_speakers
            )
        # Forced-clip crossfade geometry (kwargs lg_num/lgr_num mirror the
        # reference CLI's -lg/-lgr): consecutive clips overlap by
        # `overlap_len` samples; the central `fade_len` of the overlap is
        # linearly crossfaded while the margins either side are kept from
        # one clip only.
        overlap_len = int(lg_num * sr)
        fade_len = int(overlap_len * lgr_num)
        keep_left = (overlap_len - fade_len) // 2
        keep_right = overlap_len - fade_len - keep_left
        fade_ramp = np.linspace(0, 1, fade_len) if overlap_len else None

        # Pass 1 — host front end per chunk (slicing, padding, f0/units).
        # Pass 2 — one batched device dispatch per (bucket, speaker-kind)
        # group instead of the reference's batch-1 chunk loop
        # (infer_tool.py:460-482); measured full-song win in bench_details.
        plan: list[tuple] = []  # ("sil", length) | ("chunk", item_idx, per_length, k)
        items: list[dict] = []
        global_frame = 0
        for slice_tag, data in audio_data:
            length = int(np.ceil(len(data) / sr * self.target_sample))
            if slice_tag:
                plan.append(("sil", length))
                global_frame += length // self.hop_size
                continue
            datas = list(split_list_by_n(data, per_size, overlap_len)) if per_size else [data]
            for k, dat in enumerate(datas):
                per_length = (
                    int(np.ceil(len(dat) / sr * self.target_sample))
                    if clip_seconds
                    else length
                )
                pad_len = int(sr * pad_seconds)
                dat = np.concatenate([np.zeros(pad_len), dat, np.zeros(pad_len)])
                chunk_mix = None
                if mix_weights is not None:
                    n_chunk = int(np.ceil(len(dat) / sr * self.target_sample)) // self.hop_size
                    idx = np.minimum(
                        np.arange(global_frame, global_frame + n_chunk),
                        len(mix_weights) - 1,
                    )
                    chunk_mix = mix_weights[idx]
                item = self._prepare_chunk(
                    None if mix_weights is not None else spk, tran,
                    dat.astype(np.float32), sr, cluster_infer_ratio, False,
                    f0_predictor, cr_threshold, spk_mix_frames=chunk_mix,
                )
                global_frame += item["n_frames"]
                plan.append(("chunk", len(items), per_length, k))
                items.append(item)

        if self.only_diffusion:
            outs = [
                self.infer_only_diffusion(it, k_step, second_encoding,
                                          loudness_envelope_adjustment)
                for it in items
            ]
        else:
            outs = self._run_synth_batch(items, noice_scale, auto_predict_f0, 52468)
            outs = [
                self._post_chunk(it, out, k_step, second_encoding,
                                 loudness_envelope_adjustment,
                                 enhancer_adaptive_key)
                for it, out in zip(items, outs)
            ]

        audio: list[float] = []
        for entry in plan:
            if entry[0] == "sil":
                audio.extend(list(np.zeros(entry[1])))
                continue
            _, item_idx, per_length, k = entry
            out_audio = outs[item_idx]
            out_pad = int(self.target_sample * pad_seconds)
            _audio = np.asarray(out_audio)[out_pad:-out_pad]
            _audio = pad_array(_audio, per_length)
            if overlap_len and k != 0:
                # blend the assembled tail into the new clip's head over
                # the fade window; the kept margins come from whichever
                # clip owns them (left margin: previous clip, right
                # margin: new clip)
                tail_prev = (
                    np.array(audio[-(fade_len + keep_right) : -keep_right])
                    if lgr_num != 1
                    else np.array(audio[-overlap_len:])
                )
                head_next = (
                    _audio[keep_left : keep_left + fade_len]
                    if lgr_num != 1
                    else _audio[:overlap_len]
                )
                blended = tail_prev * (1 - fade_ramp) + head_next * fade_ramp
                audio = (
                    audio[: -(fade_len + keep_right)]
                    if lgr_num != 1
                    else audio[:-overlap_len]
                )
                audio.extend(blended)
                _audio = (
                    _audio[keep_left + fade_len :]
                    if lgr_num != 1
                    else _audio[overlap_len:]
                )
            audio.extend(list(_audio))
        return np.array(audio, dtype=np.float32)


class RealTimeVC:
    """Streaming conversion with crossfaded chunks (infer_tool.py:498-546)."""

    def __init__(self, chunk_len: int = 16000, pre_len: int = 3840):
        self.last_chunk: np.ndarray | None = None
        self.last_o: np.ndarray | None = None
        self.chunk_len = chunk_len
        self.pre_len = pre_len

    def process(self, svc_model: Svc, speaker_id, f_pitch_change, audio: np.ndarray,
                sr: int, **kwargs) -> np.ndarray:
        if self.last_chunk is None:
            out, _, _ = svc_model.infer(speaker_id, f_pitch_change, audio, sr=sr, **kwargs)
            self.last_chunk = out[-self.pre_len :]
            self.last_o = out
            return out[-self.chunk_len :]
        aud = np.concatenate([self.last_chunk, audio])
        out, _, _ = svc_model.infer(speaker_id, f_pitch_change, aud, sr=sr, **kwargs)
        ret = crossfade(self.last_o, out, self.pre_len)
        self.last_chunk = out[-self.pre_len :]
        self.last_o = out
        return ret[self.chunk_len : 2 * self.chunk_len]
