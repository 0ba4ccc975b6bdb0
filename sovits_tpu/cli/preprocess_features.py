"""Featurize the dataset: units, f0/uv, spectrogram, volume per wav.

Equivalent of preprocess_hubert_f0.py:31-172. For each dataset wav writes:
  <wav>.soft.npy  [H, T_units]  speech-encoder units (16 kHz input)
  <wav>.f0.npy    (f0, uv)      chosen f0 predictor at hop frames
  <wav>.spec.npy  [F, T]        linear magnitude spectrogram
  <wav>.vol.npy   [T]           RMS volume track
  (--use_diff adds <wav>.mel.npy and randomized aug mel/vol, the
  vol-shift + keyshift augmentation of preprocess_hubert_f0.py:84-103)

Device batching happens inside the jitted encoder; files are processed in a
host loop (the reference uses a process pool per GPU; a single TPU chip
prefers one process feeding large batches).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from .. import config as scfg
from ..dsp import stft as dsp_stft
from ..dsp.audio import resample
from ..f0 import get_f0_predictor
from ..train.data import load_filelist, load_wav


def process_one(
    path: str, hps, encoder, f0_predictor, use_diff: bool = False, rng=None,
    mel_extractor=None,
) -> None:
    wav, sr = load_wav(path)
    assert sr == hps.data.sampling_rate, (path, sr)
    hop = hps.data.hop_length

    soft_path = Path(path + ".soft.npy")
    if not soft_path.exists():
        wav16k = resample(wav, sr, 16000)
        units = np.asarray(encoder.encode(wav16k))  # [T, H]
        np.save(soft_path, units.T.astype(np.float32))  # store [H, T]

    f0_path = Path(path + ".f0.npy")
    if not f0_path.exists():
        f0, uv = f0_predictor.compute_f0_uv(wav)
        np.save(f0_path, np.array([f0, uv], dtype=object), allow_pickle=True)

    spec_path = Path(path + ".spec.npy")
    if not spec_path.exists():
        spec = np.asarray(
            dsp_stft.spectrogram(
                jnp.asarray(wav[None]),
                hps.data.filter_length,
                hop,
                hps.data.win_length,
            )[0]
        )
        np.save(spec_path, spec.T.astype(np.float32))  # store [F, T]

    vol_path = Path(path + ".vol.npy")
    if not vol_path.exists():
        vol = np.asarray(dsp_stft.energy(jnp.asarray(wav[None]), hop)[0])
        np.save(vol_path, vol.astype(np.float32))

    if use_diff and mel_extractor is not None:
        # Diffusion artifacts use the *vocoder's* mel contract (128-mel nvSTFT
        # at the vocoder rate), with keyshift applied to the aug mel — exactly
        # preprocess_hubert_f0.py:84-103 (`mel_extractor.extract(aug_wav,
        # sampling_rate, keyshift=keyshift)`). Unit2Mel.out_dims must equal
        # the saved mel dimension.
        mel_path = Path(path + ".mel.npy")
        if not mel_path.exists():
            mel = np.asarray(mel_extractor.extract(wav[None], sr)[0])
            np.save(mel_path, mel.astype(np.float32))  # [T, n_mels]
        aug_path = Path(path + ".aug_mel.npy")
        if not aug_path.exists() and rng is not None:
            # vol shift + keyshift augmentation (preprocess_hubert_f0.py:84-103)
            max_amp = float(np.abs(wav).max()) + 1e-5
            max_shift = min(1.0, np.log10(1.0 / max_amp))
            log10_vol_shift = rng.uniform(-1.0, max_shift)
            keyshift = rng.uniform(-5, 5)
            aug_wav = wav * (10.0**log10_vol_shift)
            aug_mel = np.asarray(
                mel_extractor.extract(aug_wav[None], sr, keyshift=keyshift)[0]
            )
            np.save(aug_path, np.array([aug_mel.astype(np.float32), keyshift], dtype=object),
                    allow_pickle=True)
            # RMS volume is linear in gain, so extract(aug_wav) == vol * gain
            vol = np.load(vol_path)
            np.save(path + ".aug_vol.npy", (vol * 10.0**log10_vol_shift).astype(np.float32))


_POOL_F0P = None


def _f0_pool_init(name: str, hop: int, sr: int):
    """Worker initializer: per-process host-DSP f0 predictor (CPU only)."""
    global _POOL_F0P
    from ..f0 import get_f0_predictor

    _POOL_F0P = get_f0_predictor(name, hop_length=hop, sampling_rate=sr)


def _f0_pool_job(path: str) -> str:
    from ..train.data import load_wav

    f0_path = Path(path + ".f0.npy")
    if not f0_path.exists():
        wav, _sr = load_wav(path)
        f0, uv = _POOL_F0P.compute_f0_uv(wav)
        np.save(f0_path, np.array([f0, uv], dtype=object), allow_pickle=True)
    return path


# host-DSP predictors safe to run in worker processes (numpy/scipy only;
# the NN predictors need the device and stay in the main process)
_POOL_SAFE_F0 = {"dio", "harvest", "pm", "yin"}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default="./configs/config.json")
    parser.add_argument("--diffusion_config", default="./configs/diffusion.yaml")
    parser.add_argument("--f0_predictor", default="dio")
    parser.add_argument("--use_diff", action="store_true")
    parser.add_argument("--encoder_checkpoint", default=None)
    parser.add_argument("--filelists", nargs="*", default=None)
    parser.add_argument(
        "--workers", type=int, default=1,
        help="process pool for the host-DSP f0 pass "
        "(preprocess_hubert_f0.py:119-127 analog; device featurization "
        "stays in the main process feeding the one chip)",
    )
    args = parser.parse_args(argv)

    hps = scfg.load_config(args.config)
    mel_extractor = None
    if args.use_diff:
        # Build the diffusion vocoder's mel extractor from diffusion.yaml
        # (preprocess_hubert_f0.py:157-161: Vocoder(type, ckpt)); weights load
        # lazily so this only needs the mel config.
        from ..models.diffusion import NsfHifiGANVocoder
        from ..train.diffusion import load_diffusion_config

        dcfg = load_diffusion_config(args.diffusion_config)
        voc = dcfg.vocoder
        mel_extractor = NsfHifiGANVocoder(
            voc.ckpt if Path(str(voc.ckpt)).exists() else None,
            log10=(voc.type == "nsf-hifigan-log10"),
            config=voc.config.to_dict() if voc.config else None,
        )
    from ..encoders import get_speech_encoder

    encoder = get_speech_encoder(
        hps.model.speech_encoder or "vec768l12", args.encoder_checkpoint
    )
    f0p = get_f0_predictor(
        args.f0_predictor,
        hop_length=hps.data.hop_length,
        sampling_rate=hps.data.sampling_rate,
    )
    filelists = args.filelists or [
        hps.data.training_files,
        hps.data.validation_files,
    ]
    rng = np.random.default_rng(0)
    paths = []
    for fl in filelists:
        paths.extend(load_filelist(fl))

    if args.workers > 1 and args.f0_predictor in _POOL_SAFE_F0:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(
            max_workers=args.workers,
            initializer=_f0_pool_init,
            initargs=(args.f0_predictor, hps.data.hop_length,
                      hps.data.sampling_rate),
        ) as pool:
            for i, _ in enumerate(pool.map(_f0_pool_job, paths)):
                if (i + 1) % 50 == 0:
                    print(f"f0 {i + 1}/{len(paths)}")

    for i, p in enumerate(paths):
        process_one(p, hps, encoder, f0p, args.use_diff, rng, mel_extractor)
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{len(paths)}")
    print(f"featurized {len(paths)} files")


if __name__ == "__main__":
    main()
