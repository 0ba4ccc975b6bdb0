"""Training data pipeline: preprocessed-feature dataset -> static-shape batches.

Equivalent of the reference's TextAudioSpeakerLoader/TextAudioCollate
(data_utils.py:18-185), redesigned for XLA:

- every batch is padded to a FIXED frame length (``data.pad_to_frames``,
  default 800 — the reference's random-crop cap, data_utils.py:112-118), so
  the train step compiles exactly once,
- per-utterance random cropping, volume augmentation (log10-uniform gain +
  spec recompute, data_utils.py:99-110), and padding happen host-side in
  numpy; the spectrogram for vol-aug is recomputed with the same
  reflect-pad/hann contract as the on-device DSP,
- artifacts per wav: `<wav>.soft.npy` [H, T] units, `<wav>.f0.npy` (f0, uv),
  `<wav>.spec.npy` [F, T], `<wav>.vol.npy` [T] (the .pt variants written by
  the reference preprocessing are accepted too, loaded via torch).

An infinite shuffled iterator with a background prefetch thread feeds the
jitted step.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path

import numpy as np
from scipy.io import wavfile

from ..dsp.audio import repeat_expand
from ..dsp import stft as dsp_stft


def load_filelist(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        return [line.strip().split("|")[0] for line in f if line.strip()]


def _load_array(path: Path):
    """Load an .npy artifact, falling back to the reference's .pt format."""
    if path.exists():
        return np.load(path, allow_pickle=True)
    pt = Path(str(path)[: -len(".npy")] + ".pt")
    if pt.exists():
        import torch

        t = torch.load(pt, map_location="cpu")
        return t.numpy() if hasattr(t, "numpy") else t
    raise FileNotFoundError(path)


def load_wav(path: str) -> tuple[np.ndarray, int]:
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, sr


class FeatureDataset:
    """Loads one utterance's aligned features (data_utils.py:47-92 contract)."""

    def __init__(self, filelist: str, hps, spk_map: dict[str, int] | None = None, vol_aug: bool | None = None):
        self.paths = load_filelist(filelist)
        self.hps = hps
        self.hop = hps.data.hop_length
        self.spk_map = spk_map if spk_map is not None else dict(hps.spk.items())
        self.vol_aug = hps.train.vol_aug if vol_aug is None else vol_aug
        self.pad_frames = hps.data.pad_to_frames or 800
        self.interp_mode = hps.data.unit_interpolate_mode or "nearest"
        # all_in_mem: preload every utterance into RAM (train.py:61-65)
        self._cache = None
        if hps.train.all_in_mem:
            self._cache = [self.load_utterance(p) for p in self.paths]

    def __len__(self):
        return len(self.paths)

    def load_utterance(self, path: str) -> dict:
        wav, sr = load_wav(path)
        assert sr == self.hps.data.sampling_rate, (path, sr)

        f0_uv = np.load(path + ".f0.npy", allow_pickle=True)
        f0 = np.asarray(f0_uv[0], dtype=np.float32)
        uv = np.asarray(f0_uv[1], dtype=np.float32)

        spec = np.asarray(_load_array(Path(path + ".spec.npy")), dtype=np.float32)
        n_freq = self.hps.data.filter_length // 2 + 1
        if spec.shape[0] == n_freq:  # stored [F, T] (reference layout) -> [T, F]
            spec = spec.T

        # units stored [H, T_units] (or [1, H, T] like the reference's
        # .soft.pt); interpolate along time to f0 frames (data_utils.py:77).
        units = np.asarray(_load_array(Path(path + ".soft.npy")), dtype=np.float32)
        if units.ndim == 3:
            units = units[0]
        units = units.T  # -> [T_units, H]
        if units.shape[0] != f0.shape[0]:
            import jax.numpy as jnp

            units = np.asarray(
                repeat_expand(jnp.asarray(units), f0.shape[0], self.interp_mode)
            )

        spk_name = Path(path).parent.name
        spk = self.spk_map.get(spk_name, 0)

        vol_path = Path(path + ".vol.npy")
        volume = (
            np.load(vol_path).astype(np.float32) if vol_path.exists() else None
        )

        lmin = min(units.shape[0], spec.shape[0], f0.shape[0])
        assert abs(units.shape[0] - spec.shape[0]) < 3, (
            units.shape,
            spec.shape,
            f0.shape,
            path,
        )
        units, spec, f0, uv = units[:lmin], spec[:lmin], f0[:lmin], uv[:lmin]
        wav = wav[: lmin * self.hop]
        if volume is not None:
            volume = volume[:lmin]
        return {
            "c": units,
            "f0": f0,
            "uv": uv,
            "spec": spec,
            "wav": wav,
            "spk": spk,
            "volume": volume,
        }

    def _augment_and_crop(self, item: dict, rng: np.random.Generator) -> dict:
        # volume augmentation (data_utils.py:99-110)
        if self.vol_aug and item["volume"] is not None and rng.random() < 0.5:
            max_amp = float(np.max(np.abs(item["wav"]))) + 1e-5
            max_shift = min(1.0, np.log10(1.0 / max_amp))
            shift = rng.uniform(-1.0, max_shift)
            gain = 10.0**shift
            item = dict(item)
            item["wav"] = item["wav"] * gain
            item["volume"] = item["volume"] * gain
            import jax.numpy as jnp

            item["spec"] = np.asarray(
                dsp_stft.spectrogram(
                    jnp.asarray(item["wav"])[None],
                    self.hps.data.filter_length,
                    self.hop,
                    self.hps.data.win_length,
                )[0]
            )[: item["f0"].shape[0]]

        t = item["f0"].shape[0]
        # random crop (reference crops >800 to a 790 window, data_utils.py:112-118)
        if t > self.pad_frames:
            start = rng.integers(0, t - self.pad_frames + 1)
            end = start + self.pad_frames
            item = dict(item)
            for k in ("c", "f0", "uv", "spec"):
                item[k] = item[k][start:end]
            item["wav"] = item["wav"][start * self.hop : end * self.hop]
            if item["volume"] is not None:
                item["volume"] = item["volume"][start:end]
        return item

    def padded_example(self, index: int, rng: np.random.Generator) -> dict:
        base = (
            self._cache[index] if self._cache is not None
            else self.load_utterance(self.paths[index])
        )
        item = self._augment_and_crop(base, rng)
        t = item["f0"].shape[0]
        pad_t = self.pad_frames

        def pad(x, target):
            if x.shape[0] >= target:
                return x[:target]
            width = [(0, target - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, width)

        return {
            "c": pad(item["c"], pad_t),
            "f0": pad(item["f0"], pad_t),
            "uv": pad(item["uv"], pad_t),
            "spec": pad(item["spec"], pad_t),
            "wav": pad(item["wav"], pad_t * self.hop)[:, None],
            "spk": np.int32(item["spk"]),
            "lengths": np.int32(min(t, pad_t)),
            "volume": pad(
                item["volume"]
                if item["volume"] is not None
                else np.zeros(t, np.float32),
                pad_t,
            ),
        }


def batch_iterator(
    dataset: FeatureDataset,
    batch_size: int,
    seed: int = 1234,
    prefetch: int = 4,
):
    """Infinite shuffled epoch iterator with background prefetch."""

    def producer(q: queue.Queue):
        rng = np.random.default_rng(seed)
        epoch = 0
        while True:
            order = rng.permutation(len(dataset))
            if len(order) < batch_size:  # tiny datasets: sample w/ replacement
                order = rng.choice(len(dataset), batch_size, replace=True)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                idxs = order[i : i + batch_size]
                examples = [dataset.padded_example(j, rng) for j in idxs]
                batch = {
                    k: np.stack([e[k] for e in examples]) for k in examples[0]
                }
                batch["epoch"] = epoch
                q.put(batch)
            epoch += 1

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    thread = threading.Thread(target=producer, args=(q,), daemon=True)
    thread.start()
    while True:
        yield q.get()
