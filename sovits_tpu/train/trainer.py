"""Trainer: epoch loop, lr schedule, logging, eval, checkpointing.

Equivalent of train.py:35-325 in the reference, single-program SPMD style:
one python process drives the whole mesh (the reference spawns one process
per GPU + DDP; here XLA shards the batch over the 'data' axis and inserts
the gradient psums).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from .. import config as scfg
from ..dsp import stft as dsp_stft
from ..models import Synthesizer, factory
from ..parallel import make_mesh, replicate_tree, shard_batch
from . import checkpoint as ckpt_lib
from .data import FeatureDataset, batch_iterator
from .step import (
    create_train_state,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

logger = logging.getLogger("sovits_tpu.train")


class MetricsLogger:
    """TensorBoard if available, always a metrics.jsonl file."""

    def __init__(self, log_dir: Path):
        log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(log_dir / "metrics.jsonl", "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir=str(log_dir))
        except Exception:  # pragma: no cover
            self.tb = None

    def scalars(self, step: int, values: dict):
        rec = {"step": step, **{k: float(v) for k, v in values.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb:
            for k, v in values.items():
                self.tb.add_scalar(k, float(v), step)

    def audio(self, step: int, tag: str, wav: np.ndarray, sr: int):
        if self.tb:
            self.tb.add_audio(tag, wav.reshape(1, -1), step, sample_rate=sr)

    def image(self, step: int, tag: str, matrix: np.ndarray):
        """Spectrogram/f0-curve image (utils.py:227-235 plot_spectrogram_to_numpy
        equivalent without matplotlib): [F, T] matrix -> viridis-ish RGB."""
        if not self.tb:
            return
        m = np.asarray(matrix, np.float32)
        lo, hi = float(m.min()), float(m.max())
        norm = (m - lo) / (hi - lo + 1e-8)
        # simple 3-stop colormap (dark blue -> teal -> yellow)
        r = np.clip(norm * 2 - 1, 0, 1)
        g = np.clip(norm * 1.5, 0, 1) * 0.9
        b = np.clip(1 - norm, 0.1, 1)
        img = np.stack([r, g, b], axis=0)  # [3, F, T]
        self.tb.add_image(tag, img[:, ::-1], step)  # low freqs at the bottom

    def close(self):
        self.jsonl.close()
        if self.tb:
            self.tb.close()


def _record_git_hash(model_dir: Path) -> None:
    """check_git_hash analog (utils.py:361-378): pin the code revision next
    to checkpoints, warn when resuming with different code."""
    import subprocess

    try:
        cur = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True, timeout=10
        ).stdout.strip()
    except Exception:
        return
    if not cur:
        return
    path = model_dir / "githash"
    if path.exists():
        saved = path.read_text().strip()
        if saved != cur:
            logger.warning("git hash mismatch: saved %s vs current %s", saved[:8], cur[:8])
    else:
        path.write_text(cur)


def epoch_lr(hps, epoch: int) -> float:
    """Warmup + per-epoch exponential decay (train.py:110-122, 131-132)."""
    base = hps.train.learning_rate
    warmup = hps.train.warmup_epochs or 0
    if warmup and epoch <= warmup:
        return base / warmup * epoch
    return base * (hps.train.lr_decay ** max(epoch - 1, 0))


def train(hps, model_dir: str | Path, max_steps: int | None = None, mesh=None):
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    scfg.save_config(hps, model_dir / "config.json")
    _record_git_hash(model_dir)
    mlog = MetricsLogger(model_dir)

    mesh = mesh or make_mesh()
    n_data = mesh.shape["data"]
    batch_size = hps.train.batch_size
    assert batch_size % n_data == 0, (batch_size, n_data)

    # Training decodes via the folded-XLA tail: the Pallas trio's
    # recompute-based custom VJP (ops/fused_stage.py trio_folded) MEASURED
    # SLOWER end-to-end (26.6 vs 28.4 steps/s on v5e, bench_details r4) —
    # the rematerialized backward pays a full extra tail forward, which on
    # the short training segments outweighs the kernel's forward win.
    # Inference (long clips, no backward) keeps fused_tail=True.
    syn = factory.build_synthesizer(hps)
    disc = factory.build_discriminator(hps)
    rng = jax.random.PRNGKey(hps.train.seed)
    # in-step randomness (slice/noise/dropout) uses the hardware rbg PRNG:
    # threefry sampling costs ~2 ms/step on v5e (see bench.py's infer keys)
    step_rng = jax.random.key(hps.train.seed, impl="rbg")
    g_params = factory.init_synthesizer_params(syn, rng, hps, t_frames=16)
    d_params = factory.init_discriminator_params(
        disc, jax.random.fold_in(rng, 1), seg_samples=hps.train.segment_size
    )
    g_tx = make_optimizer(hps)
    d_tx = make_optimizer(hps)
    state = create_train_state(g_params, d_params, g_tx, d_tx)

    manager = ckpt_lib.CheckpointManager(model_dir / "ckpt", keep=hps.train.keep_ckpts or 3)
    start_epoch = 1
    restored, extra = manager.restore(state)
    if restored is not None:
        state = restored
        start_epoch = int(extra.get("epoch", 0)) + 1
        logger.info("resumed at step %d epoch %d", int(state.step), start_epoch)
    elif hps.train.pretrained_g:
        state = state.replace(
            g_params=ckpt_lib.load_torch_generator(
                hps.train.pretrained_g, hps, state.g_params
            )[0]
        )
        if hps.train.pretrained_d:
            state = state.replace(
                d_params=ckpt_lib.load_torch_discriminator(
                    hps.train.pretrained_d, state.d_params
                )[0]
            )
        logger.info("loaded pretrained torch checkpoints")

    state = replicate_tree(state, mesh)
    step_fn = make_train_step(syn, disc, g_tx, d_tx, hps)

    dataset = FeatureDataset(hps.data.training_files, hps)
    batches = batch_iterator(dataset, batch_size, seed=hps.train.seed)
    steps_per_epoch = max(len(dataset) // batch_size, 1)

    step = int(state.step)
    start_step = step  # rate accounting must ignore pre-resume steps
    t_start = time.time()
    for epoch in range(start_epoch, (hps.train.epochs or 1) + 1):
        state = set_learning_rate(state, epoch_lr(hps, epoch))
        for _ in range(steps_per_epoch):
            batch = next(batches)
            batch.pop("epoch", None)
            batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
            state, metrics = step_fn(state, batch, jax.random.fold_in(step_rng, step))
            step += 1

            if step % hps.train.log_interval == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                vals["learning_rate"] = epoch_lr(hps, epoch)
                vals["steps_per_sec"] = (step - start_step) / max(
                    time.time() - t_start, 1e-9
                )
                mlog.scalars(step, vals)
                logger.info("step %d: %s", step, {k: round(v, 4) for k, v in vals.items()})

            if step % hps.train.eval_interval == 0:
                manager.save(step, jax.device_get(state), extra={"epoch": epoch, "learning_rate": epoch_lr(hps, epoch)})
                _evaluate(hps, syn, state, mlog, step)

            if max_steps is not None and step >= max_steps:
                manager.save(step, jax.device_get(state), extra={"epoch": epoch, "learning_rate": epoch_lr(hps, epoch)})
                mlog.close()
                manager.close()
                return state
        logger.info("epoch %d done (%.1fs)", epoch, time.time() - t_start)
    mlog.close()
    manager.close()
    return state


def _evaluate(hps, syn, state, mlog: MetricsLogger, step: int):
    """Synthesize validation clips (train.py:276-325)."""
    try:
        val = FeatureDataset(hps.data.validation_files, hps, vol_aug=False)
    except FileNotFoundError:
        return
    if len(val) == 0:
        return
    g_params = jax.device_get(state.g_params)
    rng = np.random.default_rng(0)
    for i in range(min(2, len(val))):
        item = val.load_utterance(val.paths[i])
        t = min(item["f0"].shape[0], hps.data.pad_to_frames or 800)
        wav, _ = syn.apply(
            {"params": g_params},
            jnp.asarray(item["c"][None, :t]),
            jnp.asarray(item["f0"][None, :t]),
            jnp.asarray(item["uv"][None, :t]),
            jnp.asarray(np.int32([item["spk"]])),
            vol=jnp.asarray(item["volume"][None, :t]) if item["volume"] is not None else None,
            sample_noise=False,
            method=Synthesizer.infer,
        )
        wav = np.asarray(wav)[0, :, 0]
        mlog.audio(step, f"gen/audio_{i}", wav, hps.data.sampling_rate)
        gt_mel = dsp_stft.mel_spectrogram(
            jnp.asarray(item["wav"][None, : t * hps.data.hop_length]),
            n_fft=hps.data.filter_length,
            n_mels=hps.data.n_mel_channels,
            sample_rate=hps.data.sampling_rate,
            hop_length=hps.data.hop_length,
            win_length=hps.data.win_length,
            fmin=hps.data.mel_fmin,
            fmax=hps.data.mel_fmax,
        )
        gen_mel = dsp_stft.mel_spectrogram(
            jnp.asarray(wav[None]),
            n_fft=hps.data.filter_length,
            n_mels=hps.data.n_mel_channels,
            sample_rate=hps.data.sampling_rate,
            hop_length=hps.data.hop_length,
            win_length=hps.data.win_length,
            fmin=hps.data.mel_fmin,
            fmax=hps.data.mel_fmax,
        )
        tmin = min(gt_mel.shape[1], gen_mel.shape[1])
        mel_l1 = float(jnp.mean(jnp.abs(gt_mel[:, :tmin] - gen_mel[:, :tmin])))
        mlog.scalars(step, {f"eval/mel_l1_{i}": mel_l1})
    del rng
