"""Diffusion trainer: Unit2Mel on preprocessed mel/units/f0/vol artifacts.

Equivalent of train_diff.py + diffusion/solver.py:93-199 + data_loaders.py:
AdamW + StepLR(gamma, decay_step), noise-prediction MSE, periodic
save/val with RTF measurement (solver.py:54-59), NaN hard abort
(solver.py:136-137). Data-parallel over the 'data' mesh axis like the GAN
trainer (the reference's diffusion trainer is single-device only,
train_diff.py:62-65 — this one shards the batch).

The yaml config schema matches configs_template/diffusion_template.yaml.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np
import yaml

import jax
import jax.numpy as jnp
import optax

from ..config import HParams
from ..models.diffusion import Unit2Mel
from ..parallel import make_mesh, replicate_tree, shard_batch
from ..train.data import load_filelist
from .trainer import MetricsLogger

logger = logging.getLogger("sovits_tpu.train_diff")

DIFFUSION_DEFAULTS = {
    "data": {
        "sampling_rate": 44100,
        "block_size": 512,
        "duration": 2,
        "encoder": "vec768l12",
        "encoder_sample_rate": 16000,
        "encoder_hop_size": 320,
        "encoder_out_channels": 768,
        "training_files": "filelists/train.txt",
        "validation_files": "filelists/val.txt",
        "unit_interpolate_mode": "nearest",
    },
    "model": {
        "type": "Diffusion",
        "n_layers": 20,
        "n_chans": 512,
        "n_hidden": 256,
        "use_pitch_aug": True,
        "timesteps": 1000,
        "k_step_max": 0,
        "n_spk": 1,
    },
    "vocoder": {"type": "nsf-hifigan", "ckpt": "pretrain/nsf_hifigan/model"},
    "infer": {"speedup": 10, "method": "dpm-solver++"},
    "env": {"expdir": "logs/44k/diffusion"},
    "train": {
        "batch_size": 48,
        "epochs": 100000,
        "interval_log": 10,
        "interval_val": 2000,
        "interval_force_save": 5000,
        "lr": 1e-4,
        "decay_step": 100000,
        "gamma": 0.5,
        "weight_decay": 0,
        "cache_all_data": True,
    },
    "spk": {},
}


def load_diffusion_config(path: str | Path) -> HParams:
    with open(path) as f:
        loaded = yaml.safe_load(f)
    cfg = json.loads(json.dumps(DIFFUSION_DEFAULTS))

    def merge(dst, src):
        for k, v in (src or {}).items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(cfg, loaded)
    return HParams(**cfg)


def build_unit2mel(args: HParams, vocoder_dim: int = 128) -> Unit2Mel:
    m = args.model
    return Unit2Mel(
        input_channel=args.data.encoder_out_channels,
        n_spk=m.n_spk,
        use_pitch_aug=bool(m.use_pitch_aug),
        out_dims=vocoder_dim,
        n_layers=m.n_layers,
        n_chans=m.n_chans,
        n_hidden=m.n_hidden,
        timesteps=m.timesteps or 1000,
        k_step_max=m.k_step_max or 0,
    )


def load_torch_unit2mel(path: str, args: HParams, vocoder_dim: int = 128):
    """load_model_vocoder's model-loading half (diffusion/unit2mel.py:22-58)."""
    import torch

    from ..convert import from_torch as ft

    model = build_unit2mel(args, vocoder_dim)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.float().numpy() for k, v in ckpt["model"].items()}
    params = jax.tree.map(
        jnp.asarray, ft.unit2mel(sd, n_layers=args.model.n_layers)
    )
    return model, {"params": params}


class DiffusionDataset:
    """Loads diffusion artifacts (diffusion/data_loaders.py:54-287 contract).

    Per wav: .soft.npy units, .f0.npy, .vol.npy, .mel.npy (+ optional
    .aug_mel.npy/.aug_vol.npy — a random aug variant is chosen per example,
    with keyshift scaling f0 by 2^(shift/12), data_loaders.py:247-262).
    Random `duration`-second crops padded to fixed frames.
    """

    def __init__(self, filelist: str, args: HParams, spk_map: dict | None = None,
                 cache_all_data: bool | None = None):
        self.paths = load_filelist(filelist)
        self.args = args
        self.hop = args.data.block_size
        self.frames = int(
            args.data.duration * args.data.sampling_rate / self.hop
        )
        self.spk_map = spk_map or dict(args.spk.items() if args.spk else [])
        self.use_aug = bool(args.model.use_pitch_aug)
        # full-RAM cache (data_loaders.py:127-205, config cache_all_data)
        if cache_all_data is None:
            cache_all_data = bool(args.train.cache_all_data)
        self._cache: dict[str, tuple] | None = {} if cache_all_data else None
        if self._cache is not None:
            for p in self.paths:
                self._cache[p] = self._load(p)

    def _load(self, path: str) -> tuple:
        f0, _uv = np.load(path + ".f0.npy", allow_pickle=True)
        f0 = np.asarray(f0, np.float32)
        vol = np.load(path + ".vol.npy").astype(np.float32)
        mel = np.load(path + ".mel.npy").astype(np.float32)  # [T, M]
        units = np.load(path + ".soft.npy").astype(np.float32).T  # [T_u, H]
        aug = None
        if self.use_aug and Path(path + ".aug_mel.npy").exists():
            aug_mel, keyshift = np.load(path + ".aug_mel.npy", allow_pickle=True)
            aug_vol = np.load(path + ".aug_vol.npy").astype(np.float32)
            aug = (np.asarray(aug_mel, np.float32), float(keyshift), aug_vol)
        return f0, vol, mel, units, aug

    def __len__(self):
        return len(self.paths)

    def example(self, index: int, rng: np.random.Generator) -> dict:
        from ..dsp.audio import repeat_expand

        path = self.paths[index]
        loaded = self._cache[path] if self._cache is not None else self._load(path)
        f0, vol, mel, units, aug = loaded
        aug_shift = 0.0
        if aug is not None and rng.random() < 0.5:
            aug_mel, keyshift, aug_vol = aug
            mel, vol = aug_mel, aug_vol
            f0 = f0 * 2 ** (keyshift / 12.0)
            aug_shift = keyshift

        t = min(len(f0), mel.shape[0], len(vol))
        if units.shape[0] != t:
            units = np.asarray(repeat_expand(jnp.asarray(units), t,
                                             self.args.data.unit_interpolate_mode))
        f0, vol, mel, units = f0[:t], vol[:t], mel[:t], units[:t]

        if t > self.frames:
            s = rng.integers(0, t - self.frames + 1)
            f0, vol, mel, units = (
                f0[s : s + self.frames],
                vol[s : s + self.frames],
                mel[s : s + self.frames],
                units[s : s + self.frames],
            )
            t = self.frames

        def pad(x):
            width = [(0, self.frames - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, width)

        spk = self.spk_map.get(Path(path).parent.name, 0)
        return {
            "units": pad(units),
            "f0": pad(f0),
            "volume": pad(vol),
            "mel": pad(mel),
            "aug_shift": np.float32(aug_shift),
            "spk": np.int32(spk),
        }


def train_diffusion(args: HParams, expdir: str | Path | None = None,
                    max_steps: int | None = None, vocoder_dim: int = 128,
                    resume: bool = True):
    """Diffusion training with the reference solver's operational surface
    (diffusion/solver.py:93-199): resume from the latest checkpoint
    (optimizer state included, logger/utils.py:102-127), validation loss +
    RTF at interval_val (solver.py:13-90), interval_force_save milestones
    that retention never deletes (logger/saver.py:102-143), and the
    cache_all_data RAM cache (data_loaders.py:127-205)."""
    import orbax.checkpoint as ocp

    expdir = Path(expdir or args.env.expdir)
    expdir.mkdir(parents=True, exist_ok=True)
    mlog = MetricsLogger(expdir)

    mesh = make_mesh()
    n_data = mesh.shape["data"]
    batch_size = args.train.batch_size
    batch_size -= batch_size % n_data
    batch_size = max(batch_size, n_data)

    model = build_unit2mel(args, vocoder_dim)
    dataset = DiffusionDataset(args.data.training_files, args)
    val_files = args.data.validation_files
    val_dataset = (
        DiffusionDataset(val_files, args, cache_all_data=False)
        if val_files and Path(val_files).exists()
        else None
    )

    rng = np.random.default_rng(1234)
    ex = dataset.example(0, rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(ex["units"][None]),
        jnp.asarray(ex["f0"][None]),
        jnp.asarray(ex["volume"][None]),
        spk_id=jnp.asarray([0], jnp.int32),
        aug_shift=jnp.asarray([0.0]),
        gt_spec=jnp.asarray(ex["mel"][None]),
        infer=False,
    )
    params = variables["params"]

    schedule = optax.exponential_decay(
        args.train.lr, transition_steps=args.train.decay_step,
        decay_rate=args.train.gamma, staircase=True,
    )
    tx = optax.adamw(schedule, weight_decay=args.train.weight_decay or 0.0)
    opt_state = tx.init(params)

    interval_val = args.train.interval_val or 2000
    force_save = args.train.interval_force_save or 0
    mgr = ocp.CheckpointManager(
        (expdir / "ckpt").absolute(),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=int(args.train.keep_ckpts or 3),
            # milestones are never deleted (saver.py interval_force_save)
            keep_period=force_save if force_save > 0 else None,
            create=True,
        ),
    )
    step = 0
    if resume and mgr.latest_step() is not None:
        step = mgr.latest_step()
        template = {"params": jax.tree.map(np.asarray, jax.device_get(params)),
                    "opt_state": jax.tree.map(np.asarray, jax.device_get(opt_state))}
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        params = jax.tree.unflatten(
            jax.tree.structure(params), jax.tree.leaves(restored["params"])
        )
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_state), jax.tree.leaves(restored["opt_state"])
        )
        logger.info("resumed diffusion training from step %d", step)

    @jax.jit
    def step_fn(params, opt_state, batch, key):
        def loss_fn(p):
            return model.apply(
                {"params": p},
                batch["units"],
                batch["f0"],
                batch["volume"],
                spk_id=batch["spk"],
                aug_shift=batch["aug_shift"],
                gt_spec=batch["mel"],
                infer=False,
                rng=key,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def val_loss_fn(params, batch):
        return model.apply(
            {"params": params},
            batch["units"], batch["f0"], batch["volume"],
            spk_id=batch["spk"], aug_shift=batch["aug_shift"],
            gt_spec=batch["mel"], infer=False,
            rng=jax.random.PRNGKey(0),  # fixed noise: comparable val losses
        )

    def validate(step, params_host):
        if val_dataset is None:
            return
        vrng = np.random.default_rng(0)
        losses = [
            float(val_loss_fn(params_host, {
                k: jnp.asarray(v[None]) if np.ndim(v) else jnp.asarray([v])
                for k, v in val_dataset.example(i, vrng).items()
            }))
            for i in range(min(len(val_dataset), 8))
        ]
        rtf = measure_rtf(model, {"params": params_host}, val_dataset, args,
                          n_clips=1)
        mlog.scalars(step, {"loss/val_diffusion": float(np.mean(losses)),
                            "val_rtf": rtf})

    def save(step):
        payload = {"params": jax.tree.map(np.asarray, jax.device_get(params)),
                   "opt_state": jax.tree.map(np.asarray, jax.device_get(opt_state))}
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()
        _save(expdir, step, params, opt_state)

    params = replicate_tree(params, mesh)
    opt_state = replicate_tree(opt_state, mesh)

    start_step = step
    key = jax.random.PRNGKey(1234)
    t0 = time.time()
    order = rng.permutation(len(dataset))
    pos = 0
    while max_steps is None or step < max_steps:
        idxs = []
        while len(idxs) < batch_size:
            if pos >= len(order):
                order = rng.permutation(len(dataset))
                pos = 0
            idxs.append(order[pos])
            pos += 1
        examples = [dataset.example(i, rng) for i in idxs]
        batch = {k: np.stack([e[k] for e in examples]) for k in examples[0]}
        batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        params, opt_state, loss = step_fn(
            params, opt_state, batch, jax.random.fold_in(key, step)
        )
        step += 1
        loss_val = float(loss)
        if not np.isfinite(loss_val):
            raise RuntimeError(f"NaN/Inf loss at step {step} — aborting (solver.py:136)")
        if step % (args.train.interval_log or 10) == 0:
            # rate over *this run's* steps only (correct after resume)
            rate = (step - start_step) / max(time.time() - t0, 1e-9)
            mlog.scalars(step, {"loss/diffusion": loss_val,
                                "steps_per_sec": rate})
        at_end = max_steps is not None and step >= max_steps
        if step % interval_val == 0 or at_end:
            save(step)
            validate(step, jax.device_get(params))
        elif force_save and step % force_save == 0:
            save(step)
    mlog.close()
    mgr.close()
    return params


def _save(expdir: Path, step: int, params, opt_state=None):
    """Portable release artifact (Svc/DiffusionRefiner loads this .npz)."""
    from ..cli.tools import flatten_params

    flat = flatten_params(jax.device_get(params))
    np.savez_compressed(expdir / f"model_{step}.npz", **flat)


def measure_rtf(model, variables, dataset: DiffusionDataset, args, n_clips: int = 3):
    """Validation RTF harness (diffusion/solver.py:54-59)."""
    rng = np.random.default_rng(0)
    rtfs = []
    for i in range(min(n_clips, len(dataset))):
        ex = dataset.example(i, rng)
        seconds = len(ex["f0"]) * args.data.block_size / args.data.sampling_rate
        t0 = time.time()
        mel = model.apply(
            variables,
            jnp.asarray(ex["units"][None]),
            jnp.asarray(ex["f0"][None]),
            jnp.asarray(ex["volume"][None]),
            spk_id=jnp.asarray([int(ex["spk"])], jnp.int32),
            gt_spec=jnp.asarray(ex["mel"][None]),
            infer=True,
            infer_speedup=args.infer.speedup,
            sampler=args.infer.method,
            k_step=min(100, args.model.timesteps or 1000),
            rngs={"noise": jax.random.PRNGKey(i)},
        )
        jax.block_until_ready(mel)
        rtfs.append((time.time() - t0) / seconds)
    return float(np.mean(rtfs))
