"""Checkpoint save/restore: orbax-backed, reference-workflow compatible.

Mirrors the reference's checkpoint story (utils.py:155-225):
- periodic save of both nets + optimizer states + step/epoch/lr,
- keep-N retention (clean_checkpoints) via orbax CheckpointManagerOptions,
- shape-tolerant partial load for the pretrained-model workflow
  (utils.py:168-183: anything missing or mismatched falls back to the
  freshly-initialized value with a warning),
- import of reference-trained torch checkpoints (G_*.pth / D_*.pth) through
  convert.from_torch.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str | Path, keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep if keep and keep > 0 else None, create=True
            ),
        )

    def save(self, step: int, state, extra: dict | None = None) -> None:
        # fixed extra schema so restore templates always match
        full_extra = {"epoch": 0, "learning_rate": 0.0}
        full_extra.update(extra or {})
        payload = {
            "state": jax.tree.map(np.asarray, state_to_tree(state)),
            "extra": full_extra,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state, step: int | None = None):
        """Restore into the structure of ``state``; returns (state, extra)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        template = {
            "state": jax.tree.map(np.asarray, state_to_tree(state)),
            "extra": {"epoch": 0, "learning_rate": 0.0},
        }
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return tree_to_state(state, restored["state"]), restored["extra"]

    def close(self):
        self._mgr.close()


def state_to_tree(state) -> dict:
    return {
        "step": state.step,
        "g_params": state.g_params,
        "d_params": state.d_params,
        "g_opt_state": state.g_opt_state,
        "d_opt_state": state.d_opt_state,
    }


def tree_to_state(template_state, tree: dict):
    # StandardRestore used the template's structure for non-dict leaves
    # (optax states restore as matching pytrees), so a direct replace works.
    g_opt = jax.tree.unflatten(
        jax.tree.structure(template_state.g_opt_state),
        jax.tree.leaves(tree["g_opt_state"]),
    )
    d_opt = jax.tree.unflatten(
        jax.tree.structure(template_state.d_opt_state),
        jax.tree.leaves(tree["d_opt_state"]),
    )
    return template_state.replace(
        step=tree["step"],
        g_params=tree["g_params"],
        d_params=tree["d_params"],
        g_opt_state=g_opt,
        d_opt_state=d_opt,
    )


def merge_pretrained(init_params: dict, loaded: dict, path: str = "") -> dict:
    """Shape-tolerant merge: take loaded values where shapes match.

    The reference's pretrained-model workflow (utils.py:168-183): keys
    missing from the checkpoint or with mismatched shapes keep their fresh
    initialization, with a warning.
    """
    out = {}
    for k, v in init_params.items():
        sub_path = f"{path}/{k}" if path else k
        if isinstance(v, dict):
            out[k] = merge_pretrained(v, loaded.get(k, {}) if isinstance(loaded, dict) else {}, sub_path)
        else:
            lv = loaded.get(k) if isinstance(loaded, dict) else None
            if lv is not None and tuple(np.shape(lv)) == tuple(np.shape(v)):
                out[k] = jax.numpy.asarray(lv, dtype=v.dtype) if hasattr(v, "dtype") else lv
            else:
                if lv is not None:
                    logger.warning(
                        "shape mismatch at %s: ckpt %s vs init %s — keeping init",
                        sub_path,
                        np.shape(lv),
                        np.shape(v),
                    )
                else:
                    logger.warning("%s not in checkpoint — keeping init", sub_path)
                out[k] = v
    return out


def load_torch_generator(path: str, hps, init_params: dict) -> tuple[dict, int]:
    """Import a reference G_*.pth into Synthesizer params (utils.py:155-187)."""
    import torch

    from ..convert import from_torch as ft

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.float().numpy() for k, v in ckpt["model"].items()}
    m = hps.model
    converted = ft.synthesizer(
        sd,
        n_flows=4 if not m.use_transformer_flow else m.n_flow_layer,
        use_transformer_flow=bool(m.use_transformer_flow),
        flow_share_parameter=bool(m.flow_share_parameter),
        use_automatic_f0_prediction=bool(m.use_automatic_f0_prediction),
        vol_embedding=bool(m.vol_embedding),
        n_upsamples=len(m.upsample_rates),
        n_resblock_kernels=len(m.resblock_kernel_sizes),
        resblock_type=m.resblock,
    )
    return merge_pretrained(init_params, converted), int(ckpt.get("iteration", 0))


def load_torch_discriminator(path: str, init_params: dict) -> tuple[dict, int]:
    """Import a reference D_*.pth into MPD params."""
    import torch

    from ..convert import from_torch as ft

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.float().numpy() for k, v in ckpt["model"].items()}
    converted = ft.multi_period_discriminator(sd)
    return merge_pretrained(init_params, converted), int(ckpt.get("iteration", 0))
