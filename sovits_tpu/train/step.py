"""Fused GAN training step (train.py:150-213 semantics, one jitted program).

Per step, exactly like the reference:
1. generator forward (random slice + posterior sample),
2. D update on (y, stop_grad(y_hat)) with LSGAN loss,
3. G update against the *updated* discriminator with
   mel L1 * c_mel + KL * c_kl + feature-matching + LSGAN + lf0 MSE.

The generator forward in step 3 re-runs under grad with the SAME rng keys,
so y_hat/slice indices are identical to step 2 (the reference reuses the
retained graph; recompute is the TPU-friendly equivalent — rematerialization
instead of activation storage).

Gradients are value-clipped never (the reference calls clip_grad_value_ with
clip_value=None, which only *measures* the global norm, commons.py:168-183);
we log optax.global_norm identically. AdamW(lr, betas=(0.8,0.99), eps=1e-9,
weight_decay=0.01 — torch default) with per-epoch exponential decay applied
by the caller through the injected learning rate.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..dsp.sequence import slice_segments
from ..dsp.stft import mel_spectrogram, spec_to_mel
from .losses import discriminator_loss, feature_loss, generator_loss, kl_loss


def make_optimizer(hps) -> optax.GradientTransformation:
    # Default: packed AdamW — the small-leaf cohort updates as ONE fused
    # chain (optax.adamw dispatches ~3 kernels per leaf x ~400 leaves,
    # ~3 ms/step of launch floor on v5e). optax.flatten was tried and
    # measured WORSE (57 vs 44 ms/step device time: it concatenates the
    # FULL ~400 MB of params+grads every step); packing only the small
    # leaves keeps the concat traffic at a few MB. Exact optax.adamw
    # numerics (tests/test_train.py::test_packed_adamw_matches_optax).
    if hps.train.get("packed_adamw", True):
        from .optim import packed_adamw

        return optax.inject_hyperparams(
            packed_adamw, static_args=("pack_max",)
        )(
            learning_rate=hps.train.learning_rate,
            b1=hps.train.betas[0],
            b2=hps.train.betas[1],
            eps=hps.train.eps,
            weight_decay=0.01,
            pack_max=int(hps.train.get("adamw_pack_max", 1 << 16)),
        )
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=hps.train.learning_rate,
        b1=hps.train.betas[0],
        b2=hps.train.betas[1],
        eps=hps.train.eps,
        weight_decay=0.01,
    )


class GanTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any


def create_train_state(g_params, d_params, g_tx, d_tx) -> GanTrainState:
    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
    )


def set_learning_rate(state: GanTrainState, lr: float) -> GanTrainState:
    """Inject a new learning rate (per-epoch schedule lives host-side)."""
    g_opt = state.g_opt_state
    d_opt = state.d_opt_state
    g_opt.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    d_opt.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(g_opt_state=g_opt, d_opt_state=d_opt)


def make_train_step(
    synthesizer,
    discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    hps,
    jit_compile: bool = True,
    state_shardings=None,
) -> Callable:
    """Build the train step closed over static modules/config.

    jit_compile=False returns the raw traceable body (for embedding in an
    outer scan, e.g. the benchmark's device-side loop).
    state_shardings (a GanTrainState tree of NamedShardings, see
    parallel.tree_shardings) pins the jit's state input AND output layout,
    so FSDP-style model-axis parameter sharding survives the optimizer
    update instead of being silently re-replicated by propagation."""

    hop = hps.data.hop_length
    seg_frames = hps.train.segment_size // hop
    seg_samples = hps.train.segment_size
    c_mel = hps.train.c_mel
    c_kl = hps.train.c_kl
    mel_kw = dict(
        n_fft=hps.data.filter_length,
        n_mels=hps.data.n_mel_channels,
        sample_rate=hps.data.sampling_rate,
        fmin=hps.data.mel_fmin,
        fmax=hps.data.mel_fmax,
    )
    use_f0_pred = bool(hps.model.use_automatic_f0_prediction)

    def gen_forward(g_params, batch, rngs):
        return synthesizer.apply(
            {"params": g_params},
            batch["c"],
            batch["f0"],
            batch["uv"],
            batch["spec"],
            batch["spk"],
            batch["lengths"],
            vol=batch.get("volume"),
            deterministic=False,
            rngs=rngs,
        )

    def train_step(state: GanTrainState, batch: dict, rng: jax.Array):
        rngs = {
            "noise": jax.random.fold_in(rng, 0),
            "slice": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
        }

        mel = spec_to_mel(batch["spec"], **mel_kw)  # [B, T, M]

        # ---- ONE generator forward serves both steps -------------------
        # The reference runs SynthesizerTrn once and reuses y_hat for the D
        # step (detached) and the G step (train.py:150-233). Mirroring that
        # with jax.vjp: the forward's residuals are kept, the D step trains
        # on the stop-gradient primal, and the G gradients are pulled back
        # through the saved vjp — the second full generator forward the
        # previous two-closure formulation traced is gone.
        outs, gen_vjp = jax.vjp(
            lambda p: gen_forward(p, batch, rngs), state.g_params
        )
        y_hat, ids_slice = outs[0], outs[1]
        y_hat_sg = jax.lax.stop_gradient(y_hat)
        ids_slice = jax.lax.stop_gradient(ids_slice)
        y_seg = slice_segments(batch["wav"], ids_slice * hop, seg_samples)

        def d_loss_fn(d_params):
            r_logits, f_logits, _, _ = discriminator.apply(
                {"params": d_params}, y_seg, y_hat_sg
            )
            loss_disc, _, _ = discriminator_loss(r_logits, f_logits)
            return loss_disc

        loss_disc, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        grad_norm_d = optax.global_norm(d_grads)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G step against the updated D (same forward outputs) -------
        y_mel = slice_segments(mel, ids_slice, seg_frames)

        def head_loss(outs):
            (
                y_hat_g,
                _ids,
                spec_mask,
                (z, z_p, m_p, logs_p, m_q, logs_q),
                pred_lf0,
                norm_lf0,
                lf0,
            ) = outs
            y_hat_mel = mel_spectrogram(
                y_hat_g[..., 0],
                hop_length=hop,
                win_length=hps.data.win_length,
                **mel_kw,
            )
            _, f_logits, fmap_r, fmap_g = discriminator.apply(
                {"params": d_params}, y_seg, y_hat_g
            )
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * c_mel
            loss_kl = kl_loss(z_p, logs_q, m_p, logs_p, spec_mask) * c_kl
            loss_fm = feature_loss(fmap_r, fmap_g)
            loss_gen, _ = generator_loss(f_logits)
            if use_f0_pred:
                loss_lf0 = jnp.mean((pred_lf0 - lf0) ** 2)
            else:
                loss_lf0 = jnp.zeros(())
            total = loss_gen + loss_fm + loss_mel + loss_kl + loss_lf0
            return total, {
                "loss/g/total": total,
                "loss/g/mel": loss_mel,
                "loss/g/kl": loss_kl,
                "loss/g/fm": loss_fm,
                "loss/g/gen": loss_gen,
                "loss/g/lf0": loss_lf0,
            }

        # allow_int: `outs` carries the int32 slice ids; their cotangent is
        # float0 and vanishes inside gen_vjp
        (_, metrics), out_grads = jax.value_and_grad(
            head_loss, has_aux=True, allow_int=True
        )(outs)
        (g_grads,) = gen_vjp(out_grads)
        grad_norm_g = optax.global_norm(g_grads)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics.update(
            {
                "loss/d/total": loss_disc,
                "grad_norm_d": grad_norm_d,
                "grad_norm_g": grad_norm_g,
            }
        )
        new_state = GanTrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
        )
        return new_state, metrics

    if jit_compile:
        if state_shardings is not None:
            return jax.jit(
                train_step,
                donate_argnums=(0,),
                in_shardings=(state_shardings, None, None),
                out_shardings=(state_shardings, None),
            )
        return jax.jit(train_step, donate_argnums=(0,))
    return train_step
