"""Bisect the fused GAN train step: time variants with pieces disabled.

All grads are consumed via a full-tree sum (defeats DCE). Device-side scan
loops (one dispatch per measurement) with an empty-loop floor subtracted.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(Path(__file__).parent.parent))


def loop_time(step_fn, state, iters=20):
    """Time state = step_fn(state, i) iterated in a scan, per iteration."""

    def loop(state):
        def body(st, i):
            return step_fn(st, i), None

        st, _ = jax.lax.scan(body, state, jnp.arange(iters, dtype=jnp.int32))
        return st

    jitted = jax.jit(loop)
    state = jitted(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    np.asarray(jax.tree.leaves(state)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    state = jitted(state)
    np.asarray(jax.tree.leaves(state)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def tree_sum(tree):
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(tree))


def main():
    from sovits_tpu import config as scfg
    from sovits_tpu import train as strain
    from sovits_tpu.dsp.sequence import slice_segments
    from sovits_tpu.dsp.stft import mel_spectrogram, spec_to_mel
    from sovits_tpu.models import factory
    from sovits_tpu.train.losses import (
        discriminator_loss, feature_loss, generator_loss, kl_loss,
    )

    hps = scfg.default_config()
    syn = factory.build_synthesizer(hps, dtype=jnp.bfloat16)
    disc = factory.build_discriminator(hps, dtype=jnp.bfloat16)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
        d_params = factory.init_discriminator_params(
            disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
        )
    g_params = jax.device_put(g_params, jax.devices()[0])
    d_params = jax.device_put(d_params, jax.devices()[0])

    rng = np.random.default_rng(0)
    b, t, hop = 6, 512, hps.data.hop_length
    seg_samples = hps.train.segment_size
    seg_frames = seg_samples // hop
    batch = {
        "c": jnp.asarray(rng.standard_normal((b, t, hps.model.ssl_dim)), jnp.float32),
        "f0": jnp.asarray(rng.uniform(80, 400, (b, t)), jnp.float32),
        "uv": jnp.ones((b, t), jnp.float32),
        "spec": jnp.asarray(
            np.abs(rng.standard_normal((b, t, hps.data.filter_length // 2 + 1))), jnp.float32
        ),
        "wav": jnp.asarray(rng.standard_normal((b, t * hop, 1)) * 0.1, jnp.float32),
        "spk": jnp.zeros((b,), jnp.int32),
        "lengths": jnp.full((b,), t, jnp.int32),
        "volume": jnp.abs(jnp.asarray(rng.standard_normal((b, t)), jnp.float32)) * 0.05,
    }
    mel_kw = dict(
        n_fft=hps.data.filter_length, n_mels=hps.data.n_mel_channels,
        sample_rate=hps.data.sampling_rate, fmin=hps.data.mel_fmin,
        fmax=hps.data.mel_fmax,
    )

    def gen_forward(g_p, rngs):
        return syn.apply(
            {"params": g_p}, batch["c"], batch["f0"], batch["uv"],
            batch["spec"], batch["spk"], batch["lengths"], vol=batch["volume"],
            deterministic=False, rngs=rngs,
        )

    def make_rngs(i):
        r = jax.random.fold_in(jax.random.PRNGKey(0), i)
        return {
            "noise": jax.random.fold_in(r, 0),
            "slice": jax.random.fold_in(r, 1),
            "dropout": jax.random.fold_in(r, 2),
        }

    # floor
    print(f"{'floor (carry bump)':34s}{loop_time(lambda st, i: st + 1.0, jnp.zeros(()))*1e3:8.2f} ms")

    # A: generator forward only
    def v_gen_fwd(carry, i):
        y_hat, *_ = gen_forward(g_params, make_rngs(i))
        return carry + jnp.sum(y_hat.astype(jnp.float32))

    print(f"{'gen forward':34s}{loop_time(v_gen_fwd, jnp.zeros(()))*1e3:8.2f} ms")

    # B: G grad of full GAN loss (all grads consumed)
    def g_loss_fn(g_p, i):
        rngs = make_rngs(i)
        (y_hat_g, ids, spec_mask, (z, z_p, m_p, logs_p, m_q, logs_q),
         pred_lf0, norm_lf0, lf0) = gen_forward(g_p, rngs)
        y_seg = slice_segments(batch["wav"], ids * hop, seg_samples)
        mel_all = spec_to_mel(batch["spec"], **mel_kw)
        y_mel = slice_segments(mel_all, ids, seg_frames)
        y_hat_mel = mel_spectrogram(
            y_hat_g[..., 0], hop_length=hop, win_length=hps.data.win_length, **mel_kw
        )
        _, f_logits, fmap_r, fmap_g = disc.apply({"params": d_params}, y_seg, y_hat_g)
        return (
            jnp.mean(jnp.abs(y_mel - y_hat_mel)) * hps.train.c_mel
            + kl_loss(z_p, logs_q, m_p, logs_p, spec_mask) * hps.train.c_kl
            + feature_loss(fmap_r, fmap_g)
            + generator_loss(f_logits)[0]
            + jnp.mean((pred_lf0 - lf0) ** 2)
        )

    def v_g_grad(state, i):
        carry, gp = state
        g = jax.grad(g_loss_fn)(gp, i)
        return (carry + tree_sum(g), gp)

    print(f"{'G grad (full loss, all grads)':34s}{loop_time(v_g_grad, (jnp.zeros(()), g_params))*1e3:8.2f} ms")

    # C: D grad (all grads)
    def d_loss_fn(d_p, gp, i):
        rngs = make_rngs(i)
        y_hat, ids, *_ = gen_forward(gp, rngs)
        y_hat = jax.lax.stop_gradient(y_hat)
        y_seg = slice_segments(batch["wav"], jax.lax.stop_gradient(ids) * hop, seg_samples)
        r_logits, f_logits, _, _ = disc.apply({"params": d_p}, y_seg, y_hat)
        return discriminator_loss(r_logits, f_logits)[0]

    def v_d_grad(state, i):
        carry, dp, gp = state
        g = jax.grad(d_loss_fn)(dp, gp, i)
        return (carry + tree_sum(g), dp, gp)

    print(f"{'D grad (incl gen fwd, all grads)':34s}{loop_time(v_d_grad, (jnp.zeros(()), d_params, g_params))*1e3:8.2f} ms")

    # D: optimizer updates only (fixed grads as state)
    g_tx = strain.make_optimizer(hps)
    d_tx = strain.make_optimizer(hps)
    g_grads = jax.jit(jax.grad(g_loss_fn))(g_params, 0)
    d_grads = jax.jit(jax.grad(d_loss_fn))(d_params, g_params, 0)
    opt_state = (
        g_params, d_params,
        jax.jit(g_tx.init)(g_params), jax.jit(d_tx.init)(d_params),
        g_grads, d_grads,
    )

    def v_opt(state, i):
        g_p, d_p, g_o, d_o, gg, dg = state
        gu, g_o = g_tx.update(gg, g_o, g_p)
        g_p = optax.apply_updates(g_p, gu)
        du, d_o = d_tx.update(dg, d_o, d_p)
        d_p = optax.apply_updates(d_p, du)
        return (g_p, d_p, g_o, d_o, gg, dg)

    print(f"{'optimizer updates (G+D)':34s}{loop_time(v_opt, opt_state)*1e3:8.2f} ms")

    # E: grad norms
    def v_norms(state, i):
        carry, gg, dg = state
        return (carry + optax.global_norm(gg) + optax.global_norm(dg), gg, dg)

    print(f"{'global_norm(G)+global_norm(D)':34s}{loop_time(v_norms, (jnp.zeros(()), g_grads, d_grads))*1e3:8.2f} ms")

    # F: the real fused step
    raw_step = strain.make_train_step(syn, disc, g_tx, d_tx, hps, jit_compile=False)
    state0 = strain.create_train_state(g_params, d_params, g_tx, d_tx)

    def v_full(st, i):
        st, _metrics = raw_step(st, batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
        return st

    print(f"{'FULL fused train step':34s}{loop_time(v_full, state0)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
