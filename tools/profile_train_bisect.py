"""Bisect the fused GAN train step with tunnel-immune measurements.

Methodology (same as bench.py): every variant runs N iterations inside one
jitted lax.scan whose carry feeds iteration i+1 from iteration i's output
(sequential dependence - XLA cannot CSE/hoist the body), the carry is
donated, and only a scalar is materialized on the host. Grad variants apply
a tiny SGD step each iteration so params actually change; the optimizer
variant carries real opt state.

Run:  python tools/profile_train_bisect.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 10


def timed(name, make_loop, state):
    """state -> (state, scalar) loop; returns per-iter ms."""
    jitted = jax.jit(make_loop, donate_argnums=(0,))
    state, warm = jitted(state)
    np.asarray(warm)
    t0 = time.perf_counter()
    state, out = jitted(state)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:36s}{dt*1e3:8.2f} ms", flush=True)
    return dt


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
        g_params = factory.init_synthesizer_params(
            syn, jax.random.PRNGKey(0), hps, t_frames=16
        )
        d_params = factory.init_discriminator_params(
            disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
        )
    dev = jax.devices()[0]
    g_params = jax.device_put(g_params, dev)
    d_params = jax.device_put(d_params, dev)

    rng = np.random.default_rng(0)
    b, t, hop = 6, 512, hps.data.hop_length
    seg_samples = hps.train.segment_size
    seg_frames = seg_samples // hop
    batch = {
        "c": jnp.asarray(rng.standard_normal((b, t, hps.model.ssl_dim)), jnp.float32),
        "f0": jnp.asarray(rng.uniform(80, 400, (b, t)), jnp.float32),
        "uv": jnp.ones((b, t), jnp.float32),
        "spec": jnp.asarray(
            np.abs(rng.standard_normal((b, t, hps.data.filter_length // 2 + 1))),
            jnp.float32,
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

    def make_rngs(i):
        r = jax.random.fold_in(jax.random.PRNGKey(0), i)
        return {
            "noise": jax.random.fold_in(r, 0),
            "slice": jax.random.fold_in(r, 1),
            "dropout": jax.random.fold_in(r, 2),
        }

    def gen_forward(g_p, i):
        # perturb one input by the carry-dependent i so iterations differ
        bt = dict(batch)
        bt["c"] = batch["c"] + (i * 1e-6).astype(jnp.float32)
        return syn.apply(
            {"params": g_p}, bt["c"], bt["f0"], bt["uv"], bt["spec"],
            bt["spk"], bt["lengths"], vol=bt["volume"],
            deterministic=False, rngs=make_rngs(jnp.int32(0)),
        )

    # ---- floor --------------------------------------------------------
    def floor_loop(carry):
        def body(c, i):
            return c + 1.0, None
        c, _ = jax.lax.scan(body, carry, jnp.arange(ITERS, dtype=jnp.float32))
        return carry, c

    timed("floor (carry bump)", floor_loop, jnp.zeros(()))

    # ---- G forward ----------------------------------------------------
    def gfwd_loop(carry):
        def body(c, i):
            y, *_ = gen_forward(g_params, c)
            return c + y.astype(jnp.float32).sum() * 1e-20, None
        c, _ = jax.lax.scan(body, carry, jnp.arange(ITERS, dtype=jnp.float32))
        return carry, c

    timed("G forward", gfwd_loop, jnp.zeros(()))

    # ---- losses -------------------------------------------------------
    def g_loss_fn(g_p, i):
        (y_hat_g, ids, spec_mask, (z, z_p, m_p, logs_p, m_q, logs_q),
         pred_lf0, _nl, lf0) = gen_forward(g_p, i)
        y_seg = slice_segments(batch["wav"], ids * hop, seg_samples)
        mel_all = spec_to_mel(batch["spec"], **mel_kw)
        y_mel = slice_segments(mel_all, ids, seg_frames)
        y_hat_mel = mel_spectrogram(
            y_hat_g[..., 0], hop_length=hop, win_length=hps.data.win_length,
            **mel_kw,
        )
        _, f_logits, fmap_r, fmap_g = disc.apply(
            {"params": d_params}, y_seg, y_hat_g
        )
        return (
            jnp.mean(jnp.abs(y_mel - y_hat_mel)) * hps.train.c_mel
            + kl_loss(z_p, logs_q, m_p, logs_p, spec_mask) * hps.train.c_kl
            + feature_loss(fmap_r, fmap_g)
            + generator_loss(f_logits)[0]
            + jnp.mean((pred_lf0 - lf0) ** 2)
        )

    def ggrad_loop(gp):
        def body(p, i):
            g = jax.grad(g_loss_fn)(p, jnp.float32(0.0))
            # tiny SGD step: sequential dependence, params change per iter
            p = jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)
            return p, None
        gp, _ = jax.lax.scan(body, gp, jnp.arange(ITERS))
        return gp, jax.tree.leaves(gp)[0].astype(jnp.float32).sum()

    # donating variants each get their own buffer copy — donation frees
    # the input tree, and g_params/d_params are shared by later variants
    copy_tree = jax.jit(lambda p: jax.tree.map(lambda a: a + 0, p))
    t_g = timed("G fwd+bwd (full loss)", ggrad_loop, copy_tree(g_params))

    def d_loss_fn(d_p, i):
        y_hat, ids, *_ = gen_forward(g_params, i)
        y_hat = jax.lax.stop_gradient(y_hat)
        y_seg = slice_segments(
            batch["wav"], jax.lax.stop_gradient(ids) * hop, seg_samples
        )
        r_logits, f_logits, _, _ = disc.apply({"params": d_p}, y_seg, y_hat)
        return discriminator_loss(r_logits, f_logits)[0]

    def dgrad_loop(dp):
        def body(p, i):
            g = jax.grad(d_loss_fn)(p, jnp.float32(0.0))
            p = jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)
            return p, None
        dp, _ = jax.lax.scan(body, dp, jnp.arange(ITERS))
        return dp, jax.tree.leaves(dp)[0].astype(jnp.float32).sum()

    t_d = timed("D fwd+bwd (incl G fwd, stopgrad)", dgrad_loop,
                copy_tree(d_params))

    # ---- optimizer-only ----------------------------------------------
    g_tx = strain.make_optimizer(hps)
    d_tx = strain.make_optimizer(hps)
    g_grads = jax.jit(jax.grad(g_loss_fn))(g_params, jnp.float32(0.0))
    d_grads = jax.jit(jax.grad(d_loss_fn))(d_params, jnp.float32(0.0))

    def opt_loop(state):
        # grads ride in the donated carry — closing over them would bake
        # ~400 MB of constants into the HLO (tunnel 413s on the payload)
        def body(st, i):
            gp, dp, go, do, gg, dg = st
            gu, go = g_tx.update(gg, go, gp)
            gp = optax.apply_updates(gp, gu)
            du, do = d_tx.update(dg, do, dp)
            dp = optax.apply_updates(dp, du)
            return (gp, dp, go, do, gg, dg), None
        st, _ = jax.lax.scan(body, state, jnp.arange(ITERS))
        return st, jax.tree.leaves(st[0])[0].astype(jnp.float32).sum()

    opt0 = (copy_tree(g_params), copy_tree(d_params),
            jax.jit(g_tx.init)(g_params), jax.jit(d_tx.init)(d_params),
            g_grads, d_grads)
    t_o = timed("optimizer updates (G+D, adamw)", opt_loop, opt0)

    # ---- full fused step ---------------------------------------------
    raw_step = strain.make_train_step(syn, disc, g_tx, d_tx, hps, jit_compile=False)
    state0 = strain.create_train_state(
        copy_tree(g_params), copy_tree(d_params), g_tx, d_tx
    )

    def full_loop(st):
        def body(s, i):
            s, m = raw_step(s, batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return s, m["loss/g/total"]
        s, losses = jax.lax.scan(body, st, jnp.arange(ITERS))
        return s, losses.sum()

    t_f = timed("FULL fused train step", full_loop, state0)
    print(f"\nsteps/s: {1.0/t_f:.1f}   (G {t_g*1e3:.1f} + D {t_d*1e3:.1f} + "
          f"opt {t_o*1e3:.1f} ms as components)", flush=True)


if __name__ == "__main__":
    main()
