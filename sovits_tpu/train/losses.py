"""GAN / VAE losses (modules/losses.py:4-58 equivalents, jnp).

All reductions in float32. LSGAN objectives, feature-matching L1 (x2, real
side stop-gradiented), masked KL between posterior and flow-mapped prior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discriminator_loss(real_outputs, fake_outputs):
    """LSGAN D loss: (1-D(y))^2 + D(y_hat)^2 (losses.py:15-28)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outputs, fake_outputs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(fake_outputs):
    """LSGAN G loss: (1-D(y_hat))^2 (losses.py:31-40)."""
    loss = 0.0
    gen_losses = []
    for dg in fake_outputs:
        dg = dg.astype(jnp.float32)
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def feature_loss(fmap_real, fmap_fake):
    """L1 feature matching over all discriminator layers, x2 (losses.py:4-12)."""
    loss = 0.0
    for dr, dg in zip(fmap_real, fmap_fake):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            gl = gl.astype(jnp.float32)
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """Masked KL(q||p) after the flow (losses.py:43-58).

    All inputs [B, T, C] (channels-last); z_mask [B, T, 1].
    """
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    # normalizer is sum over the [B, T, 1] mask (NOT x channels), matching
    # the reference where z_mask broadcasts over the channel dim.
    return kl / jnp.sum(z_mask)
