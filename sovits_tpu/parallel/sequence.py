"""Sequence-parallel NSF-HiFiGAN decode: time-sharded over the mesh.

SURVEY §5.7: the reference handles long audio purely by host-side
chunking; on TPU the natural scaling axis for a single long song is the
time dimension — the vocoder is where ~97% of inference FLOPs live and
it is a pure conv pipeline, so a time shard only needs a halo of its
neighbours' frames (the tail's receptive field) to reproduce the
monolithic result exactly.

`sharded_decode` runs the decoder under `shard_map` over one mesh axis:

- halo exchange: each shard sends its edge frames to its neighbours
  with `lax.ppermute` (one left, one right hop over ICI),
- sine-phase continuity: the NSF source's per-harmonic phase is an
  exclusive cumsum over frames; each shard computes its local phase
  advance, `lax.all_gather`s the per-shard sums (tiny [n, B, 9]), and
  starts its oscillator at the exclusive prefix — bit-matching the
  monolithic phase up to fp reassociation,
- each shard decodes its haloed chunk and keeps the central
  `T_local * prod(upsample_rates)` samples.

Deterministic decode (rng=None) matches the unsharded decoder to fp
tolerance everywhere, including across shard seams
(tests/test_sequence_parallel.py on the 8-device CPU mesh).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _frame_adv(f0: jax.Array, sample_rate: int, upp: int, h: int = 9):
    """Per-frame phase advance (turns) per harmonic: [B, H, T_f]."""
    harmonics = jnp.arange(1, h + 1, dtype=jnp.float32)
    rad = (f0.astype(jnp.float32)[:, None, :] * harmonics[None, :, None]
           / sample_rate) % 1.0
    return (rad * upp) % 1.0


def required_halo_frames(generator) -> int:
    """One-sided receptive field of the decode pipeline, in input frames.

    Sums conv_pre + per-stage [transposed upsample + noise conv + resblock
    trio] + conv_post reaches, each converted back to frame rate, so the
    halo is derived from the generator's actual config instead of guessed.
    """
    reach = 3.0  # conv_pre: k=7, symmetric padding, at frame rate
    c = 1.0  # cumulative upsample factor at the current stage's input
    rates = list(generator.upsample_rates)
    full = float(np.prod(rates))
    rb = max(
        sum((rk - 1) // 2 * (d + 1) for d in dil)
        for rk, dil in zip(
            generator.resblock_kernel_sizes, generator.resblock_dilation_sizes
        )
    )
    for i, (u, k) in enumerate(zip(rates, generator.upsample_kernel_sizes)):
        # ConvTranspose1d(k, stride=u, pad=(k-u)//2): output p reads inputs
        # in [(p + pad - k + 1) / u, (p + pad) / u] -> one-sided input reach
        # <= ceil(pad / u) samples at the stage-input rate
        reach += float(-(-((k - u) // 2) // u)) / c
        c *= u
        if i + 1 < len(rates):
            # noise conv: kernel 2*stride_f0 over the full-rate source
            reach += float(np.prod(rates[i + 1:])) / full
        reach += rb / c  # parallel resblocks: max chain reach at stage rate
    reach += 3.0 / full  # conv_post: k=7 at sample rate
    return int(np.ceil(reach))


def sharded_decode(
    generator,
    params,
    x: jax.Array,  # [B, T_f, C]
    f0: jax.Array,  # [B, T_f]
    g: jax.Array | None,
    mesh: Mesh,
    axis: str = "data",
    halo: int | None = None,  # frames; None derives it from the generator
    rng: jax.Array | None = None,  # enables the NSF source noise
) -> jax.Array:
    """Time-sharded decode. Returns [B, T_f * upp, 1].

    rng=None decodes deterministically. With an rng, the NSF source's
    additive noise and random harmonic phases are ON: every shard receives
    the SAME key (so the rand-ini phases agree) and the per-sample noise is
    drawn counter-based per absolute frame (SourceModuleHnNSF
    noise_frames), so the sharded result equals the monolithic decode with
    the same key and noise_frames=(0, T_f) bit-for-bit away from the song
    edges."""
    n = mesh.shape[axis]
    b, t_f, c = x.shape
    needed = required_halo_frames(generator)
    if halo is None:
        halo = needed
    assert halo >= needed, (
        f"halo={halo} frames does not cover the generator's receptive "
        f"field ({needed} frames): shard seams would be wrong"
    )
    upp = int(np.prod(generator.upsample_rates))
    assert t_f % n == 0, (
        f"frames ({t_f}) must divide the '{axis}' axis size ({n}); "
        "pad with masked frames first"
    )
    sr = generator.sampling_rate

    has_g = g is not None

    def local(x_s, f0_s, g_rep):
        # x_s [B, T_f/n, C], f0_s [B, T_f/n]
        idx = jax.lax.axis_index(axis)
        tl = x_s.shape[1]

        # ---- sine-phase exclusive prefix over shards ------------------
        adv = _frame_adv(f0_s, sr, upp)  # [B, H, tl]
        adv_sum = jnp.sum(adv, axis=-1)  # [B, H]
        all_sums = jax.lax.all_gather(adv_sum, axis)  # [n, B, H]
        before = jnp.arange(n) < idx
        phase0 = jnp.sum(
            jnp.where(before[:, None, None], all_sums, 0.0), axis=0
        )  # [B, H]

        # ---- halo exchange (left and right neighbours) ----------------
        right_edge = jax.lax.ppermute(  # shard i -> i+1: left halo
            jax.lax.slice_in_dim(x_s, tl - halo, tl, axis=1),
            axis, [(i, i + 1) for i in range(n - 1)],
        )
        left_edge = jax.lax.ppermute(  # shard i -> i-1: right halo
            jax.lax.slice_in_dim(x_s, 0, halo, axis=1),
            axis, [(i, i - 1) for i in range(1, n)],
        )
        f0_right = jax.lax.ppermute(
            jax.lax.slice_in_dim(f0_s, tl - halo, tl, axis=1),
            axis, [(i, i + 1) for i in range(n - 1)],
        )
        f0_left = jax.lax.ppermute(
            jax.lax.slice_in_dim(f0_s, 0, halo, axis=1),
            axis, [(i, i - 1) for i in range(1, n)],
        )
        # edge shards receive zeros from ppermute (no source): that matches
        # zero padding, and their outputs there are discarded anyway
        x_ext = jnp.concatenate([right_edge, x_s, left_edge], axis=1)
        f0_ext = jnp.concatenate([f0_right, f0_s, f0_left], axis=1)

        # the extended chunk starts `halo` frames earlier: rewind the phase
        phase0_ext = phase0 - jnp.sum(
            _frame_adv(f0_ext[:, :halo], sr, upp), axis=-1
        )

        wav_ext = generator.apply(
            {"params": params}, x_ext, f0_ext,
            g_rep if has_g else None, phase0=phase0_ext,
            rng=rng,
            noise_frames=(idx * tl - halo, t_f) if rng is not None else None,
        )  # [B, (tl + 2*halo) * upp, 1]
        return jax.lax.slice_in_dim(
            wav_ext, halo * upp, (halo + tl) * upp, axis=1
        )

    specs_in = (
        P(None, axis, None),
        P(None, axis),
        P(),
    )
    fn = shard_map(
        local, mesh=mesh, in_specs=specs_in, out_specs=P(None, axis, None),
        check_rep=False,
    )
    g_in = g if g is not None else jnp.zeros((b, 1, generator.gin_channels), x.dtype)
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    f0 = jax.device_put(f0, NamedSharding(mesh, P(None, axis)))
    return fn(x, f0, g_in)
