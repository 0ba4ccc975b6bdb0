"""Pallas TPU kernel: one NSF-HiFiGAN upsample stage's resblock trio, fused.

The vocoder tail (vdecoder/hifigan/models.py:375-388 equivalent) runs, per
upsample stage, three parallel ResBlock1 chains (3x [lrelu - dilated conv -
lrelu - conv - residual]) that are averaged. At 16-64 channels XLA executes
18 separate convs with HBM round trips between each. This kernel:

- time-folds the activations to [T/P, P*C] so each conv is a few
  [P*C x P*C] MXU matmuls over row-shifted views (see ops/folded.py),
- keeps the whole trio resident in VMEM per time block: the input block
  (+halo for the chain's receptive field) is DMA'd in once, all 18 convs,
  leaky-relus and residual adds run on-chip, and only the averaged result
  is written back,
- masks rows outside the signal after every conv so zero 'same' padding
  semantics match the reference exactly at clip edges.

Weights are pre-folded to dense shift matrices on the host side of the
trace (differentiability is not needed: this is the inference engine path;
training uses the autodiff-able folded XLA formulation in nn/conv.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .folded import _fold_matrices, fold_placement

LRELU_SLOPE = 0.1


def _trio_plan(kernel_sizes, dilation_sizes, p):
    """Static plan: per conv (in chain order) its shifts; plus halo rows."""
    convs = []  # list of (shifts tuple)
    for k, dils in zip(kernel_sizes, dilation_sizes):
        for d in dils:
            convs.append(fold_placement(k, d, p)[0])  # conv1 (dilated)
            convs.append(fold_placement(k, 1, p)[0])  # conv2
    # halo: each resblock chain consumes its own sum of max reaches; the
    # trio runs in parallel so the halo is the max over resblocks
    halo = 0
    i = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        reach = 0
        for d in dils:
            s1 = convs[i]
            s2 = convs[i + 1]
            reach += max(-s1[0], s1[-1]) + max(-s2[0], s2[-1])
            i += 2
        halo = max(halo, reach)
    return convs, halo


def fused_resblock_trio(
    x: jax.Array,  # [B, T, C]
    kernels: Sequence[jax.Array],  # 18 conv kernels [k, C, C], chain order
    biases: Sequence[jax.Array],  # 18 biases [C]
    kernel_sizes: Sequence[int] = (3, 7, 11),
    dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    p: int | None = None,
    block_q: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """xs = mean_j ResBlock1_j(x), all on-chip. Returns [B, T, C]."""
    b, t, c = x.shape
    if p is None:
        p = 1
        while p < 8 and p * c < 128:
            p *= 2
        while p > 1 and t % p:
            p //= 2
    assert t % p == 0
    y = fused_resblock_trio_folded(
        x.reshape(b, t // p, p * c), kernels, biases, p,
        kernel_sizes, dilation_sizes, block_q, interpret,
    )
    return y.reshape(b, t, c)


def fused_resblock_trio_folded(
    xf: jax.Array,  # [B, Q, P*C] folded input (stays folded)
    kernels: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    p: int,
    kernel_sizes: Sequence[int] = (3, 7, 11),
    dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    block_q: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    b, q, d_model = xf.shape
    c = d_model // p
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    conv_shifts, halo = _trio_plan(kernel_sizes, dilation_sizes, p)
    halo = -(-halo // 8) * 8  # DMA slices must align to the (8, 128) tiling

    # fold all conv kernels into shift matrices, concatenated [N, D, D]
    mats = []
    offsets = []
    idx = 0
    for _k, dils in zip(kernel_sizes, dilation_sizes):
        for d in dils:
            for dil in (d, 1):
                kern = kernels[idx]
                _, s_tensor = fold_placement(int(kern.shape[0]), dil, p)
                offsets.append(len(mats))
                m = _fold_matrices(kern.astype(jnp.float32), s_tensor)
                mats.extend(jnp.split(m, m.shape[0], axis=0))
                idx += 1
    mats = jnp.concatenate(mats, axis=0).astype(xf.dtype)  # [N, D, D]
    fbias = jnp.stack([jnp.tile(bb, p) for bb in biases]).astype(jnp.float32)

    block_q = min(block_q, max(-(-q // 8) * 8, 64))
    n_blocks = -(-q // block_q)
    q_pad = n_blocks * block_q
    xp = jnp.pad(xf, ((0, 0), (halo, q_pad - q + halo), (0, 0)))
    r_rows = block_q + 2 * halo

    n_resblocks = len(kernel_sizes)
    pairs_per_rb = [len(d) for d in dilation_sizes]

    def kernel_fn(x_hbm, mats_ref, bias_ref, out_ref, xbuf, sem):
        bi = pl.program_id(0)
        qi = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(qi * block_q, r_rows), :], xbuf, sem
        )
        dma.start()
        dma.wait()

        # rows outside the real signal must stay zero (torch zero-padding
        # semantics for every conv in the chain)
        row_g = (
            jax.lax.broadcasted_iota(jnp.int32, (r_rows, 1), 0)
            + qi * block_q
            - halo
        )
        mask = jnp.logical_and(row_g >= 0, row_g < q).astype(jnp.float32)

        x0 = xbuf[:]

        def conv(xin, conv_idx):
            shifts = conv_shifts[conv_idx]
            off = offsets[conv_idx]
            acc = None
            for j, s in enumerate(shifts):
                # want xs[r] = xin[r + s]: static rotate via two slices
                # (Mosaic's dynamic_rotate lacks bf16 support; wrap rows
                # land in the halo margin and are never consumed)
                a = (-s) % r_rows
                xs = (
                    jnp.concatenate([xin[r_rows - a :], xin[: r_rows - a]], axis=0)
                    if s
                    else xin
                )
                term = jnp.dot(
                    xs, mats_ref[off + j], preferred_element_type=jnp.float32
                )
                acc = term if acc is None else acc + term
            y = (acc + bias_ref[conv_idx]) * mask
            return y.astype(xin.dtype)

        def lrelu(v):
            # leaky_relu via |x| (Mosaic lacks bf16 vector compares):
            # max(x, s*x) == (1+s)/2 * x + (1-s)/2 * |x| for s in [0, 1]
            return (
                jnp.float32(0.5 * (1 + LRELU_SLOPE)).astype(v.dtype) * v
                + jnp.float32(0.5 * (1 - LRELU_SLOPE)).astype(v.dtype) * jnp.abs(v)
            )

        xs_sum = None
        conv_idx = 0
        for rb in range(n_resblocks):
            xr = x0
            for _pair in range(pairs_per_rb[rb]):
                xt = lrelu(xr)
                xt = conv(xt, conv_idx)
                xt = lrelu(xt)
                xt = conv(xt, conv_idx + 1)
                conv_idx += 2
                xr = xt + xr
            xs_sum = xr if xs_sum is None else xs_sum + xr

        out = xs_sum.astype(jnp.float32) / float(n_resblocks)
        out_ref[0] = out[halo : halo + block_q].astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, q_pad, d_model), xf.dtype),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x stays in HBM, DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all fold matrices
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_model), lambda bi, qi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((r_rows, d_model), xf.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, mats, fbias)
    return out[:, :q]
