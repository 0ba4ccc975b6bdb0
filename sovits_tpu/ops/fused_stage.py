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
trace. ``fused_resblock_trio_folded`` is the raw (non-differentiable)
kernel; ``trio_folded`` wraps it in a ``jax.custom_vjp`` whose backward
pass is the VJP of the mathematically identical folded-XLA chain
(``trio_folded_xla``), so the SAME Pallas forward serves training — the
r2/r3 VERDICT "train-path fused kernels" item. (The chains are the same
function up to bf16 rounding order, so the XLA-side gradient is the
correct gradient of what the Pallas kernel computes to within the usual
mixed-precision tolerance; tests/test_folded.py pins both.)
"""

from __future__ import annotations

import functools

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .folded import _fold_matrices, fold_placement, folded_conv1d_f

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
    # margin rows around the staging scratch so every shifted read is an
    # in-bounds static offset slice (tools/profile_trio_shift.py: reading
    # shifts straight from a margin-extended VMEM ref at fp32 runs the
    # matmuls at the fp32 MXU peak, ~1.4x faster than concat-rotated bf16
    # values — the NOTES.md "sublane offset" headroom, landed round 4)
    margin = -(-max(abs(s) for sh in conv_shifts for s in sh) // 8) * 8

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
    # balance blocks: q=1280 with block_q=1024 would pad the 2nd block to
    # 1024 rows (60% waste); 2 blocks of 640 instead
    block_q = max(-(-(-(-q // n_blocks)) // 8) * 8, 64)
    q_pad = n_blocks * block_q
    xp = jnp.pad(xf, ((0, 0), (halo, q_pad - q + halo), (0, 0)))
    r_rows = block_q + 2 * halo

    n_resblocks = len(kernel_sizes)
    pairs_per_rb = [len(d) for d in dilation_sizes]

    def kernel_fn(x_hbm, mats_ref, bias_ref, out_ref, xbuf, sbuf, sem):
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

        def conv(xin, conv_idx):
            # stage the (fp32) input in the margin scratch; each shifted
            # view is then a static offset slice of the REF, which Mosaic
            # feeds to the MXU without a separate rotate copy. Margin rows
            # hold stale data, but their influence never reaches past the
            # halo (same bounded-reach argument as the DMA'd halo itself).
            sbuf[margin : margin + r_rows] = xin
            shifts = conv_shifts[conv_idx]
            off = offsets[conv_idx]
            acc = None
            for j, s in enumerate(shifts):
                xs = sbuf[margin + s : margin + s + r_rows]
                term = jnp.dot(
                    xs, mats_ref[off + j], preferred_element_type=jnp.float32
                )
                acc = term if acc is None else acc + term
            return (acc + bias_ref[conv_idx]) * mask

        def lrelu(v):  # fp32 values: plain vector max
            return jnp.maximum(v, LRELU_SLOPE * v)

        x0 = xbuf[:].astype(jnp.float32)
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

        out = xs_sum / float(n_resblocks)
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
            pltpu.VMEM((r_rows + 2 * margin, d_model), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, mats, fbias)
    return out[:, :q]


def _lrelu(v):
    return jnp.maximum(v, LRELU_SLOPE * v)


def trio_folded_xla(
    xf: jax.Array,
    kernels: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    p: int,
    kernel_sizes: Sequence[int] = (3, 7, 11),
    dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
) -> jax.Array:
    """The trio as differentiable folded-XLA matmuls: mathematically the
    same chain the Pallas kernel runs (per-conv fp32 accumulate + cast to
    the input dtype, zero-padded edges). Serves as the custom-VJP backward
    reference and the non-TPU fallback."""
    idx = 0
    xs_sum = None
    for k, dils in zip(kernel_sizes, dilation_sizes):
        xr = xf
        for d in dils:
            xt = _lrelu(xr)
            xt = folded_conv1d_f(xt, kernels[idx], biases[idx], d, p)
            xt = _lrelu(xt)
            xt = folded_conv1d_f(xt, kernels[idx + 1], biases[idx + 1], 1, p)
            idx += 2
            xr = xt + xr
        xs_sum = xr if xs_sum is None else xs_sum + xr
    return (xs_sum.astype(jnp.float32) / len(kernel_sizes)).astype(xf.dtype)


@functools.lru_cache(maxsize=None)
def _make_trio_vjp(p, kernel_sizes, dilation_sizes, block_q):
    """custom_vjp trio for a static stage config: Pallas forward, XLA-chain
    backward (recompute-based; no activation storage beyond the input)."""

    @jax.custom_vjp
    def trio(xf, kernels, biases):
        return fused_resblock_trio_folded(
            xf, kernels, biases, p, kernel_sizes, dilation_sizes, block_q
        )

    def fwd(xf, kernels, biases):
        return trio(xf, kernels, biases), (xf, tuple(kernels), tuple(biases))

    def bwd(res, g):
        xf, kernels, biases = res
        _, pullback = jax.vjp(
            lambda x, ks, bs: trio_folded_xla(
                x, ks, bs, p, kernel_sizes, dilation_sizes
            ),
            xf, kernels, biases,
        )
        return pullback(g)

    trio.defvjp(fwd, bwd)
    return trio


def trio_folded(
    xf: jax.Array,
    kernels: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    p: int,
    kernel_sizes: Sequence[int] = (3, 7, 11),
    dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    block_q: int = 1024,
) -> jax.Array:
    """Differentiable fused trio: Pallas forward + folded-XLA backward.

    This is the train-path entry point (models/nsf_hifigan.py fused_tail):
    the forward runs the VMEM-resident Pallas kernel, and gradients flow
    through the recomputed XLA chain — rematerialization instead of
    activation storage, the TPU-friendly trade."""
    fn = _make_trio_vjp(
        int(p), tuple(kernel_sizes), tuple(map(tuple, dilation_sizes)),
        int(block_q),
    )
    return fn(xf, tuple(kernels), tuple(biases))
