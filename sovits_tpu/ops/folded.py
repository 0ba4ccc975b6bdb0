"""Time-folded 1-D convolutions: MXU-shaped matmuls for small channel counts.

The NSF-HiFiGAN tail (vdecoder/hifigan/models.py:323-394 equivalent) runs
resblock convs at 16-64 channels over hundreds of thousands of samples.
Two TPU problems compound there:

1. a [T, C] conv with C < 128 starves the 128x128 MXU (C=16 fills 1.5% of
   the array), and
2. XLA lane-pads the minor dim of [B, T, C] to 128, so materializing any
   C=16 activation wastes 8x HBM traffic and inserts relayout copies.

Folding P consecutive samples into the channel dim fixes both: [T, C] is
viewed (row-major, no data movement in folded-resident pipelines) as
[T/P, P*C] and the conv becomes a handful of row-shifted [P*C x P*C]
matmuls:

    y_f[q] = sum_over_shifts_d  x_f[q + d] @ M_d
    M_d[r*Ci + ci, p*Co + co] = sum_j W[j, ci, co]
        where j, p satisfy  p*stride + j*dil - pad = d*P_in + r

The MAC overhead vs a dense conv is n_shifts*P/k (about 2-3.5x for the
HiFiGAN kernel sizes), but the matmuls run at full MXU occupancy, which
measures 2-4x faster end to end on v5e than XLA's conv at C<=64 (see
NOTES.md round-2 measurements). Everything is differentiable: the fold
matrices are built from the conv kernel with a constant 0/1 placement
tensor, so gradients flow to the original [k, Ci, Co] weights and the same
code path serves training.

The `*_f` variants take and return *folded* arrays so a whole stage can
stay folded (never materializing lane-padded small-C tensors); the plain
variants wrap them for unfolded [B, T, C] I/O.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def fold_placement(
    k: int, dilation: int, p: int, stride: int = 1, pad: int | None = None
) -> tuple[tuple[int, ...], np.ndarray]:
    """Placement tensor for a (possibly strided) conv with output fold P.

    Input is folded by P_in = P*stride. Output phase p_idx with tap j reads
    input sample p_idx*stride + j*dilation - pad (relative to the row
    origin). Returns (shifts, S[k, n_shifts, P_in, P]) where
    M_d = einsum('jrp,jio->(r i)(p o)', S[:, d], W).
    """
    if pad is None:
        pad = (k - 1) * dilation // 2
    p_in = p * stride
    entries = []  # (shift, j, r, p)
    for p_idx in range(p):
        for j in range(k):
            g = p_idx * stride + j * dilation - pad
            entries.append((g // p_in, j, g % p_in, p_idx))
    shifts = tuple(sorted({e[0] for e in entries}))
    index = {s: i for i, s in enumerate(shifts)}
    s_tensor = np.zeros((k, len(shifts), p_in, p), np.float32)
    for shift, j, r, p_idx in entries:
        s_tensor[j, index[shift], r, p_idx] += 1.0
    return shifts, s_tensor


@functools.lru_cache(maxsize=None)
def fold_placement_transposed(
    k: int, stride: int, padding: int, p_out: int
) -> tuple[tuple[int, ...], np.ndarray]:
    """Placement for a torch-style ConvTranspose1d(kernel, stride, padding).

    Output sample g = q*p_out + p takes input sample s when
    s*stride + j - padding == g for some tap j, i.e. j = g + padding - s*stride
    in [0, k). Input is folded by p_in = p_out // stride (stride must divide
    p_out). S has shape [k, n_shifts, p_in, p_out].
    """
    assert p_out % stride == 0, (p_out, stride)
    p_in = p_out // stride
    entries = []
    for p_idx in range(p_out):
        g = p_idx
        for j in range(k):
            num = g + padding - j
            if num % stride:
                continue
            s = num // stride
            entries.append((s // p_in, j, s % p_in, p_idx))
    shifts = tuple(sorted({e[0] for e in entries}))
    index = {s: i for i, s in enumerate(shifts)}
    s_tensor = np.zeros((k, len(shifts), p_in, p_out), np.float32)
    for shift, j, r, p_idx in entries:
        s_tensor[j, index[shift], r, p_idx] += 1.0
    return shifts, s_tensor


def pick_fold(channels: int, t: int, target_lanes: int = 128, cap: int = 8) -> int:
    """Largest power-of-two fold P <= cap with P*C >= target_lanes, P | T."""
    p = 1
    while p < cap and p * channels < target_lanes:
        p *= 2
    while p > 1 and t % p:
        p //= 2
    return p


def _fold_matrices(kernel: jax.Array, s_tensor: np.ndarray) -> jax.Array:
    """kernel [k, Ci, Co] + S [k, n, P_in, P_out] -> M [n, P_in*Ci, P_out*Co]."""
    _k, n, p_in, p_out = s_tensor.shape
    ci, co = kernel.shape[1], kernel.shape[2]
    m = jnp.einsum(
        "jnrp,jio->nripo", jnp.asarray(s_tensor, kernel.dtype), kernel
    )
    return m.reshape(n, p_in * ci, p_out * co)


def _shifted_matmul_sum(
    xf: jax.Array,  # [B, Q, P_in*Ci]
    m: jax.Array,  # [n, P_in*Ci, P_out*Co]
    shifts: tuple[int, ...],
) -> jax.Array:
    """sum_d xf[:, q + shifts[d], :] @ m[d], zero-padded at the edges (fp32 acc)."""
    b, q, _ = xf.shape
    lo, hi = shifts[0], shifts[-1]
    xp = jnp.pad(xf, ((0, 0), (max(-lo, 0), max(hi, 0)), (0, 0)))
    y = None
    for i, d in enumerate(shifts):
        s = d - min(lo, 0)
        t = jax.lax.dot_general(
            jax.lax.slice_in_dim(xp, s, s + q, axis=1),
            m[i],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = t if y is None else y + t
    return y


def folded_conv1d_f(
    xf: jax.Array,  # [B, Q, P*stride*Ci] folded input
    kernel: jax.Array,  # [k, Ci, Co]
    bias: jax.Array | None,
    dilation: int,
    p: int,  # output fold
    stride: int = 1,
    pad: int | None = None,
) -> jax.Array:
    """Folded-I/O (strided) conv: returns [B, Q, P*Co]."""
    k, ci, co = kernel.shape
    assert xf.shape[-1] == p * stride * ci, (xf.shape, p, stride, ci)
    shifts, s_tensor = fold_placement(k, dilation, p, stride, pad)
    m = _fold_matrices(kernel, s_tensor)
    y = _shifted_matmul_sum(xf, m, shifts)
    if bias is not None:
        y = y + jnp.tile(bias, p).astype(y.dtype)
    return y.astype(xf.dtype)


def folded_conv1d(
    x: jax.Array,  # [B, T, Ci]
    kernel: jax.Array,  # [k, Ci, Co]
    bias: jax.Array | None,
    dilation: int,
    p: int,
) -> jax.Array:
    """Stride-1 'same'-padded (torch symmetric) conv as folded matmuls."""
    b, t, ci = x.shape
    co = kernel.shape[2]
    assert t % p == 0, (t, p)
    y = folded_conv1d_f(x.reshape(b, t // p, p * ci), kernel, bias, dilation, p)
    return y.reshape(b, t, co)


def folded_conv_transpose1d_f(
    xf: jax.Array,  # [B, Q, p_in*Ci] folded input
    kernel: jax.Array,  # [k, Ci, Co] torch-tap-indexed
    bias: jax.Array | None,
    stride: int,
    padding: int,
    p_in: int,
    p_out: int | None = None,  # desired output fold; default stride*p_in
) -> jax.Array:
    """torch ConvTranspose1d as folded matmuls, folded I/O.

    Computes the full output lattice at fold p_full = stride*p_in, then
    re-views rows at p_out (p_full % p_out == 0). Only exact-length
    transposes are supported ((k - stride) == 2*padding, true for every
    HiFiGAN upsample config), so no cropping is needed.
    """
    b, q, d_in = xf.shape
    k, ci, co = kernel.shape
    assert d_in == p_in * ci, (xf.shape, p_in, ci)
    assert k - stride == 2 * padding, (
        "folded transpose requires exact length: k - stride == 2*padding"
    )
    p_full = stride * p_in
    shifts, s_tensor = fold_placement_transposed(k, stride, padding, p_full)
    m = _fold_matrices(kernel, s_tensor)
    y = _shifted_matmul_sum(xf, m, shifts)
    if bias is not None:
        y = y + jnp.tile(bias, p_full).astype(y.dtype)
    y = y.astype(xf.dtype)
    p_out = p_out or p_full
    assert p_full % p_out == 0, (p_full, p_out)
    r_up = p_full // p_out
    return y.reshape(b, q * r_up, p_out * co)


def folded_conv_transpose1d(
    x: jax.Array,  # [B, T, Ci]
    kernel: jax.Array,
    bias: jax.Array | None,
    stride: int,
    padding: int,
    p_out: int,
) -> jax.Array:
    """Unfolded-I/O wrapper: [B, T, Ci] -> [B, T*stride, Co]."""
    b, t, ci = x.shape
    co = kernel.shape[2]
    p_in = max(p_out // stride, 1)
    assert t % p_in == 0
    y = folded_conv_transpose1d_f(
        x.reshape(b, t // p_in, p_in * ci), kernel, bias, stride, padding,
        p_in, p_out=None,
    )
    return y.reshape(b, t * stride, co)
