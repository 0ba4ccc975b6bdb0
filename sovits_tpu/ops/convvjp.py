"""Stride-1 NWC conv with a matmul backward (custom VJP).

XLA's own VJP of `conv_general_dilated` lowers the input- and weight-
gradients through conv-transpose machinery that materializes im2col halo
tensors ([B-blocks, 65, C, k] slices): the round-5 train-step trace shows
~1.2 ms/step of that for the 32 WaveNet convs (enc_q 16 + flow 4x4,
modules/modules.py:90-145 equivalents) plus the attention FFN convs.

Forward stays the XLA conv (identical numerics and speed). The backward
is written directly as k accumulated shifted matmuls:

    dx[t]  = sum_j dy[t - (j*dil - pad)] @ W[j]^T
    dW[j]  = x_shift_j^T @ dy      (contracting batch and time)

— full-width MXU feeds with fp32 accumulation, no halo materialization.
Only 'same'-symmetric-padded stride-1 groups-1 convs are supported (the
train-path WN/FFN shapes); callers gate on that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _conv_fwd(x, w, dilation, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv1d_mm_vjp(x: jax.Array, w: jax.Array, dilation: int, pad: int):
    """[B,T,Ci] x [k,Ci,Co] -> [B,T',Co], stride 1, symmetric pad."""
    return _conv_fwd(x, w, dilation, pad)


def _fwd(x, w, dilation, pad):
    return _conv_fwd(x, w, dilation, pad), (x, w)


def _bwd(dilation, pad, res, dy):
    x, w = res
    k, ci, co = w.shape
    b, t, _ = x.shape
    t_out = t + 2 * pad - (k - 1) * dilation
    # dW[j] = x_pad[:, j*dil : j*dil + T', :]^T @ dy  (contract b, t)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    dw = jnp.stack(
        [
            jax.lax.dot_general(
                jax.lax.dynamic_slice_in_dim(xp, j * dilation, t_out, 1),
                dy,
                (((0, 1), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for j in range(k)
        ],
        axis=0,
    ).astype(w.dtype)
    # dx[t] = sum_j dy[t + pad - j*dil] @ W[j]^T  (zero outside dy's range)
    lead = (k - 1) * dilation - pad
    dyp = jnp.pad(dy, ((0, 0), (lead, pad), (0, 0)))
    dx = None
    for j in range(k):
        off = (k - 1 - j) * dilation
        term = jax.lax.dot_general(
            jax.lax.dynamic_slice_in_dim(dyp, off, t, 1),
            w[j],
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx = term if dx is None else dx + term
    return dx.astype(x.dtype), dw


conv1d_mm_vjp.defvjp(_fwd, _bwd)
