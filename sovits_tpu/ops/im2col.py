"""im2col matmul lowerings for small-T / grouped discriminator convs.

XLA's conv lowering on TPU builds halo/window machinery that dominates when
the spatial extent is tiny (the discriminator towers shrink T to 10-160 by
the deep layers while K stays 5-41): the round-5 train-step trace shows the
MSD g64/g256 backward at ~3% MFU and the MPD 1024-channel stages at ~20%.
Materializing the K shifted views once ([B, T', K, C] — K-fold activation
bytes, trivial at these sizes) turns every conv into one dense MXU matmul
with K·C-deep contraction:

    y[b, t, g, o] = sum_{j,i} cols[b, t, j, g, i] * W[j, i, g, o]

Coarse feature groups (g = C_in/128 blocks, exactly the dense-block
expansion nn/conv.py uses for the wide grouped MSD layers) ride the einsum
batch dim, so every contraction stays 128-lane-aligned — unlike the r2
fine-grouped im2col (N = 4 lanes, rejected with measurements), these are
full-width MXU feeds.

Autodiff gives the natural transposes: wgrad is one matmul per block,
dgrad is the pad/slice transpose plus a matmul.

Reference architecture being lowered: /root/reference/models.py:165-227
(DiscriminatorP/DiscriminatorS towers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cols_1d(
    x: jax.Array, k: int, stride: int, pad: int, dilation: int = 1
) -> jax.Array:
    """[B, T, C] -> [B, T_out, k, C] of the k strided taps."""
    b, t, c = x.shape
    t_out = (t + 2 * pad - (k - 1) * dilation - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    need = (t_out - 1) * stride + 1
    return jnp.stack(
        [
            jax.lax.slice(
                xp, (0, j * dilation, 0), (b, j * dilation + need, c),
                (1, stride, 1),
            )
            for j in range(k)
        ],
        axis=2,
    )


def conv1d_im2col(
    x: jax.Array,  # [B, T, C_in]
    kernel: jax.Array,  # [k, C_in // nb, features] (dense or block-dense)
    bias: jax.Array | None,
    stride: int,
    pad: int,
    dilation: int = 1,
    nb: int = 1,  # coarse feature groups (feature_group_count equivalent)
) -> jax.Array:
    k, cib, features = kernel.shape
    b, t, cin = x.shape
    assert cin == cib * nb, (x.shape, kernel.shape, nb)
    cols = _cols_1d(x, k, stride, pad, dilation)  # [B, T', k, C_in]
    if nb == 1:
        t_out = cols.shape[1]
        y = jax.lax.dot_general(
            cols.reshape(b, t_out, k * cin),
            kernel.reshape(k * cin, features),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        fb = features // nb
        cols = cols.reshape(b, cols.shape[1], k, nb, cib)
        kk = kernel.reshape(k, cib, nb, fb)
        y = jnp.einsum(
            "btjgi,jigo->btgo", cols, kk,
            preferred_element_type=jnp.float32,
        )
        y = y.reshape(b, y.shape[1], features)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def conv2d_w1_shift(
    x: jax.Array,  # [B, H, W, C_in]  (NHWC, kernel (k, 1))
    kernel: jax.Array,  # [k, 1, C_in, features]
    bias: jax.Array | None,
    stride: int,  # over H; W stride must be 1
    pad: int,  # over H; W pad must be 0
) -> jax.Array:
    """(k, 1) NHWC conv as k accumulated shifted matmuls (no im2col
    materialization: each tap is one [B*H'*W, C] @ [C, F] MXU feed and the
    backward is the transposed matmuls — no conv halo machinery, which
    dominates the period discriminators' deep layers at H ~ 11-56)."""
    k = kernel.shape[0]
    b, h, w, c = x.shape
    h_out = (h + 2 * pad - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    need = (h_out - 1) * stride + 1
    y = None
    for j in range(k):
        tap = jax.lax.slice(
            xp, (0, j, 0, 0), (b, j + need, w, c), (1, stride, 1, 1)
        )
        t = jax.lax.dot_general(
            tap, kernel[j, 0],
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = t if y is None else y + t
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def conv2d_w1_im2col(
    x: jax.Array,  # [B, H, W, C_in]  (NHWC, kernel (k, 1))
    kernel: jax.Array,  # [k, 1, C_in, features]
    bias: jax.Array | None,
    stride: int,  # over H; W stride must be 1
    pad: int,  # over H; W pad must be 0
) -> jax.Array:
    """(k, 1) NHWC conv (the period discriminators' only shape) as im2col."""
    k = kernel.shape[0]
    b, h, w, c = x.shape
    h_out = (h + 2 * pad - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    need = (h_out - 1) * stride + 1
    cols = jnp.stack(
        [
            jax.lax.slice(
                xp, (0, j, 0, 0), (b, j + need, w, c), (1, stride, 1, 1)
            )
            for j in range(k)
        ],
        axis=2,
    )  # [B, H', k, W, C]
    y = jnp.einsum(
        "bhjwi,jio->bhwo", cols, kernel[:, 0],
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)
