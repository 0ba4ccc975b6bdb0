"""Grouped conv1d with a TPU-shaped input-gradient path.

SUPERSEDED in round 5 for the production MSD path: nn/conv.py now lowers
wide grouped convs to a block-dense form (dense 128-wide kernel blocks +
feature_group_count = C_in/128), which measured faster in BOTH directions
than this custom VJP (tools/profile_msd_bwd.py: g64 2.53 -> 1.73 ms,
g256 3.41 -> 1.81 ms fwd+bwd on v5e). Kept as the measured baseline and
for configs whose channel counts don't divide into 128-lane blocks.

XLA's forward grouped conv is fine on v5e, but its input-gradient
(`conv_general_dilated` with lhs dilation and feature groups) picks a
batch-minor layout for the wide grouped towers of the scale
discriminator (models.py:206-212) and runs at a few percent lane
efficiency — measured 2.8 ms for the 256-group layer inside the train
step, vs ~0.05 ms of actual grouped FLOPs.

`grouped_conv1d` keeps XLA's forward and weight-gradient (both fast:
dw's output is only [k, cg, C_out]) and replaces ONLY dx:

    dx[b, t, ci] = sum_{tap, co in group(ci)} dout[b, to, co] * w[tap, j, co]
                   with t = to*stride + tap - pad

computed as one [B*T_out, C_out] @ [C_out, k*C_in] block-diagonal
matmul (off-block zeros are exact, MXU runs full 128-lane tiles)
followed by k static phase-shifted row accumulations. Exact: the same
multiply-add terms, reassociated; zeros contribute exactly zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _lax_conv(x, kernel, stride, pad, groups):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=(tuple(pad),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grouped_conv1d(x, kernel, stride, pad, groups):
    """x [B, T, C_in], kernel [k, C_in//groups, C_out], pad (lo, hi)."""
    return _lax_conv(x, kernel, stride, pad, groups)


def _fwd(x, kernel, stride, pad, groups):
    return _lax_conv(x, kernel, stride, pad, groups), (x, kernel)


def _bwd(stride, pad, groups, res, dout):
    x, kernel = res
    b, t_in, cin = x.shape
    k, cg, cout = kernel.shape
    cog = cout // groups
    t_out = dout.shape[1]

    # dw through XLA's own VJP (x is constant there, so the slow dx branch
    # is dead-code-eliminated)
    _, pull = jax.vjp(lambda kk: _lax_conv(x, kk, stride, pad, groups), kernel)
    (dk,) = pull(dout)

    # dx: one block-diagonal matmul over all taps...
    # D[tap, co, ci] = w[tap, j(ci), co] when group(ci) == group(co)
    idx = jnp.arange(groups)
    kd = jnp.zeros((k, groups, cog, groups, cg), kernel.dtype)
    kd = kd.at[:, idx, :, idx, :].set(
        kernel.reshape(k, cg, groups, cog).transpose(2, 0, 3, 1)
    )
    d_mat = kd.reshape(k, cout, cin)
    dxt = jnp.einsum(
        "bto,koi->bkti", dout, d_mat, preferred_element_type=jnp.float32
    )  # [B, k, T_out, C_in]

    # ...then static phase-shifted accumulation: contribution of tap lands
    # at t = to*stride + tap - pad = r*stride + phase
    assert t_in % stride == 0, (t_in, stride)
    rows = t_in // stride
    lo = pad[0]
    phases = [None] * stride
    for tap in range(k):
        d = tap - lo
        p = d % stride
        m = (d - p) // stride  # row shift, r = to + m
        contrib = dxt[:, tap]  # [B, T_out, C_in]
        src_lo = max(0, -m)
        src_hi = min(t_out, rows - m)
        if src_hi <= src_lo:
            continue
        piece = jnp.pad(
            contrib[:, src_lo:src_hi],
            ((0, 0), (src_lo + m, rows - (src_hi + m)), (0, 0)),
        )
        phases[p] = piece if phases[p] is None else phases[p] + piece
    zero = jnp.zeros((b, rows, cin), jnp.float32)
    dx = jnp.stack(
        [ph if ph is not None else zero for ph in phases], axis=2
    )  # [B, rows, stride, C_in]
    return dx.reshape(b, t_in, cin).astype(x.dtype), dk


grouped_conv1d.defvjp(_fwd, _bwd)
