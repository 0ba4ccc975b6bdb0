"""Pallas TPU kernel: fused (relative-position) attention, fwd + bwd.

The synthesizer's attention stacks (ContentEncoder with Shaw window-4
relative attention, attentions.py:161-314; the causal F0Decoder FFT,
attentions.py:12-70) are small — T<=1024, d_head 96 — so the whole
[T, T] score matrix fits in VMEM. The XLA formulation materializes
scores, band bias, masks, softmax and attention weights as separate
HBM-round-trip tensors (measured ~8 ms of a 42 ms train step for the
two stacks); this kernel runs the entire attention for one (batch,
head) in VMEM:

- scores = q @ k^T accumulated in f32 on the MXU,
- the Shaw band bias added as 2w+1 masked diagonal adds straight from
  the [2w+1, d] table (no [T, 2L-1] padded logits — see
  nn/attention.py's banded path for the algebra),
- causal / key-side masking via iota compares (key-side-only masking is
  exact on valid rows; masked-query rows are zeroed downstream exactly
  as the reference's x_mask multiplications do),
- f32 softmax, optional dropout via a precomputed keep/(1-rate) mask
  (flax-RNG generated outside; rides in as an input),
- out = p @ v plus the value-side band contribution.

The backward kernel consumes the stored softmax output p and replays
the same algebra: softmax VJP in f32, band extractions as masked
row-sums, dq/dk/dv, and the shared rel-table grads as per-program
partials summed outside.

Parity + gradient checks vs the jnp formulation:
tests/test_attention_kernel.py (interpret mode on the CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -1e4  # the reference's masking constant


def _offsets(t: int):
    t_i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return s_i - t_i


def _fwd_kernel(
    q_ref, k_ref, v_ref, relk_ref, relv_ref, kmask_ref, dmask_ref,
    out_ref, p_ref, *, window, causal, dropout, masked,
):
    q = q_ref[0]
    t = q.shape[0]
    scores = jnp.dot(q, k_ref[0].T, preferred_element_type=jnp.float32)
    off = _offsets(t)
    if window is not None:
        rl = jnp.dot(
            q, relk_ref[:].T, preferred_element_type=jnp.float32
        )  # [T, 2w+1]
        for o in range(2 * window + 1):
            scores += jnp.where(off == o - window, rl[:, o : o + 1], 0.0)
    if causal:
        scores = jnp.where(off <= 0, scores, NEG)
    if masked:
        # f32 compare: Mosaic has no bf16 vector compares on this target
        km = kmask_ref[0].astype(jnp.float32)
        scores = jnp.where(km > 0, scores, NEG)  # [1, T] broadcast
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    p_lo = p.astype(p_ref.dtype)
    p_ref[0] = p_lo
    pt = p_lo.astype(jnp.float32)
    if dropout:
        pt = pt * dmask_ref[0].astype(jnp.float32)
    out = jnp.dot(
        pt.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    if window is not None:
        relv = relv_ref[:].astype(jnp.float32)
        for o in range(2 * window + 1):
            pb = jnp.sum(
                jnp.where(off == o - window, pt, 0.0), axis=1, keepdims=True
            )  # [T, 1]
            out += pb * relv[o][None, :]
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, relk_ref, relv_ref, dmask_ref, p_ref, dout_ref,
    dq_ref, dk_ref, dv_ref, drelk_ref, drelv_ref,
    *, window, dropout,
):
    # masked/causal positions carry p ~ 0, so their VJP terms vanish
    # without replaying the masks
    t = q_ref[0].shape[0]
    off = _offsets(t)
    w = window
    win = 0 if w is None else 2 * w + 1

    p32 = p_ref[0].astype(jnp.float32)
    dout = dout_ref[0]

    dm = dmask_ref[0].astype(jnp.float32) if dropout else None
    pt = p32 * dm if dropout else p32

    dv_ref[0] = jnp.dot(
        pt.astype(dout.dtype).T, dout, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)

    # d(pt) = dout @ v^T (+ value-side band)
    g = jnp.dot(dout, v_ref[0].T, preferred_element_type=jnp.float32)
    if w is not None:
        pband = jnp.concatenate(
            [
                jnp.sum(jnp.where(off == o - w, pt, 0.0), axis=1, keepdims=True)
                for o in range(win)
            ],
            axis=1,
        )  # [T, win]
        drelv_ref[0] = jnp.dot(
            pband.astype(dout.dtype).T, dout, preferred_element_type=jnp.float32
        ).astype(drelv_ref.dtype)
        gr = jnp.dot(
            dout, relv_ref[:].astype(dout.dtype).T,
            preferred_element_type=jnp.float32,
        )  # [T, win]
        for o in range(win):
            g += jnp.where(off == o - w, gr[:, o : o + 1], 0.0)

    if dropout:
        g = g * dm

    # softmax VJP in f32
    ds = p32 * (g - jnp.sum(g * p32, axis=1, keepdims=True))
    ds_lo = ds.astype(q_ref.dtype)

    dq = jnp.dot(ds_lo, k_ref[0], preferred_element_type=jnp.float32)
    dk = jnp.dot(ds_lo.T, q_ref[0], preferred_element_type=jnp.float32)
    if w is not None:
        dsband = jnp.concatenate(
            [
                jnp.sum(jnp.where(off == o - w, ds, 0.0), axis=1, keepdims=True)
                for o in range(win)
            ],
            axis=1,
        )
        dq += jnp.dot(
            dsband.astype(q_ref.dtype), relk_ref[:],
            preferred_element_type=jnp.float32,
        )
        drelk_ref[0] = jnp.dot(
            dsband.astype(q_ref.dtype).T, q_ref[0],
            preferred_element_type=jnp.float32,
        ).astype(drelk_ref.dtype)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)


def _row(t, d):
    return pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))


def _make_fused(window, causal, dropout, masked, interpret):
    """Build the custom-vjp fused attention for one static config.

    f(q, k, v, rel_k, rel_v, kmask, dmask) -> out
    q/k/v [BH, T, D] (q pre-scaled); rel tables [2w+1, D]; kmask [BH, T]
    (dummy [1, 1] when unmasked); dmask [BH, T, T] keep/(1-rate) values
    (dummy [1, 1, 1] when dropout is off).
    """

    win = 0 if window is None else 2 * window + 1

    def fwd_pair(q, k, v, rel_k, rel_v, kmask, dmask):
        bh, t, d = q.shape
        in_specs = [
            _row(t, d), _row(t, d), _row(t, d),
            pl.BlockSpec((win or 1, d), lambda i: (0, 0)),
            pl.BlockSpec((win or 1, d), lambda i: (0, 0)),
            pl.BlockSpec(
                (1, 1, t) if masked else (1, 1, 1),
                (lambda i: (i, 0, 0)) if masked else (lambda i: (0, 0, 0)),
            ),
            pl.BlockSpec(
                (1, t, t) if dropout else (1, 1, 1),
                (lambda i: (i, 0, 0)) if dropout else (lambda i: (0, 0, 0)),
            ),
        ]
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel, window=window, causal=causal,
                dropout=dropout, masked=masked,
            ),
            grid=(bh,),
            in_specs=in_specs,
            out_specs=[_row(t, d), pl.BlockSpec((1, t, t), lambda i: (i, 0, 0))],
            out_shape=[
                jax.ShapeDtypeStruct((bh, t, d), q.dtype),
                jax.ShapeDtypeStruct((bh, t, t), q.dtype),
            ],
            interpret=interpret,
        )(q, k, v, rel_k, rel_v, kmask, dmask)

    @jax.custom_vjp
    def fused(q, k, v, rel_k, rel_v, kmask, dmask):
        return fwd_pair(q, k, v, rel_k, rel_v, kmask, dmask)[0]

    def fwd_rule(q, k, v, rel_k, rel_v, kmask, dmask):
        out, p = fwd_pair(q, k, v, rel_k, rel_v, kmask, dmask)
        return out, (q, k, v, rel_k, rel_v, kmask, dmask, p)

    def bwd_rule(res, dout):
        q, k, v, rel_k, rel_v, kmask, dmask, p = res
        bh, t, d = q.shape
        dq, dk, dv, drelk, drelv = pl.pallas_call(
            functools.partial(_bwd_kernel, window=window, dropout=dropout),
            grid=(bh,),
            in_specs=[
                _row(t, d), _row(t, d), _row(t, d),
                pl.BlockSpec((win or 1, d), lambda i: (0, 0)),
                pl.BlockSpec((win or 1, d), lambda i: (0, 0)),
                pl.BlockSpec(
                    (1, t, t) if dropout else (1, 1, 1),
                    (lambda i: (i, 0, 0)) if dropout else (lambda i: (0, 0, 0)),
                ),
                pl.BlockSpec((1, t, t), lambda i: (i, 0, 0)),
                _row(t, d),
            ],
            out_specs=[
                _row(t, d), _row(t, d), _row(t, d),
                pl.BlockSpec((1, win or 1, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, win or 1, d), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, t, d), q.dtype),
                jax.ShapeDtypeStruct((bh, t, d), q.dtype),
                jax.ShapeDtypeStruct((bh, t, d), q.dtype),
                jax.ShapeDtypeStruct((bh, win or 1, d), jnp.float32),
                jax.ShapeDtypeStruct((bh, win or 1, d), jnp.float32),
            ],
            interpret=interpret,
        )(q, k, v, rel_k, rel_v, dmask, p, dout)
        if window is None:
            drelk_sum = jnp.zeros_like(rel_k)
            drelv_sum = jnp.zeros_like(rel_v)
        else:
            drelk_sum = drelk.sum(axis=0).astype(rel_k.dtype)
            drelv_sum = drelv.sum(axis=0).astype(rel_v.dtype)
        return dq, dk, dv, drelk_sum, drelv_sum, None, None

    fused.defvjp(fwd_rule, bwd_rule)
    return fused


@functools.lru_cache(maxsize=None)
def _fused_cached(window, causal, dropout, masked, interpret):
    return _make_fused(window, causal, dropout, masked, interpret)


def fused_attention(
    q: jax.Array,  # [BH, T, D], pre-scaled by 1/sqrt(d)
    k: jax.Array,
    v: jax.Array,
    rel_k: jax.Array | None = None,  # [2w+1, D] shared Shaw table
    rel_v: jax.Array | None = None,
    key_mask: jax.Array | None = None,  # [BH, T], 0 = masked key
    drop_mask: jax.Array | None = None,  # [BH, T, T] keep/(1-rate)
    *,
    window: int | None = None,
    causal: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused attention. Returns [BH, T, D]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bh, t, d = q.shape
    win = 0 if window is None else 2 * window + 1
    if rel_k is None:
        rel_k = jnp.zeros((win or 1, d), q.dtype)
        rel_v = jnp.zeros((win or 1, d), q.dtype)
    else:
        rel_k = rel_k.astype(q.dtype)
        rel_v = rel_v.astype(q.dtype)
    masked = key_mask is not None
    # [BH, 1, T]: TPU block shapes need the sublane dim to match the array
    kmask = (
        key_mask.astype(q.dtype)[:, None, :]
        if masked
        else jnp.ones((1, 1, 1), q.dtype)
    )
    dropout = drop_mask is not None
    dmask = (
        drop_mask.astype(q.dtype) if dropout else jnp.ones((1, 1, 1), q.dtype)
    )
    fused = _fused_cached(window, causal, dropout, masked, bool(interpret))
    return fused(q, k, v, rel_k, rel_v, kmask, dmask)
