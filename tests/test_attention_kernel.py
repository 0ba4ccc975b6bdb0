"""Fused Pallas attention kernel vs the jnp formulation (interpret mode).

Covers the two product configs: the ContentEncoder's window-4 shared-head
relative attention (with key masking + dropout) and the F0Decoder's causal
attention — forward values and gradients wrt every input.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sovits_tpu.nn.attention import (
    Encoder,
    FFT,
    MultiHeadAttention,
    _absolute_to_band,
    _band_to_absolute,
)
from sovits_tpu.ops.attention import fused_attention


def _jnp_reference(q, k, v, rel_k, rel_v, kmask, dmask, window, causal):
    """Straight jnp replay of the kernel semantics on [BH, T, D]."""
    scores = jnp.einsum("btd,bsd->bts", q, k).astype(jnp.float32)
    t = q.shape[1]
    if window is not None:
        rl = jnp.einsum("btd,md->btm", q, rel_k).astype(jnp.float32)
        scores = scores + _band_to_absolute(rl[:, None], window)[:, 0]
    if causal:
        tri = jnp.tril(jnp.ones((t, t), bool))
        scores = jnp.where(tri[None], scores, -1e4)
    if kmask is not None:
        scores = jnp.where(kmask[:, None, :] > 0, scores, -1e4)
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    if dmask is not None:
        p = p * dmask
    out = jnp.einsum("bts,bsd->btd", p, v)
    if window is not None:
        band = _absolute_to_band(p[:, None], window)[:, 0]
        out = out + jnp.einsum("btm,md->btd", band, rel_v)
    return out


@pytest.mark.parametrize(
    "window,causal,masked,dropout",
    [(4, False, True, False), (4, False, True, True),
     (None, True, False, False), (4, False, False, False)],
)
def test_fused_attention_matches_jnp(window, causal, masked, dropout):
    rng = np.random.default_rng(0)
    bh, t, d = 4, 48, 24
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32) * 0.5
    win = 2 * window + 1 if window else 1
    rel_k = jnp.asarray(rng.standard_normal((win, d)), jnp.float32) * 0.2
    rel_v = jnp.asarray(rng.standard_normal((win, d)), jnp.float32) * 0.2
    kmask = None
    if masked:
        km = np.ones((bh, t), np.float32)
        km[:, -7:] = 0.0
        kmask = jnp.asarray(km)
    dmask = None
    if dropout:
        keep = rng.random((bh, t, t)) > 0.1
        dmask = jnp.asarray(keep, jnp.float32) / 0.9

    relk_arg = rel_k if window else None
    relv_arg = rel_v if window else None

    def run_fused(q, k, v, rk, rv):
        return fused_attention(
            q, k, v, rk if window else None, rv if window else None,
            key_mask=kmask, drop_mask=dmask, window=window, causal=causal,
            interpret=True,
        )

    def run_ref(q, k, v, rk, rv):
        return _jnp_reference(
            q, k, v, rk, rv, kmask, dmask, window, causal
        )

    out_f = run_fused(q, k, v, rel_k, rel_v)
    out_r = run_ref(q, k, v, rel_k, rel_v)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), rtol=2e-5, atol=2e-5
    )

    # gradients wrt every differentiable input
    cot = jnp.asarray(rng.standard_normal(out_r.shape), jnp.float32)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * cot)

    gf = jax.grad(loss(run_fused), argnums=(0, 1, 2, 3, 4))(q, k, v, rel_k, rel_v)
    gr = jax.grad(loss(run_ref), argnums=(0, 1, 2, 3, 4))(q, k, v, rel_k, rel_v)
    names = ["dq", "dk", "dv", "drel_k", "drel_v"]
    for name, a, b in zip(names, gf, gr):
        if window is None and name in ("drel_k", "drel_v"):
            continue  # fused returns zeros; the reference never uses them
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5, err_msg=name
        )


@pytest.mark.parametrize("module", ["encoder", "fft"])
def test_modules_fused_vs_jnp(module):
    """Encoder / FFT with use_fused forced on (interpret) == jnp path."""
    rng = np.random.default_rng(1)
    b, t, c = 2, 40, 32
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32) * 0.3
    lengths = np.array([t, t - 9])
    mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)
    x_mask = jnp.asarray(mask)[:, :, None]

    if module == "encoder":
        mk = lambda fused: Encoder(  # noqa: E731
            hidden_channels=c, filter_channels=64, n_heads=2, n_layers=2,
            kernel_size=3, window_size=4, use_fused=fused,
        )
    else:
        mk = lambda fused: FFT(  # noqa: E731
            hidden_channels=c, filter_channels=64, n_heads=2, n_layers=2,
            kernel_size=3, use_fused=fused,
        )

    params = mk(False).init(jax.random.PRNGKey(0), x, x_mask)["params"]
    ref = mk(False).apply({"params": params}, x, x_mask)
    got = mk(True).apply({"params": params}, x, x_mask)
    # compare on valid frames only (key-side masking differs from the
    # outer-product mask exactly at the discarded masked-query rows)
    m = np.asarray(x_mask)
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(ref) * m, rtol=2e-4, atol=2e-4
    )

    def loss(fused):
        def f(p):
            y = mk(fused).apply({"params": p}, x, x_mask)
        # masked frames are zeroed by the module itself
            return jnp.sum(y * y)
        return f

    gr = jax.grad(loss(False))(params)
    gf = jax.grad(loss(True))(params)
    flat_r = jax.tree.leaves(gr)
    flat_f = jax.tree.leaves(gf)
    for a, b2 in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), rtol=5e-4, atol=5e-4
        )


def test_mha_causal_without_attn_mask():
    """`causal=True` alone must mask future keys in BOTH paths (round-4
    regression: the jnp path silently ignored it when attn_mask was None;
    caught by bench.py's on-chip Pallas parity gate)."""
    rng = np.random.default_rng(3)
    b, t, c = 2, 40, 32
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32) * 0.3
    mha = MultiHeadAttention(channels=c, out_channels=c, n_heads=2, use_fused=False)
    variables = mha.init(jax.random.PRNGKey(0), x, x, causal=True)

    causal_only = mha.apply(variables, x, x, causal=True)
    tri = jnp.tril(jnp.ones((t, t), jnp.float32))[None, None]
    with_mask = mha.apply(variables, x, x, tri, causal=True)
    np.testing.assert_allclose(
        np.asarray(causal_only), np.asarray(with_mask), rtol=1e-6, atol=1e-6
    )

    # and it actually masks: the first frame must ignore all later frames
    x2 = x.at[:, 1:].add(1.0)
    out_a = mha.apply(variables, x, x, causal=True)
    out_b = mha.apply(variables, x2, x2, causal=True)
    np.testing.assert_allclose(
        np.asarray(out_a)[:, 0], np.asarray(out_b)[:, 0], rtol=1e-5, atol=1e-6
    )

    # fused (interpret) path agrees
    fused = MultiHeadAttention(channels=c, out_channels=c, n_heads=2, use_fused=True)
    got = fused.apply(variables, x, x, causal=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(causal_only), rtol=2e-5, atol=2e-5
    )
