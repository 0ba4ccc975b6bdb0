"""Parity tests for ops/folded.py: folded matmul convs vs XLA convs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sovits_tpu.ops.folded import (
    fold_placement,
    fold_placement_transposed,
    folded_conv1d,
    folded_conv_transpose1d,
    pick_fold,
)


def _xla_conv(x, w, b, dilation):
    pad = (w.shape[0] - 1) * dilation // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1,), ((pad, pad),), rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + b


@pytest.mark.parametrize("k,d,p", [(3, 1, 8), (7, 3, 8), (11, 5, 8),
                                   (11, 5, 4), (7, 1, 2), (5, 2, 4), (1, 1, 4)])
def test_folded_conv1d_matches_xla(k, d, p):
    rng = np.random.default_rng(0)
    b_, t, ci, co = 2, 64, 16, 16
    x = jnp.asarray(rng.standard_normal((b_, t, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, ci, co)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)
    ref = _xla_conv(x, w, bias, d)
    got = folded_conv1d(x, w, bias, d, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_folded_conv1d_rect_channels():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 48, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 16, 4)) * 0.1, jnp.float32)
    bias = jnp.zeros(4)
    np.testing.assert_allclose(
        np.asarray(folded_conv1d(x, w, bias, 1, 8)),
        np.asarray(_xla_conv(x, w, bias, 1)), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k,u,p_out", [(16, 8, 8), (4, 2, 2), (4, 2, 4), (8, 4, 8)])
def test_folded_conv_transpose_matches_torch_semantics(k, u, p_out):
    import torch

    rng = np.random.default_rng(2)
    b_, t, ci, co = 2, 24, 8, 8
    pad = (k - u + 1) // 2
    x = rng.standard_normal((b_, t, ci)).astype(np.float32)
    w = (rng.standard_normal((k, ci, co)) * 0.1).astype(np.float32)
    bias = (rng.standard_normal(co) * 0.1).astype(np.float32)

    tconv = torch.nn.ConvTranspose1d(ci, co, k, stride=u, padding=pad)
    with torch.no_grad():
        # torch weight layout [in, out, k]; ours is [k, in, out]
        tconv.weight.copy_(torch.from_numpy(np.transpose(w, (1, 2, 0))))
        tconv.bias.copy_(torch.from_numpy(bias))
        ref = tconv(torch.from_numpy(np.transpose(x, (0, 2, 1)))).numpy()
    ref = np.transpose(ref, (0, 2, 1))

    got = np.asarray(folded_conv_transpose1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), u, pad, p_out))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fold_placement_mass_conservation():
    # every (tap, phase) pair lands exactly once
    for k, d, p in [(11, 5, 8), (3, 1, 2), (7, 3, 4)]:
        shifts, s = fold_placement(k, d, p)
        assert s.sum() == k * p
        assert s.shape[0] == k and s.shape[2] == p and s.shape[3] == p
    for k, u, pad, p_out in [(16, 8, 4, 8), (4, 2, 1, 4)]:
        shifts, s = fold_placement_transposed(k, u, pad, p_out)
        # each output phase receives ceil-ish k/u taps; total = p_out * (k/u)
        assert s.sum() == p_out * (k // u)


def test_pick_fold():
    assert pick_fold(16, 64) == 8
    assert pick_fold(64, 128) == 2
    assert pick_fold(128, 128) == 1
    assert pick_fold(16, 4) == 4  # T divisibility constrains P
    assert pick_fold(16, 3) == 1


def test_folded_conv1d_grads_flow():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 32, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 16, 16)) * 0.1, jnp.float32)
    bias = jnp.zeros(16)

    def loss_fold(w):
        return jnp.sum(folded_conv1d(x, w, bias, 1, 8) ** 2)

    def loss_ref(w):
        return jnp.sum(_xla_conv(x, w, bias, 1) ** 2)

    g1 = jax.grad(loss_fold)(w)
    g2 = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_generator_fused_tail_matches_folded_xla():
    """fused_tail (Pallas trio kernel) == the folded XLA path, same params."""
    from sovits_tpu.models.nsf_hifigan import Generator

    kw = dict(
        sampling_rate=8000,
        inter_channels=24,
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=256,  # stage channels 128, 64 -> D=128
        gin_channels=16,
    )
    rng = np.random.default_rng(7)
    t_f = 12
    x = jnp.asarray(rng.standard_normal((1, t_f, 24)), jnp.float32)
    f0 = jnp.asarray(rng.uniform(100, 300, (1, t_f)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 1, 16)) * 0.1, jnp.float32)

    ref_mod = Generator(**kw)
    variables = ref_mod.init(jax.random.PRNGKey(0), x, f0, g)
    ref = ref_mod.apply(variables, x, f0, g, rng=None)

    fused_mod = Generator(**kw, fused_tail=True)
    got = fused_mod.apply(variables, x, f0, g, rng=None)
    assert got.shape == ref.shape == (1, t_f * 16, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    # ---- train path: the fused tail is differentiable (custom VJP) and
    # its gradients match the pure folded-XLA generator's (r3 VERDICT #2)
    def loss(mod):
        def f(params):
            wav = mod.apply({"params": params}, x, f0, g, rng=None)
            return jnp.sum(wav**2) * 1e3
        return f

    g_fused = jax.grad(loss(fused_mod))(variables["params"])
    g_ref = jax.grad(loss(ref_mod))(variables["params"])
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_f) == len(flat_r)
    for (path, a), b in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_trio_folded_vjp_matches_xla_chain():
    """trio_folded (Pallas fwd + custom VJP) == trio_folded_xla in value
    AND gradient, for x, kernels and biases."""
    from sovits_tpu.ops.fused_stage import trio_folded, trio_folded_xla

    rng = np.random.default_rng(5)
    p, c = 4, 32  # D = 128
    ks = (3, 7)
    dils = ((1, 3), (1, 3))
    n_conv = sum(2 * len(d) for d in dils)
    xf = jnp.asarray(rng.standard_normal((2, 24, p * c)), jnp.float32) * 0.3
    kernels = tuple(
        jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
        for k, d in zip(ks, dils) for _ in range(2 * len(d))
    )
    assert len(kernels) == n_conv
    biases = tuple(
        jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
        for _ in range(n_conv)
    )

    out_p = trio_folded(xf, kernels, biases, p, ks, dils)
    out_x = trio_folded_xla(xf, kernels, biases, p, ks, dils)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-4, atol=2e-5
    )

    def loss(fn):
        def f(args):
            xf, kernels, biases = args
            return jnp.sum(fn(xf, kernels, biases, p, ks, dils) ** 2)
        return f

    g_p = jax.grad(loss(trio_folded))((xf, kernels, biases))
    g_x = jax.grad(loss(trio_folded_xla))((xf, kernels, biases))
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
