"""Probe: MSD tower as folded MXU matmuls vs XLA grouped convs (f+b)."""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from sovits_tpu.ops.folded import folded_conv1d_f  # noqa: E402

ITERS = 10
SPECS = [
    # (features, kernel, stride, groups, padding)
    (16, 15, 1, 1, 7),
    (64, 41, 4, 4, 20),
    (256, 41, 4, 16, 20),
    (1024, 41, 4, 64, 20),
    (1024, 41, 4, 256, 20),
    (1024, 5, 1, 1, 2),
]


def timed(name, make_loop, state):
    jitted = jax.jit(make_loop, donate_argnums=(0,))
    state, warm = jitted(state)
    np.asarray(warm)
    t0 = time.perf_counter()
    state, out = jitted(state)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:36s}{dt*1e3:8.2f} ms", flush=True)
    return dt


def dense_from_grouped(kern, cin, groups):
    k = kern.shape[0]
    cout = kern.shape[2]
    cg, cog = cin // groups, cout // groups
    idx = jnp.arange(groups)
    kd = jnp.zeros((k, groups, cg, groups, cog), kern.dtype)
    kd = kd.at[:, idx, :, idx, :].set(
        kern.reshape(k, cg, groups, cog).transpose(2, 0, 1, 3)
    )
    return kd.reshape(k, cin, cout)


def tower_folded(x, kerns):
    """x [B, T, 1] -> folded fmaps; rows R = T/64."""
    b, t, _ = x.shape
    fmaps = []
    xf = x.reshape(b, t // 64, 64)  # [B, R, 64*1]
    p = 64
    cin = 1
    for i, (ch, k, s, g, pad) in enumerate(SPECS):
        kern = kerns[i].astype(jnp.bfloat16)
        if g > 1:
            kern = dense_from_grouped(kern, cin, g)
        p_out = p // s
        if p_out == 0:
            # refold rows so the stride divides the phase count
            r = xf.shape[1]
            xf = xf.reshape(b, r // s, s * p * cin)
            p, p_out = s * p, p
        xf = folded_conv1d_f(xf, kern, None, 1, p_out, stride=s, pad=pad)
        xf = jnp.where(xf >= 0, xf, (0.1 * xf.astype(jnp.float32)).astype(xf.dtype))
        fmaps.append(xf)
        p = p_out
        cin = ch
    return fmaps


def tower_xla(x, kerns):
    fmaps = []
    cin = 1
    for i, (ch, k, s, g, pad) in enumerate(SPECS):
        x = jax.lax.conv_general_dilated(
            x, kerns[i].astype(jnp.bfloat16), window_strides=(s,),
            padding=((pad, pad),), dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g,
        )
        x = jnp.where(x >= 0, x, 0.1 * x)
        fmaps.append(x)
        cin = ch
    return fmaps


def loss_of(fmaps):
    return sum(jnp.mean(jnp.abs(f.astype(jnp.float32))) for f in fmaps)


def main():
    rng = np.random.default_rng(0)
    b, t = 12, 10240
    kerns = []
    cin = 1
    for ch, k, s, g, pad in SPECS:
        kerns.append(jnp.asarray(
            rng.standard_normal((k, cin // g, ch)) * 0.05, jnp.float32))
        cin = ch
    x = jnp.asarray(rng.standard_normal((b, t, 1)) * 0.1, jnp.bfloat16)
    copy = jax.jit(lambda t_: [a + 0 for a in t_])

    def make(tower):
        def body(p, i):
            def l(pp):
                return loss_of(tower(x + (i * 1e-9).astype(x.dtype), pp))
            gr = jax.grad(l)(p)
            return jax.tree.map(lambda a, bb: a - 1e-9 * bb, p, gr), None
        def loop(p):
            p2, _ = jax.lax.scan(body, p, jnp.arange(ITERS))
            return p2, jax.tree.leaves(p2)[0].sum()
        return loop

    timed("MSD tower XLA grouped", make(tower_xla), copy(list(kerns)))
    timed("MSD tower FOLDED", make(tower_folded), copy(list(kerns)))

    # numerics: folded fmaps are phase-folded views of the batched outputs
    fb = tower_xla(x, kerns)
    ff = tower_folded(x, kerns)
    for i, (ch, k, s, g, pad) in enumerate(SPECS):
        want = np.asarray(fb[i], np.float32)
        got = np.asarray(ff[i], np.float32).reshape(want.shape[0], -1, ch)
        err = np.max(np.abs(got - want))
        print(f"layer {i}: max |folded - xla| = {err:.3e}")


if __name__ == "__main__":
    main()


def tower_xla_barrier(x, kerns):
    """XLA grouped convs with optimization barriers around the wide
    grouped layers (decouple layout/fusion choices from neighbours)."""
    fmaps = []
    for i, (ch, k, s, g, pad) in enumerate(SPECS):
        if g >= 64:
            x = jax.lax.optimization_barrier(x)
        x = jax.lax.conv_general_dilated(
            x, kerns[i].astype(jnp.bfloat16), window_strides=(s,),
            padding=((pad, pad),), dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g,
        )
        if g >= 64:
            x = jax.lax.optimization_barrier(x)
        x = jnp.where(x >= 0, x, 0.1 * x)
        fmaps.append(x)
    return fmaps


def main_barrier():
    rng = np.random.default_rng(0)
    b, t = 12, 10240
    kerns = []
    cin = 1
    for ch, k, s, g, pad in SPECS:
        kerns.append(jnp.asarray(
            rng.standard_normal((k, cin // g, ch)) * 0.05, jnp.float32))
        cin = ch
    x = jnp.asarray(rng.standard_normal((b, t, 1)) * 0.1, jnp.bfloat16)
    copy = jax.jit(lambda t_: [a + 0 for a in t_])

    def make(tower):
        def body(p, i):
            def l(pp):
                return loss_of(tower(x + (i * 1e-9).astype(x.dtype), pp))
            gr = jax.grad(l)(p)
            return jax.tree.map(lambda a, bb: a - 1e-9 * bb, p, gr), None
        def loop(p):
            p2, _ = jax.lax.scan(body, p, jnp.arange(ITERS))
            return p2, jax.tree.leaves(p2)[0].sum()
        return loop

    timed("MSD tower XLA + barriers", make(tower_xla_barrier), copy(list(kerns)))


if __name__ == "__main__" and "barrier" in str(sys.argv):
    main_barrier()
