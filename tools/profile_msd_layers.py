"""Per-layer MSD conv cost, grouped vs masked-dense (tunnel-immune)."""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 10


def timed(name, make_loop, state):
    jitted = jax.jit(make_loop, donate_argnums=(0,))
    state, warm = jitted(state)
    np.asarray(warm)
    t0 = time.perf_counter()
    state, out = jitted(state)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s}{dt*1e3:8.2f} ms", flush=True)
    return dt


def conv_probe(name, t_in, cin, cout, k, stride, groups, dense):
    rng = np.random.default_rng(0)
    b = 12  # y and y_hat stacked
    x = jnp.asarray(rng.standard_normal((b, t_in, cin)) * 0.1, jnp.bfloat16)
    kern = jnp.asarray(
        rng.standard_normal((k, cin // groups, cout)) * 0.05, jnp.float32
    )

    def apply(kern_p, xi):
        kk = kern_p.astype(jnp.bfloat16)
        g = groups
        if dense and groups > 1:
            cig, cog = cin // groups, cout // groups
            idx = jnp.arange(groups)
            kd = jnp.zeros((k, groups, cig, groups, cog), jnp.bfloat16)
            kd = kd.at[:, idx, :, idx, :].set(
                kk.reshape(k, cig, groups, cog).transpose(2, 0, 1, 3)
            )
            kk = kd.reshape(k, cin, cout)
            g = 1
        return jax.lax.conv_general_dilated(
            xi, kk, window_strides=(stride,), padding=((k // 2, k // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
        )

    def loss(p, i):
        xi = x + (i * 1e-9).astype(x.dtype)
        return jnp.mean(jnp.abs(apply(p, xi).astype(jnp.float32)))

    def make(p0):
        def body(p, i):
            g = jax.grad(loss)(p, jnp.float32(0.0))
            return p - 1e-9 * g, None
        p2, _ = jax.lax.scan(body, p0, jnp.arange(ITERS))
        return p2, p2.astype(jnp.float32).sum()

    timed(name, make, kern)


def main():
    specs = [
        # (t_in, cin, cout, k, stride, groups)
        (10240, 1, 16, 15, 1, 1),
        (10240, 16, 64, 41, 4, 4),
        (2560, 64, 256, 41, 4, 16),
        (640, 256, 1024, 41, 4, 64),
        (160, 1024, 1024, 41, 4, 256),
        (40, 1024, 1024, 5, 1, 1),
    ]
    for i, (t, ci, co, k, s, g) in enumerate(specs):
        conv_probe(f"conv{i} t{t} {ci}->{co} k{k} s{s} g{g} grouped",
                   t, ci, co, k, s, g, dense=False)
        if g > 1:
            conv_probe(f"conv{i} t{t} {ci}->{co} k{k} s{s} g{g} DENSE",
                       t, ci, co, k, s, g, dense=True)


if __name__ == "__main__":
    main()


def conv_probe_einsum(name, t_in, cin, cout, k, stride, groups):
    """Grouped conv as im2col + group-batched einsum (MXU batched matmul)."""
    rng = np.random.default_rng(0)
    b = 12
    cg, cog = cin // groups, cout // groups
    pad = k // 2
    t_out = (t_in + 2 * pad - k) // stride + 1
    x = jnp.asarray(rng.standard_normal((b, t_in, cin)) * 0.1, jnp.bfloat16)
    kern = jnp.asarray(rng.standard_normal((k, cg, cout)) * 0.05, jnp.float32)

    def apply(kern_p, xi):
        kk = kern_p.astype(jnp.bfloat16).reshape(k, cg, groups, cog)
        xp = jnp.pad(xi, ((0, 0), (pad, pad), (0, 0)))
        cols = jnp.stack(
            [xp[:, tap : tap + t_out * stride : stride] for tap in range(k)],
            axis=2,
        )  # [B, T_out, k, C_in]
        cols = cols.reshape(b, t_out, k, groups, cg)
        return jnp.einsum("btkgj,kjgo->btgo", cols, kk,
                          preferred_element_type=jnp.float32)

    def loss(p, i):
        xi = x + (i * 1e-9).astype(x.dtype)
        return jnp.mean(jnp.abs(apply(p, xi).astype(jnp.float32)))

    def make(p0):
        def body(p, i):
            g = jax.grad(loss)(p, jnp.float32(0.0))
            return p - 1e-9 * g, None
        p2, _ = jax.lax.scan(body, p0, jnp.arange(ITERS))
        return p2, p2.astype(jnp.float32).sum()

    timed(name, make, kern)


def main2():
    for i, (t, ci, co, k, s, g) in enumerate([
        (2560, 64, 256, 41, 4, 16),
        (640, 256, 1024, 41, 4, 64),
        (160, 1024, 1024, 41, 4, 256),
    ]):
        conv_probe_einsum(f"conv t{t} {ci}->{co} g{g} EINSUM", t, ci, co, k, s, g)


if __name__ == "__main__" and "einsum" in str(__import__("sys").argv):
    main2()
