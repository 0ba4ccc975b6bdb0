"""MPD vs MSD fwd+bwd cost (tunnel-immune methodology)."""

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
    print(f"{name:40s}{dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    from sovits_tpu.models.discriminator import (
        DiscriminatorP, DiscriminatorS, MultiPeriodDiscriminator,
    )

    rng = np.random.default_rng(0)
    b, seg = 6, 10240
    y = jnp.asarray(rng.standard_normal((b, seg, 1)) * 0.1, jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((b, seg, 1)) * 0.1, jnp.float32)

    def bench_module(name, mod):
        params = mod.init(jax.random.PRNGKey(0), y)["params"]
        params = jax.device_put(params, jax.devices()[0])

        def loss(p, i):
            logits, fmap = mod.apply({"params": p}, y + i * 1e-9)
            logits2, fmap2 = mod.apply({"params": p}, y_hat + i * 1e-9)
            l = jnp.mean((1 - logits.astype(jnp.float32)) ** 2) + jnp.mean(
                logits2.astype(jnp.float32) ** 2
            )
            for fr, fg in zip(fmap, fmap2):
                l += jnp.mean(jnp.abs(fr.astype(jnp.float32) - fg.astype(jnp.float32)))
            return l

        def make(p0):
            def body(p, i):
                g = jax.grad(loss)(p, jnp.float32(0.0))
                return jax.tree.map(
                    lambda a, bb: a - 1e-9 * bb.astype(a.dtype), p, g
                ), None
            p2, _ = jax.lax.scan(body, p0, jnp.arange(ITERS))
            return p2, jax.tree.leaves(p2)[0].astype(jnp.float32).sum()

        timed(name, make, params)

    bench_module("MSD (DiscriminatorS) y+y_hat f+b", DiscriminatorS(dtype=jnp.bfloat16))
    for p in (2, 11):
        bench_module(
            f"MPD period {p} y+y_hat f+b", DiscriminatorP(period=p, dtype=jnp.bfloat16)
        )


if __name__ == "__main__":
    main()
