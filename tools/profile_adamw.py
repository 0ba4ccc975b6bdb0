"""Optimizer-only step cost on the full-size G+D trees: per-leaf optax.adamw
vs packed_adamw at several pack_max values (r4 VERDICT next #2: per-leaf
adamw ~3 ms of the 36.4 ms train step).

Run on the real chip: python tools/profile_adamw.py
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 30


def timed(name, tx, params):
    state = jax.jit(tx.init)(params)

    def loop(params, state):
        def body(carry, i):
            p, s = carry
            grads = jax.tree.map(lambda x: x * 1e-6 + 1e-8, p)  # cheap fake grads
            upd, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, upd)
            return (p, s), jnp.float32(0)

        (p, s), _ = jax.lax.scan(body, (params, state), jnp.arange(ITERS))
        return jax.tree.leaves(p)[0].astype(jnp.float32).sum()

    jitted = jax.jit(loop)
    np.asarray(jitted(params, state))
    t0 = time.perf_counter()
    np.asarray(jitted(params, state))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:36s}{dt*1e3:8.3f} ms/step", flush=True)
    return dt


def main():
    from sovits_tpu import config as scfg
    from sovits_tpu.models import factory
    from sovits_tpu.train.optim import packed_adamw

    hps = scfg.default_config()
    syn = factory.build_synthesizer(hps)
    disc = factory.build_discriminator(hps)
    g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
    d_params = factory.init_discriminator_params(
        disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
    )
    params = {"g": g_params, "d": d_params}
    leaves = jax.tree.leaves(params)
    total = sum(x.size for x in leaves)
    print(f"{len(leaves)} leaves, {total/1e6:.1f} M params "
          f"({total*4/1e6:.0f} MB fp32)", flush=True)
    for cut in (1 << 14, 1 << 16, 1 << 18, 1 << 20):
        n_small = sum(1 for x in leaves if x.size <= cut)
        sz = sum(x.size for x in leaves if x.size <= cut)
        print(f"  pack_max={cut:>8}: {n_small} leaves packed, "
              f"{sz/1e6:.2f} M elems", flush=True)

    kw = dict(learning_rate=1e-4, b1=0.8, b2=0.99, eps=1e-9, weight_decay=0.01)
    timed("optax.adamw (per-leaf)", optax.adamw(**kw), params)
    for cut in (1 << 14, 1 << 16, 1 << 18, 1 << 20):
        timed(f"packed_adamw pack_max={cut}", packed_adamw(**kw, pack_max=cut), params)


if __name__ == "__main__":
    main()
