"""Capture a jax.profiler trace of the full fused GAN train step.

Builds the step exactly as bench.py:bench_train_step (batch 6 x 512, bf16,
rbg keys, folded-XLA tail), warms one scan loop, then traces a loop of
N_STEPS steps. Summarize with:
    python tools/profile_step_trace.py
    python tools/analyze_trace.py /tmp/xp_step <N_STEPS>
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

N_STEPS = 8
TRACE_DIR = "/tmp/xp_step"


def main():
    from sovits_tpu import config as scfg
    from sovits_tpu import train as strain
    from sovits_tpu.models import factory
    from sovits_tpu.parallel import make_mesh, replicate_tree, shard_batch

    hps = scfg.default_config()
    hps.data["pad_to_frames"] = 512
    hps.train["batch_size"] = 6
    mesh = make_mesh(n_data=1, n_model=1)

    syn = factory.build_synthesizer(hps, dtype=jnp.bfloat16)
    disc = factory.build_discriminator(hps, dtype=jnp.bfloat16)
    g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
    d_params = factory.init_discriminator_params(
        disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
    )
    g_tx = strain.make_optimizer(hps)
    d_tx = strain.make_optimizer(hps)
    state = replicate_tree(
        strain.create_train_state(g_params, d_params, g_tx, d_tx), mesh
    )
    raw_step = strain.make_train_step(syn, disc, g_tx, d_tx, hps, jit_compile=False)

    rng = np.random.default_rng(0)
    b, t, hop = 6, 512, hps.data.hop_length
    batch = shard_batch(
        {
            "c": jnp.asarray(rng.standard_normal((b, t, hps.model.ssl_dim)), jnp.float32),
            "f0": jnp.asarray(rng.uniform(80, 400, (b, t)), jnp.float32),
            "uv": jnp.ones((b, t), jnp.float32),
            "spec": jnp.asarray(
                np.abs(rng.standard_normal((b, t, hps.data.filter_length // 2 + 1))),
                jnp.float32,
            ),
            "wav": jnp.asarray(rng.standard_normal((b, t * hop, 1)) * 0.1, jnp.float32),
            "spk": jnp.zeros((b,), jnp.int32),
            "lengths": jnp.full((b,), t, jnp.int32),
            "volume": jnp.abs(jnp.asarray(rng.standard_normal((b, t)), jnp.float32)) * 0.05,
        },
        mesh,
    )

    def loop(state, batch):
        def body(st, i):
            st, metrics = raw_step(
                st, batch,
                jax.random.fold_in(jax.random.key(0, impl="rbg"), i),
            )
            return st, metrics["loss/g/total"]

        st, losses = jax.lax.scan(body, state, jnp.arange(N_STEPS))
        return st, losses.sum()

    loop_jit = jax.jit(loop, donate_argnums=(0,))
    state, warm = loop_jit(state, batch)
    np.asarray(warm)
    t0 = time.perf_counter()
    state, out = loop_jit(state, batch)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / N_STEPS
    print(f"warm loop: {dt*1e3:.2f} ms/step ({1/dt:.1f} steps/s)", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        state, out = loop_jit(state, batch)
        np.asarray(out)
    print(f"trace written to {TRACE_DIR}", flush=True)


if __name__ == "__main__":
    main()
