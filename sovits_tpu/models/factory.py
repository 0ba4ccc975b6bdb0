"""Model construction + parameter initialization from a config.

Includes the reference's proximal initialization (attentions.py:193-196:
causal-FFT attention starts with conv_k == conv_q) applied post-init to the
f0 decoder and transformer-flow attention stacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import HParams, synthesizer_kwargs
from .discriminator import MultiPeriodDiscriminator
from .synthesizer import Synthesizer


def _copy_q_to_k(tree: dict) -> None:
    """In-place: for each attn_* subdict, set key params := query params."""
    for name, sub in tree.items():
        if name.startswith("attn_") and isinstance(sub, dict) and "query" in sub:
            sub["key"] = {k: jnp.array(v) for k, v in sub["query"].items()}


def apply_proximal_init(params: dict) -> dict:
    """Copy q->k in every causal-FFT attention (f0 decoder, transformer flow)."""
    if "f0_decoder" in params:
        _copy_q_to_k(params["f0_decoder"].get("decoder", {}))
    flow = params.get("flow", {})
    for name, sub in flow.items():
        if name.startswith("coupling_") and "enc" in sub and any(
            k.startswith("attn_") for k in sub["enc"]
        ):
            _copy_q_to_k(sub["enc"])
    if "shared_enc" in flow:
        _copy_q_to_k(flow["shared_enc"])
    return params


def build_synthesizer(hps: HParams, dtype=jnp.float32, fused_tail: bool = False) -> Synthesizer:
    """fused_tail runs the vocoder resblock tail as Pallas kernels —
    inference only (no VJP); training keeps the folded XLA formulation."""
    return Synthesizer(dtype=dtype, fused_tail=fused_tail, **synthesizer_kwargs(hps))


def build_decoder(hps: HParams, dtype=jnp.float32):
    """Standalone vocoder decoder matching Synthesizer.setup's ``dec``
    (same module type + kwargs, so a synthesizer's ``params["dec"]``
    subtree applies to it directly). Used by the sequence-parallel decode
    path, which runs the generator under shard_map outside the full model."""
    kw = synthesizer_kwargs(hps)
    from .nsf_hifigan import Generator

    dec_cls = Generator
    extra = {"separable": bool(kw["use_depthwise_conv"])}
    if kw["vocoder_name"] == "nsf-snake-hifigan":
        from .snake_hifigan import SnakeGenerator

        dec_cls = SnakeGenerator
        extra = {}
    return dec_cls(
        sampling_rate=kw["sampling_rate"],
        inter_channels=kw["inter_channels"],
        resblock=kw["resblock"],
        resblock_kernel_sizes=kw["resblock_kernel_sizes"],
        resblock_dilation_sizes=kw["resblock_dilation_sizes"],
        upsample_rates=kw["upsample_rates"],
        upsample_initial_channel=kw["upsample_initial_channel"],
        upsample_kernel_sizes=kw["upsample_kernel_sizes"],
        gin_channels=kw["gin_channels"],
        dtype=dtype,
        **extra,
    )


def build_discriminator(hps: HParams, dtype=jnp.float32) -> MultiPeriodDiscriminator:
    kw = {}
    # CI/smoke knob, NOT a reference option: the reference discriminator
    # towers are fixed-size regardless of config (models.py:165-252), which
    # makes tiny-config CPU tests discriminator-bound (~6 s/step on one
    # core). disc_tiny shrinks the towers for the learning-dynamics tests;
    # real training must leave it unset.
    if hps.model.get("disc_tiny"):
        kw["periods"] = (2, 3)
        kw["p_channels"] = (8, 16, 32, 64)
        kw["s_specs"] = (
            (8, 15, 1, 1, 7),
            (16, 41, 4, 4, 20),
            (32, 41, 4, 4, 20),
            (64, 5, 1, 1, 2),
        )
    return MultiPeriodDiscriminator(
        use_spectral_norm=bool(hps.model.use_spectral_norm), dtype=dtype, **kw
    )


def init_synthesizer_params(
    module: Synthesizer, rng: jax.Array, hps: HParams, t_frames: int = 32,
    batch: int = 1, use_jit: bool = True,
) -> dict:
    d = hps.data
    m = hps.model
    # the training forward random-slices segment_size//hop latent frames, so
    # the init trace needs at least that many
    t_frames = max(t_frames, hps.train.segment_size // d.hop_length)

    def init_fn(rng):
        dummy = dict(
            c=jnp.zeros((batch, t_frames, m.ssl_dim)),
            f0=jnp.full((batch, t_frames), 220.0),
            uv=jnp.ones((batch, t_frames)),
            spec=jnp.zeros((batch, t_frames, d.filter_length // 2 + 1)),
            spk=jnp.zeros((batch,), jnp.int32),
            lengths=jnp.full((batch,), t_frames, jnp.int32),
            vol=jnp.zeros((batch, t_frames)) if m.vol_embedding else None,
        )
        rng_p, rng_n, rng_s, rng_d = jax.random.split(rng, 4)
        variables = module.init(
            {"params": rng_p, "noise": rng_n, "slice": rng_s, "dropout": rng_d},
            dummy["c"],
            dummy["f0"],
            dummy["uv"],
            dummy["spec"],
            dummy["spk"],
            dummy["lengths"],
            vol=dummy["vol"],
            deterministic=False,
        )
        return apply_proximal_init(jax.tree.map(lambda x: x, variables["params"]))

    # jit by default: eager init dispatches thousands of tiny ops, which over
    # the axon dev tunnel costs ~28 ms EACH (the r4 driver bench spent 513 s
    # there) — one compiled program leaves the params device-resident with no
    # host round trips, and the persistent compile cache amortizes the build
    return jax.jit(init_fn)(rng) if use_jit else init_fn(rng)


def init_discriminator_params(
    module: MultiPeriodDiscriminator, rng: jax.Array, seg_samples: int = 10240,
    batch: int = 1, use_jit: bool = True,
) -> dict:
    def init_fn(rng):
        y = jnp.zeros((batch, seg_samples, 1))
        return module.init({"params": rng}, y, y)["params"]

    # jit for the same tunnel-dispatch reason as init_synthesizer_params
    return jax.jit(init_fn)(rng) if use_jit else init_fn(rng)
