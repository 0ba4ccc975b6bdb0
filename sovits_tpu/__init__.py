"""sovits_tpu — a TPU-native singing-voice-conversion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
so-vits-svc 4.1 (SoftVC VITS singing voice conversion), designed TPU-first:

- channels-last [B, T, C] tensor layout everywhere (lane dim = channels),
- pure-functional flax.linen models with explicit PRNG keys,
- static shapes + bucketed sequence lengths so everything jits once,
- bf16 compute / fp32 params by default,
- data-parallel (and model-parallel-ready) training over a
  ``jax.sharding.Mesh`` with XLA-inserted collectives,
- sequential DSP re-derived as parallel frame-wise kernels (e.g. the NSF
  sine source uses frame-exact phase accumulation instead of a length-T
  cumsum).

Layer map (mirrors SURVEY.md section 1 of the reference):
  dsp/      L0 tensor/DSP primitives (STFT, mel, f0 conversions, volume)
  nn/       L1 neural building blocks (convs, WN, attention, flows)
  models/   L3 models (synthesizer, NSF-HiFiGAN, discriminators, diffusion)
  train/    L4/L5 data pipeline + trainers
  infer/    L6 inference orchestration (Svc facade, slicer)
  f0/       L2b f0 predictors
  encoders/ L2a speech encoders
  parallel/ device mesh + sharding rules
  ops/      Pallas TPU kernels
"""

__version__ = "0.1.0"
