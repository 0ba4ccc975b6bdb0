"""F0 feature conversions (jittable).

Mirrors the f0 math scattered through the reference:
- ``f0_to_coarse`` quantization (utils.py:25-29, 69-80),
- ``normalize_f0`` voiced-mean normalization with random scaling
  (utils.py:31-45),
- lf0 <-> mel-Hz conversions used by the f0 decoder (models.py:475, 527).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
F0_MEL_MIN = 1127.0 * np.log(1.0 + F0_MIN / 700.0)
F0_MEL_MAX = 1127.0 * np.log(1.0 + F0_MAX / 700.0)


def f0_to_coarse(f0: jax.Array) -> jax.Array:
    """Quantize f0 in Hz to [1, F0_BIN-1] integer bins (utils.py:69-80).

    Bin 1 is reserved for unvoiced (f0 == 0).
    """
    f0 = f0.astype(jnp.float32)
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    a = (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN)
    b = F0_MEL_MIN * a - 1.0
    f0_mel = jnp.where(f0_mel > 0, f0_mel * a - b, f0_mel)
    f0_coarse = jnp.round(f0_mel).astype(jnp.int32)
    f0_coarse = f0_coarse * (f0_coarse > 0)
    f0_coarse = f0_coarse + (f0_coarse < 1).astype(jnp.int32)
    f0_coarse = f0_coarse * (f0_coarse < F0_BIN)
    f0_coarse = f0_coarse + (f0_coarse >= F0_BIN).astype(jnp.int32) * (F0_BIN - 1)
    return f0_coarse


def f0_to_lf0(f0: jax.Array) -> jax.Array:
    """Hz -> scaled log-mel-Hz, the f0-decoder target (models.py:475)."""
    return 2595.0 * jnp.log10(1.0 + f0 / 700.0) / 500.0


def lf0_to_f0(lf0: jax.Array) -> jax.Array:
    """Inverse of :func:`f0_to_lf0` (models.py:527)."""
    return 700.0 * (jnp.power(10.0, lf0 * 500.0 / 2595.0) - 1.0)


def normalize_f0(
    lf0: jax.Array,
    x_mask: jax.Array,
    uv: jax.Array,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Subtract the voiced-frame mean; optionally scale by U(0.8, 1.2).

    lf0: [B, T, 1] scaled log-f0, x_mask: [B, T, 1], uv: [B, T] voiced flag.
    Matches ``utils.normalize_f0`` (utils.py:31-45); pass ``rng`` for the
    training-time random scale, None for inference (random_scale=False).
    """
    uv_sum = jnp.sum(uv, axis=1, keepdims=True)  # [B, 1]
    uv_sum = jnp.where(uv_sum == 0, 9999.0, uv_sum)
    means = jnp.sum(lf0[..., 0] * uv, axis=1, keepdims=True) / uv_sum  # [B, 1]

    if rng is not None:
        factor = jax.random.uniform(rng, (lf0.shape[0], 1), minval=0.8, maxval=1.2)
    else:
        factor = jnp.ones((lf0.shape[0], 1), dtype=lf0.dtype)

    f0_norm = (lf0 - means[..., None]) * factor[..., None]
    return f0_norm * x_mask


def interpolate_unvoiced(f0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Linearly interpolate f0 over unvoiced gaps; return (f0, uv).

    Host-side numpy helper mirroring the interpolation every reference F0
    predictor applies (e.g. modules/F0Predictor/DioF0Predictor.py:13-37).
    """
    f0 = np.asarray(f0, dtype=np.float64)
    uv = (f0 == 0).astype(np.float32)
    voiced_idx = np.where(f0 > 0)[0]
    if len(voiced_idx) == 0:
        return f0.astype(np.float32), 1.0 - uv
    out = f0.copy()
    out[: voiced_idx[0]] = f0[voiced_idx[0]]
    out[voiced_idx[-1] + 1 :] = f0[voiced_idx[-1]]
    unvoiced_idx = np.where(out == 0)[0]
    if len(unvoiced_idx):
        out[unvoiced_idx] = np.interp(unvoiced_idx, voiced_idx, f0[voiced_idx])
    return out.astype(np.float32), 1.0 - uv


__all__ = [
    "F0_BIN",
    "F0_MAX",
    "F0_MIN",
    "f0_to_coarse",
    "f0_to_lf0",
    "lf0_to_f0",
    "normalize_f0",
    "interpolate_unvoiced",
]
