"""Staging-dtype sweep for the fused resblock trio on the real chip.

Round-5 VERDICT #3: the C=16 tail stage pays ~8x lane-padding MAC overhead
and the kernel is MXU-bound at the fp32 rate (fp32 staging scratch). bf16
staging would run the matmuls at the bf16 MXU rate (4x fp32 peak on v5e)
IF the row-shifted reads stay cheap. Modes measured per tail width:

  off    - fp32 staging, arbitrary-offset ref reads (round-4 production)
  single - one bf16 buffer, arbitrary-offset reads (Mosaic shuffles on odd)
  dual   - two bf16 buffers at row offsets 0/+1: every read even-aligned
           to the (16, 128) packed tiling; one odd-offset write per conv

Shapes mirror the PROFILE.md trio table: 10 s 44.1 kHz clip, tail stages
C=128/64/32/16 at their true time lengths. Run: python tools/profile_trio_bf16.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from sovits_tpu.ops.fused_stage import (  # noqa: E402
    fused_resblock_trio_folded,
    trio_folded_xla,
)

ITERS = 16
KS = (3, 7, 11)
DS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

# (C, T) for the last four upsample stages of a 10 s 44.1 kHz clip
# (862 frames * 512 hop = 441344 samples at the output; stage T halves
# backwards through the 2,2,2 tails)
STAGES = [(128, 55168), (64, 110336), (32, 220672), (16, 441344)]


def scan_time(fn, *args, iters=ITERS):
    def loop(*a):
        def body(carry, i):
            out = fn(*a)
            return carry + out[0, 0, :8].astype(jnp.float32).sum(), None

        return jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(iters, dtype=jnp.float32)
        )[0]

    jitted = jax.jit(loop)
    np.asarray(jitted(*args))
    t0 = time.perf_counter()
    np.asarray(jitted(*args))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    for c, t in STAGES:
        p = max(128 // c, 1)
        q = t // p
        d = p * c
        xf = jnp.asarray(rng.standard_normal((1, q, d)), jnp.bfloat16)
        kernels, biases = [], []
        for k, dils in zip(KS, DS):
            for _dil in dils:
                for _ in range(2):
                    kernels.append(
                        jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
                    )
                    biases.append(
                        jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)
                    )
        kernels = tuple(kernels)
        biases = tuple(biases)

        ref = None
        row = [f"C={c:<4d} T={t:<7d}"]
        for mode in ("off", "single", "dual"):
            fn = lambda x, m=mode: fused_resblock_trio_folded(
                x, kernels, biases, p, KS, DS, stage_bf16=m
            )
            out = jax.jit(fn)(xf)
            if ref is None:
                ref = np.asarray(
                    trio_folded_xla(xf, kernels, biases, p, KS, DS), np.float32
                )
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            dt = scan_time(fn, xf)
            row.append(f"{mode}={dt*1e3:7.3f}ms(err {err:.1e})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
