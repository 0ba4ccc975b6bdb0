"""Microbench: shifted-operand strategies for the fused trio kernel.

The fused resblock trio's matmuls need row-shifted views of each
intermediate (ops/fused_stage.py). The current kernel materializes each
shift as a concat-rotate VPU copy; NOTES.md flags "read shifted windows
straight from VMEM with sublane offsets" as the remaining 1.5-2x
headroom. This probe measures, on the real chip, one simplified chain
(12 convs, one kernel size) per strategy:

  A concat   - rotate via two-slice concat of the VALUE (current)
  B scratch  - write the intermediate to a margin-extended VMEM scratch
               ref, read shifts as static offset slices of the REF
  C roll     - pltpu.roll on the value
  D fp32in   - like B but intermediates kept fp32 (no bf16 cast churn)

Usage: python tools/profile_trio_shift.py [C] [T]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T = int(sys.argv[2]) if len(sys.argv) > 2 else 55104
P = max(128 // C, 1)
D = P * C
Q = T // P
BLOCK_Q = 1024
N_CONV = 12  # two conv pairs x 3 "resblocks" shaped chain
SHIFTS = (-1, 0, 1)  # 3 shifts per conv (k=3-ish plan)
HALO = 16  # margin rows, multiple of 8


def make_kernel(mode):
    n_blocks = Q // BLOCK_Q
    r_rows = BLOCK_Q + 2 * HALO
    m_rows = r_rows + 2 * HALO  # scratch with margin for offset reads

    def kernel(x_hbm, mats_ref, out_ref, xbuf, sbuf, sem):
        qi = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(qi * BLOCK_Q, r_rows), :], xbuf, sem
        )
        dma.start()
        dma.wait()

        def conv_concat(xin, ci):
            acc = None
            for j, s in enumerate(SHIFTS):
                a = (-s) % r_rows
                xs = (
                    jnp.concatenate([xin[r_rows - a:], xin[:r_rows - a]], axis=0)
                    if s
                    else xin
                )
                t = jnp.dot(xs, mats_ref[ci * len(SHIFTS) + j],
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
            return acc.astype(xin.dtype)

        def conv_roll(xin, ci):
            acc = None
            for j, s in enumerate(SHIFTS):
                xs = pltpu.roll(xin, -s, 0) if s else xin
                t = jnp.dot(xs, mats_ref[ci * len(SHIFTS) + j],
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
            return acc.astype(xin.dtype)

        def conv_scratch(xin, ci, out_dtype):
            # xin lives in sbuf[HALO : HALO + r_rows]; margins stay zero
            sbuf[HALO:HALO + r_rows] = xin.astype(sbuf.dtype)
            acc = None
            for j, s in enumerate(SHIFTS):
                xs = sbuf[HALO + s:HALO + s + r_rows]
                t = jnp.dot(xs, mats_ref[ci * len(SHIFTS) + j],
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
            return acc.astype(out_dtype)

        x = xbuf[:]
        for ci in range(N_CONV):
            x = jnp.maximum(x, 0.1 * x)
            if mode == "concat":
                x = conv_concat(x, ci)
            elif mode == "roll":
                x = conv_roll(x, ci)
            elif mode == "scratch":
                x = conv_scratch(x, ci, xbuf.dtype)
            elif mode == "fp32in":
                x = conv_scratch(x, ci, jnp.float32)
        out_ref[0] = x[HALO:HALO + BLOCK_Q].astype(out_ref.dtype)

    dt = jnp.bfloat16
    sdt = jnp.float32 if mode == "fp32in" else dt

    @jax.jit
    def run(xp, mats):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, Q, D), dt),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, D), lambda qi: (0, qi, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((r_rows, D), dt),
                pltpu.VMEM((m_rows, D), sdt),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(xp, mats)

    return run


def bench(mode, iters=100):
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((1, Q + 2 * HALO, D)) * 0.1, jnp.bfloat16)
    mats = jnp.asarray(
        rng.standard_normal((N_CONV * len(SHIFTS), D, D)) * (0.5 / D) ** 0.5,
        jnp.bfloat16,
    )
    run = make_kernel(mode)

    @jax.jit
    def loop(xp, mats):
        def body(c, i):
            y = run(xp + (i * 1e-6).astype(xp.dtype), mats)
            return c + y.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.zeros(()), jnp.arange(iters, dtype=jnp.float32))[0]

    np.asarray(loop(xp, mats))
    t0 = time.perf_counter()
    np.asarray(loop(xp, mats))
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * N_CONV * len(SHIFTS) * Q * D * D
    dense_flops = 2 * N_CONV * 3 * T * C * C  # as if k=3 dense conv
    print(f"{mode:8s}  {dt*1e3:7.3f} ms   mxu {flops/dt/1e12:6.1f} TF/s"
          f"   dense-MFU {dense_flops/dt/197e12*100:5.1f}%")
    return dt


if __name__ == "__main__":
    print(f"C={C} P={P} D={D} T={T} Q={Q} convs={N_CONV} shifts/conv={len(SHIFTS)}")
    for mode in ("concat", "scratch", "roll", "fp32in"):
        try:
            bench(mode)
        except Exception as e:
            print(f"{mode:8s}  FAILED: {type(e).__name__}: {str(e)[:200]}")
