"""Probe: MSD tower with batch flattened into time (zero gaps) vs batched.

Grouped-conv backward picks a batch-minor layout at B=12 (measured 9%
lane efficiency); with B=1 and batches laid out along time separated by
zero gaps >= the tower's receptive field (re-zeroed after every layer so
gap bleed matches per-batch zero padding exactly), XLA should keep
C-lane-major layouts.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

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


def conv(x, kern, stride, groups, pad):
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(stride,), padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups,
    )


def tower(x, kerns, gap_masks=None):
    fmaps = []
    for i, (ch, k, s, g, pad) in enumerate(SPECS):
        x = conv(x, kerns[i], s, g, pad)
        x = jnp.where(x >= 0, x, 0.1 * x)
        if gap_masks is not None:
            x = x * gap_masks[i]
        fmaps.append(x)
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

    # --- batched baseline -------------------------------------------
    def make_batched(ks):
        def body(p, i):
            def l(pp):
                fm = tower(x + (i * 1e-9).astype(x.dtype),
                           [kk.astype(jnp.bfloat16) for kk in pp])
                return loss_of(fm)
            gr = jax.grad(l)(p)
            return jax.tree.map(lambda a, bb: a - 1e-9 * bb, p, gr), None
        def loop(p):
            p2, _ = jax.lax.scan(body, p, jnp.arange(ITERS))
            return p2, jax.tree.leaves(p2)[0].sum()
        return loop

    copy = jax.jit(lambda t_: [a + 0 for a in t_])
    timed("MSD tower batched B=12", make_batched(kerns), copy(list(kerns)))

    # --- flat: batches along time with zero gaps --------------------
    gap = 2560  # receptive separation: 40 taps * stride product 64
    tp = t + gap
    xf = jnp.pad(x, ((0, 0), (0, gap), (0, 0))).reshape(1, b * tp, 1)
    # per-layer gap masks (valid where within the first t/stride rows of
    # each batch's block)
    masks = []
    stride_prod = 1
    for ch, k, s, g, pad in SPECS:
        stride_prod *= s
        tl = tp // stride_prod
        vl = t // stride_prod
        m = np.zeros((1, b * tl, 1), np.float32)
        for j in range(b):
            m[0, j * tl : j * tl + vl] = 1.0
        masks.append(jnp.asarray(m, jnp.bfloat16))

    def make_flat(ks):
        def body(p, i):
            def l(pp):
                fm = tower(xf + (i * 1e-9).astype(xf.dtype),
                           [kk.astype(jnp.bfloat16) for kk in pp], masks)
                return loss_of(fm)
            gr = jax.grad(l)(p)
            return jax.tree.map(lambda a, bb: a - 1e-9 * bb, p, gr), None
        def loop(p):
            p2, _ = jax.lax.scan(body, p, jnp.arange(ITERS))
            return p2, jax.tree.leaves(p2)[0].sum()
        return loop

    timed("MSD tower FLAT  B=1 (gapped)", make_flat(kerns), copy(list(kerns)))

    # numeric check: flat valid region == batched output (fp tolerance)
    fb = tower(x, [kk.astype(jnp.bfloat16) for kk in kerns])
    ff = tower(xf, [kk.astype(jnp.bfloat16) for kk in kerns], masks)
    sp = 1
    for i, (ch, k, s, g, pad) in enumerate(SPECS):
        sp *= s
        tl, vl = (t + gap) // sp, t // sp
        flat = ff[i][0].reshape(b, tl, ch)[:, :vl]
        err = jnp.max(jnp.abs(flat.astype(jnp.float32) -
                              fb[i][:, :vl].astype(jnp.float32)))
        print(f"layer {i}: max |flat - batched| = {float(err):.3e}")


if __name__ == "__main__":
    main()
