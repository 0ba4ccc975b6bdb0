"""Compare 1-D conv lowerings for the train-path WN/FFN shapes on TPU.

The train-step trace shows XLA's conv backward for the K=5 / C=192->384
WaveNet convs (enc_q 16 layers + flow 16 layers) and the K=3 FFN convs
spending ~1.5 ms/step in halo-slice DMA machinery (bf16[48,65,192,5]
im2col slices). Candidates, each timed fwd and fwd+bwd in a device-side
scan with sequential dependence:

- xla:     lax.conv_general_dilated (current production)
- shift:   sum_k shift(x, k) @ W[k]   (K matmuls, no halo materialization)
- im2col:  concat K shifted views -> one [B*T, K*C] @ [K*C, F] matmul

Run: python tools/profile_conv_forms.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 300


def loop_time(fn, *args):
    """Per-iter seconds of fn(*args) via two-length scan differencing.

    The axon tunnel's dispatch+fetch round trip is ~28 ms — far larger than
    one small conv — so time scans of k and 2k iterations and difference
    (the round trip cancels exactly, as bench.py _dispatch_time)."""

    def make(iters):
        def loop(a0, rest):
            def body(carry, i):
                out = fn(carry, *rest)
                leaf = jax.tree.leaves(out)[0]
                # feed a scalar of the output back into the carry: sequential
                carry = carry + 1e-20 * leaf.reshape(-1)[0].astype(carry.dtype)
                return carry, None

            return jax.lax.scan(body, a0, jnp.arange(iters))[0]

        return jax.jit(loop)

    f1, f2 = make(ITERS), make(2 * ITERS)
    singles, doubles = [], []
    np.asarray(f1(args[0], args[1:]).reshape(-1)[0])
    np.asarray(f2(args[0], args[1:]).reshape(-1)[0])
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f1(args[0], args[1:]).reshape(-1)[0])
        singles.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(args[0], args[1:]).reshape(-1)[0])
        doubles.append(time.perf_counter() - t0)
    return max(
        (float(np.median(doubles)) - float(np.median(singles))) / ITERS, 1e-9
    )


def conv_xla(x, w, dil=1):
    k = w.shape[0]
    pad = (k - 1) * dil // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dil,), dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_shift(x, w, dil=1):
    k = w.shape[0]
    pad = (k - 1) * dil // 2
    b, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    y = None
    for i in range(k):
        term = jnp.einsum("btc,cf->btf", jax.lax.dynamic_slice_in_dim(xp, i * dil, t, 1), w[i])
        y = term if y is None else y + term
    return y


def conv_im2col(x, w, dil=1):
    k = w.shape[0]
    pad = (k - 1) * dil // 2
    b, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    cols = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(xp, i * dil, t, 1) for i in range(k)], axis=-1
    )
    return cols @ w.reshape(k * c, -1)


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("wn k5 192->384 T512 B6", (6, 512, 192), (5, 192, 384), 1),
        ("ffn k3 192->768 T512 B6", (6, 512, 192), (3, 192, 768), 1),
        ("ffn k3 768->192 T512 B6", (6, 512, 768), (3, 768, 192), 1),
        ("enc_p k3 192->192 d1", (6, 512, 192), (3, 192, 192), 1),
    ]
    for name, xs, ws, dil in cases:
        x = jnp.asarray(rng.standard_normal(xs) * 0.3, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.bfloat16)
        print(f"\n== {name}")
        for label, fn in (("xla", conv_xla), ("shift", conv_shift), ("im2col", conv_im2col)):
            t_f = loop_time(lambda xx, ww: fn(xx, ww, dil), x, w)

            def fb(xx, ww, fn=fn):
                def loss(args):
                    return jnp.sum(fn(args[0], args[1], dil).astype(jnp.float32) ** 2)

                g = jax.grad(loss)((xx, ww))
                return g[0]

            t_b = loop_time(fb, x, w)
            print(f"  {label:7s} fwd {t_f*1e6:8.1f} us   fwd+bwd {t_b*1e6:8.1f} us")
        # parity check
        ra = np.asarray(conv_xla(x, w, dil), np.float32)
        for label, fn in (("shift", conv_shift), ("im2col", conv_im2col)):
            rb = np.asarray(fn(x, w, dil), np.float32)
            err = np.abs(ra - rb).max() / (np.abs(ra).max() + 1e-9)
            print(f"  parity {label}: rel_err {err:.2e}")


if __name__ == "__main__":
    main()
