"""Compare MPD (k,1)-conv lowerings per layer shape on the real chip.

Times XLA conv vs shift-matmul (ops/im2col.py conv2d_w1_shift) fwd and
fwd+bwd for every period-discriminator layer shape at batch 12 (the
one-pass [y; y_hat] train configuration), with two-length scan
differencing (the tunnel round trip cancels).

Run: python tools/profile_mpd_forms.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from sovits_tpu.ops.im2col import conv2d_w1_shift  # noqa: E402

ITERS = 100


def loop_time(fn, *args):
    def make(iters):
        def loop(a0, rest):
            def body(carry, i):
                out = fn(carry + 0.0 * i.astype(carry.dtype), *rest)
                leaf = jax.tree.leaves(out)[0]
                carry = carry + 1e-30 * jnp.sum(leaf).astype(carry.dtype)
                return carry, None

            return jax.lax.scan(body, a0, jnp.arange(iters, dtype=jnp.float32))[0]

        return jax.jit(loop)

    f1, f2 = make(ITERS), make(2 * ITERS)
    np.asarray(f1(args[0], args[1:]).reshape(-1)[0])
    np.asarray(f2(args[0], args[1:]).reshape(-1)[0])
    singles, doubles = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f1(args[0], args[1:]).reshape(-1)[0])
        singles.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(args[0], args[1:]).reshape(-1)[0])
        doubles.append(time.perf_counter() - t0)
    return max((float(np.median(doubles)) - float(np.median(singles))) / ITERS, 1e-9)


def conv_xla(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, 1), padding=((pad, pad), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    rng = np.random.default_rng(0)
    seg = 8960
    for p in (2, 11):
        h = -(-seg // p)
        chans = [(1, 32, 5, 3), (32, 128, 5, 3), (128, 512, 5, 3),
                 (512, 1024, 5, 3), (1024, 1024, 5, 1), (1024, 1, 3, 1)]
        for li, (ci, co, k, s) in enumerate(chans):
            x = jnp.asarray(rng.standard_normal((12, h, p, ci)) * 0.3, jnp.bfloat16)
            w = jnp.asarray(rng.standard_normal((k, 1, ci, co)) * 0.05, jnp.bfloat16)
            pad = (k - 1) // 2
            res = {}
            for label, fn in (
                ("xla", lambda xx, ww: conv_xla(xx, ww, s, pad)),
                ("shift", lambda xx, ww: conv2d_w1_shift(xx, ww, None, s, pad)),
            ):
                t_f = loop_time(fn, x, w)

                def fb(xx, ww, fn=fn):
                    def loss(args):
                        return jnp.sum(fn(args[0], args[1]).astype(jnp.float32) ** 2)

                    return jax.grad(loss)((xx, ww))[1]

                t_b = loop_time(fb, x, w)
                res[label] = (t_f, t_b)
            ra = np.asarray(conv_xla(x, w, s, pad), np.float32)
            rb = np.asarray(conv2d_w1_shift(x, w, None, s, pad), np.float32)
            err = np.abs(ra - rb).max() / (np.abs(ra).max() + 1e-9)
            print(
                f"p{p:2d} L{li} {ci:5d}->{co:5d} k{k} s{s} H{h:5d}: "
                f"xla {res['xla'][0]*1e6:7.1f}/{res['xla'][1]*1e6:7.1f} us  "
                f"shift {res['shift'][0]*1e6:7.1f}/{res['shift'][1]*1e6:7.1f} us"
                f"  rel_err {err:.1e}",
                flush=True,
            )
            h = (h + 2 * pad - k) // s + 1  # torch conv output length


if __name__ == "__main__":
    main()
