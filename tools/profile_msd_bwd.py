"""Wide grouped-conv backward variants for the MSD tower (g64/g256 layers).

r4 VERDICT next #2: the MSD grouped-conv backward is 6.3 ms of the 36.4 ms
train step; the identified fix is a better weight/input-gradient
formulation for the WIDE grouped layers (models.py:206-212 in the
reference). This probes, per layer and tunnel-immune (device-side scan):

  xla       - jax.lax grouped conv, XLA's own VJP
  cur       - ops.grouped.grouped_conv1d (block-diag dense dx, XLA dw)
  v2        - group-batched tiny-matmul dx + dense-stacked-shift dw with
              block-diagonal extraction (all real FLOPs + small overhead)
  dense     - masked-dense conv (block-diag kernel, XLA dense VJP)

Run on the real chip: python tools/profile_msd_bwd.py
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 20


def timed(name, make_loop, state):
    jitted = jax.jit(make_loop)
    state, warm = jitted(state)
    np.asarray(warm)
    t0 = time.perf_counter()
    state, out = jitted(state)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {name:40s}{dt*1e3:8.3f} ms", flush=True)
    return dt


def probe(tag, t_in, cin, cout, k, stride, groups):
    rng = np.random.default_rng(0)
    b = 12  # y and y_hat stacked, batch 6
    pad = (k // 2, k // 2)
    x = jnp.asarray(rng.standard_normal((b, t_in, cin)) * 0.1, jnp.bfloat16)
    kern0 = jnp.asarray(
        rng.standard_normal((k, cin // groups, cout)) * 0.05, jnp.bfloat16
    )
    print(f"{tag}: T={t_in} {cin}->{cout} k{k} s{stride} g{groups}", flush=True)

    def lax_conv(xi, kk, g):
        return jax.lax.conv_general_dilated(
            xi, kk, window_strides=(stride,), padding=(pad,),
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
        )

    from sovits_tpu.ops.grouped import grouped_conv1d

    cg = cin // groups
    cog = cout // groups

    # ---- v2 candidate -----------------------------------------------------
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def conv_v2(xi, kk):
        return lax_conv(xi, kk, groups)

    def v2_fwd(xi, kk):
        return conv_v2(xi, kk), (xi, kk)

    def v2_bwd(res, dout):
        xi, kk = res
        t_out = dout.shape[1]
        # dx: group-batched tiny matmul [B,T,g,cog] x [k,cg,g,cog] -> taps
        dout_r = dout.reshape(b, t_out, groups, cog)
        w_r = kk.reshape(k, cg, groups, cog)
        dxt = jnp.einsum(
            "btgm,kigm->bktgi", dout_r, w_r,
            preferred_element_type=jnp.float32,
        ).reshape(b, k, t_out, cin)
        # phase-shifted accumulation (same as ops.grouped._bwd)
        rows = t_in // stride
        lo = pad[0]
        phases = [None] * stride
        for tap in range(k):
            d = tap - lo
            p = d % stride
            m = (d - p) // stride
            contrib = dxt[:, tap]
            src_lo = max(0, -m)
            src_hi = min(t_out, rows - m)
            if src_hi <= src_lo:
                continue
            piece = jnp.pad(
                contrib[:, src_lo:src_hi],
                ((0, 0), (src_lo + m, rows - (src_hi + m)), (0, 0)),
            )
            phases[p] = piece if phases[p] is None else phases[p] + piece
        zero = jnp.zeros((b, rows, cin), jnp.float32)
        dx = jnp.stack(
            [ph if ph is not None else zero for ph in phases], axis=2
        ).reshape(b, t_in, cin).astype(xi.dtype)

        # dw: dense stacked-shift einsum + block-diagonal extraction
        x_pad = jnp.pad(xi, ((0, 0), (pad[0], pad[1]), (0, 0)))
        shifts = jnp.stack(
            [
                jax.lax.slice(
                    x_pad, (0, tap, 0), (b, tap + stride * t_out, cin),
                    (1, stride, 1),
                )
                for tap in range(k)
            ]
        )  # [k, B, T_out, cin]
        dwd = jnp.einsum(
            "kbti,bto->kio", shifts, dout,
            preferred_element_type=jnp.float32,
        )  # [k, cin, cout] dense
        # extract the block diagonal: dw[tap, i, g*cog+m] = dwd[tap, g*cg+i, g*cog+m]
        dwd = dwd.reshape(k, groups, cg, groups, cog)
        dw = jnp.diagonal(dwd, axis1=1, axis2=3)  # [k, cg, cog, g]
        dw = dw.transpose(0, 1, 3, 2).reshape(k, cg, cout).astype(kk.dtype)
        return dx, dw

    conv_v2.defvjp(v2_fwd, v2_bwd)

    # ---- dense masked variant ----------------------------------------------
    idx = jnp.arange(groups)

    def dense_conv(xi, kk):
        kd = jnp.zeros((k, groups, cg, groups, cog), kk.dtype)
        kd = kd.at[:, idx, :, idx, :].set(
            kk.reshape(k, cg, groups, cog).transpose(2, 0, 1, 3)
        )
        return lax_conv(xi, kd.reshape(k, cin, cout), 1)

    # block-dense: scatter the per-group kernels into dense 128-wide blocks
    # and keep only nb = cin/128 coarse groups — the 4-wide group structure
    # is entirely inside one 128-lane tile, so the block-diagonal zeros are
    # exact and every contraction is a full-width MXU feed, at 1/nb of the
    # fully-dense MAC count
    nb = max(cin // 128, 1)

    def blk_conv(xi, kk):
        if nb <= 1 or groups % nb:
            return dense_conv(xi, kk)
        gpb = groups // nb
        cib = cin // nb
        kb = kk.reshape(k, cg, nb, gpb, cog)
        kd = jnp.zeros((k, gpb, cg, nb, gpb, cog), kk.dtype)
        ig = jnp.arange(gpb)
        kd = kd.at[:, ig, :, :, ig, :].set(
            kb.transpose(3, 0, 1, 2, 4)  # [gpb, k, cg, nb, cog]
        )
        kfgc = kd.reshape(k, cib, cout)
        return lax_conv(xi, kfgc, nb)

    variants = {
        "xla": lambda xi, kk: lax_conv(xi, kk, groups),
        "cur": lambda xi, kk: grouped_conv1d(xi, kk, stride, pad, groups),
        "v2": conv_v2,
        "dense": dense_conv,
        "blk": blk_conv,
    }

    # numeric sanity: all variants agree in fwd and grads
    def loss(fn):
        return lambda xi, kk: jnp.mean(
            jnp.abs(fn(xi, kk).astype(jnp.float32))
        )

    ref_val, (ref_dx, ref_dw) = jax.value_and_grad(loss(variants["xla"]), (0, 1))(x, kern0)
    for name, fn in variants.items():
        v, (dx, dw) = jax.jit(jax.value_and_grad(loss(fn), (0, 1)))(x, kern0)
        for a, r, w in ((v, ref_val, "val"), (dx, ref_dx, "dx"), (dw, ref_dw, "dw")):
            err = float(
                jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)))
                / (jnp.max(jnp.abs(r.astype(jnp.float32))) + 1e-12)
            )
            assert err < 0.05, (name, w, err)

    for name, fn in variants.items():
        def make(st, fn=fn):
            def body(st, i):
                xx, kk = st
                dx, dk = jax.grad(
                    lambda a, b: jnp.mean(jnp.abs(fn(a, b).astype(jnp.float32))),
                    (0, 1),
                )(xx, kk)
                return (
                    xx - 1e-9 * dx.astype(xx.dtype),
                    kk - 1e-9 * dk.astype(kk.dtype),
                ), jnp.sum(dk.astype(jnp.float32))

            def loop(st):
                st, s = jax.lax.scan(body, st, jnp.arange(ITERS))
                return st, s.sum()

            return loop(st)

        def make_fwd(st, fn=fn):
            def body(st, i):
                xx, kk = st
                # i-dependence: a loop-invariant body would be hoisted out
                # of the scan by XLA and time nothing
                y = fn(xx + (i * 1e-9).astype(xx.dtype), kk)
                return (xx, kk), jnp.mean(jnp.abs(y.astype(jnp.float32)))

            def loop(st):
                st, s = jax.lax.scan(body, st, jnp.arange(ITERS))
                return st, s.sum()

            return loop(st)

        try:
            timed(name + " fwd+bwd", make, (x, kern0))
            timed(name + " fwd", make_fwd, (x, kern0))
        except Exception as e:
            print(f"  {name:40s}FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    probe("g64 layer (conv_3)", 560, 256, 1024, 41, 4, 64)
    probe("g256 layer (conv_4)", 140, 1024, 1024, 41, 4, 256)
