"""Per-stage device-time profile of the inference path on the real chip.

Times each pipeline stage with a device-side lax.scan (tunnel-latency
immune): prior encoder + flow, the NSF source, each vocoder upsample stage
(XLA conv vs folded XLA vs Pallas fused trio), and the full synthesizer in
each execution mode. Writes PROFILE.md + profile.json at the repo root.

Run: python tools/profile_vocoder.py  (requires the TPU chip).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SECONDS = 10.0
DT = jnp.bfloat16
KS = (3, 7, 11)
DS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def _scan_raw(fn, *args, iters):
    def loop(*a):
        def body(c, i):
            out = fn(*[
                x + (i * 1e-6).astype(jnp.asarray(x).dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x
                for x in a
            ])
            return c + jax.tree.leaves(out)[0].sum().astype(jnp.float32), None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(iters, dtype=jnp.float32))[0]

    j = jax.jit(loop)
    np.asarray(j(*args))
    t0 = time.perf_counter()
    np.asarray(j(*args))
    return (time.perf_counter() - t0) / iters


def scan_time(fn, *args, iters=200):
    """Per-call device time: many-iteration scan MINUS the same scan with a
    null body. The axon tunnel adds ~28 ms per host dispatch; at the old
    iters=10 that inflated every stage by ~2.8 ms (round-2 PROFILE.md's
    numbers had this bug — e.g. the C=16 fused trio is really ~1.3 ms, not
    3.84 ms)."""
    total = _scan_raw(fn, *args, iters=iters)
    null = _scan_raw(lambda *a: a[0], *args, iters=iters)
    return max(total - null, 1e-9)


def profile_stages():
    """Per-stage resblock-trio timings across the three execution modes."""
    from sovits_tpu.ops.folded import folded_conv1d
    from sovits_tpu.ops.fused_stage import fused_resblock_trio

    tf = 861
    rows = []
    for c, t in [(256, tf * 8), (128, tf * 64), (64, tf * 128),
                 (32, tf * 256), (16, tf * 512)]:
        rng = np.random.default_rng(0)
        kernels, biases = [], []
        for k, dils in zip(KS, DS):
            for _d in dils:
                for _ in range(2):
                    kernels.append(jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, DT))
                    biases.append(jnp.asarray(rng.standard_normal(c) * 0.05, DT))
        x = jnp.asarray(rng.standard_normal((1, t, c)) * 0.3, DT)

        def trio_xla(x):
            i = 0
            xs = None
            for k, dils in zip(KS, DS):
                xr = x
                for d in dils:
                    pad1 = (k - 1) * d // 2
                    xt = jnp.where(xr >= 0, xr, xr * 0.1)
                    xt = jax.lax.conv_general_dilated(
                        xt, kernels[i], (1,), ((pad1, pad1),), rhs_dilation=(d,),
                        dimension_numbers=("NWC", "WIO", "NWC")) + biases[i]
                    xt = jnp.where(xt >= 0, xt, xt * 0.1)
                    pad2 = (k - 1) // 2
                    xt = jax.lax.conv_general_dilated(
                        xt, kernels[i + 1], (1,), ((pad2, pad2),),
                        dimension_numbers=("NWC", "WIO", "NWC")) + biases[i + 1]
                    i += 2
                    xr = xt + xr
                xs = xr if xs is None else xs + xr
            return xs / 3.0

        def trio_folded(x):
            p = 1
            while p < 8 and p * c < 128:
                p *= 2
            i = 0
            xs = None
            for k, dils in zip(KS, DS):
                xr = x
                for d in dils:
                    xt = jnp.where(xr >= 0, xr, xr * 0.1)
                    xt = folded_conv1d(xt, kernels[i], biases[i], d, p)
                    xt = jnp.where(xt >= 0, xt, xt * 0.1)
                    xt = folded_conv1d(xt, kernels[i + 1], biases[i + 1], 1, p)
                    i += 2
                    xr = xt + xr
                xs = xr if xs is None else xs + xr
            return xs / 3.0

        row = {"channels": c, "t_samples": t}
        row["xla_conv_ms"] = scan_time(trio_xla, x) * 1e3
        row["folded_xla_ms"] = scan_time(trio_folded, x) * 1e3
        try:
            row["pallas_fused_ms"] = scan_time(
                lambda x: fused_resblock_trio(x, kernels, biases, KS, DS), x
            ) * 1e3
        except Exception as e:
            row["pallas_fused_ms"] = None
            row["pallas_error"] = type(e).__name__
        # dense-conv FLOPs of the trio (what the hardware must at minimum do)
        flops = 2 * t * c * c * sum(6 * k for k in KS)
        for key in ("xla_conv_ms", "folded_xla_ms", "pallas_fused_ms"):
            if row.get(key):
                row[key.replace("_ms", "_mfu_pct")] = round(
                    flops / (row[key] * 1e-3) / 197e12 * 100, 1
                )
        rows.append(row)
        print(row, flush=True)
    return rows


def profile_full():
    from sovits_tpu import config as scfg
    from sovits_tpu.models import Synthesizer, factory

    hps = scfg.default_config()
    sr, hop = hps.data.sampling_rate, hps.data.hop_length
    tf = int(sr * SECONDS) // hop
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal((1, tf, hps.model.ssl_dim)), jnp.float32)
    f0 = jnp.asarray(rng.uniform(100, 400, (1, tf)), jnp.float32)
    uv = jnp.ones((1, tf), jnp.float32)
    spk = jnp.zeros((1,), jnp.int32)

    out = {}
    for name, fused in [("folded_xla", False), ("pallas_fused", True)]:
        syn = factory.build_synthesizer(hps, dtype=DT, fused_tail=fused)
        params = factory.init_synthesizer_params(
            syn, jax.random.PRNGKey(0), hps, t_frames=32, batch=1)

        def infer(c, f0, uv):
            w, _ = syn.apply({"params": params}, c, f0, uv, spk,
                             sample_noise=True,
                             rngs={"noise": jax.random.PRNGKey(1)},
                             method=Synthesizer.infer)
            return w

        dt = scan_time(infer, c, f0, uv, iters=100)
        out[name] = {"ms_per_10s_clip": dt * 1e3, "rtf": dt / SECONDS}
        print(name, out[name], flush=True)
    return out


def main():
    stages = profile_stages()
    full = profile_full()
    data = {"per_stage_resblock_trio": stages, "full_synthesizer": full,
            "device": str(jax.devices()[0])}
    root = Path(__file__).resolve().parent.parent
    (root / "profile.json").write_text(json.dumps(data, indent=2))

    lines = [
        "# Vocoder profile (real chip)",
        "",
        f"Device: {data['device']}. Per-stage resblock-trio times for a 10 s",
        "clip, three execution modes, with effective MFU against the dense",
        "conv FLOP count (bf16 peak 197 TF/s).",
        "",
        "| C | T | XLA conv | folded XLA | Pallas fused | best MFU |",
        "|---|---|---------|------------|--------------|----------|",
    ]
    for r in stages:
        best = min(
            (r[k] for k in ("xla_conv_ms", "folded_xla_ms", "pallas_fused_ms") if r.get(k)),
        )
        best_mfu = max(
            (r.get(k.replace("_ms", "_mfu_pct"), 0) or 0)
            for k in ("xla_conv_ms", "folded_xla_ms", "pallas_fused_ms")
        )
        pal = f"{r['pallas_fused_ms']:.2f}" if r.get("pallas_fused_ms") else "-"
        lines.append(
            f"| {r['channels']} | {r['t_samples']} | {r['xla_conv_ms']:.2f} ms "
            f"| {r['folded_xla_ms']:.2f} ms | {pal} ms | {best_mfu}% |"
        )
    lines += [
        "",
        "Full synthesizer (10 s 44.1 kHz clip, batch 1, bf16, noise on):",
        "",
    ]
    for k, v in full.items():
        lines.append(f"- {k}: {v['ms_per_10s_clip']:.2f} ms (RTF {v['rtf']:.5f})")
    (root / "PROFILE.md").write_text("\n".join(lines) + "\n")
    print("wrote PROFILE.md / profile.json")


if __name__ == "__main__":
    main()
