"""Benchmark: end-to-end RTF for a 10 s 44.1 kHz SVC conversion on one chip.

Measures the BASELINE.md chain — ContentVec768L12 speech encoder (full-size
topology, random weights) + DIO f0 (host DSP) + SynthesizerTrn with
NSF-HiFiGAN decode (noise sampling ON, the production path) — and prints
ONE JSON line with the total RTF. Per-stage breakdown, the train step rate
and a full-size mel-L1 parity number vs a converted torch reference land in
bench_details.json.

Baseline target (BASELINE.md): RTF < 0.05 on one v5e chip;
vs_baseline = target_rtf / measured_rtf (>1.0 beats the target).
RTF harness mirrors the reference solver (diffusion/solver.py:54-59):
wall_time / (samples / sample_rate).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: the bench compiles several large programs
# (full synthesizer x2, the fused GAN train step in a scan); cached
# executables cut a repeat run's wall clock by minutes (r3 VERDICT next #3:
# the driver's round-3 bench run timed out on compilation, rc=124).
os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SECONDS = 10.0
# The axon dev tunnel's sync fetch costs a jittery ~28 ms round trip, and
# block_until_ready does not synchronize at all; _dispatch_time cancels
# both with a two-length async-batch difference (see its docstring).
ITERS = 200

# Wall-clock budget for the whole bench (the driver kills overruns; r3's
# run died at rc=124 AFTER the headline but BEFORE any detail landed).
# Stages run in priority order, each gated on remaining budget, and
# bench_details.json is rewritten after EVERY stage so a kill never loses
# completed results again.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "480"))
_T0 = time.monotonic()


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def _log(msg: str) -> None:
    """Stage diagnostics on stderr: the driver consumes stdout (one JSON
    headline line), stderr shows where the wall time goes."""
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _dispatch_time(fn, *args, iters=ITERS):
    """Device time per call via async-pipelined batches of two lengths.

    Rounds 2-3 timed via a 200-iteration device-side lax.scan with a
    null-loop subtraction — accurate, but the scan wrapper around the
    full-size synthesizer compiles for minutes cold, which starved the
    driver-budgeted detail stages (r3 VERDICT next #3). Blocked per-call
    timing is NOT an option either: over the axon dev tunnel
    block_until_ready returns WITHOUT synchronizing (a 19 ms matmul chain
    "blocks" in 0.04 ms); only a data fetch synchronizes, and the fetch
    round trip is a jittery ~28 ms. So: submit k calls asynchronously
    (they queue server-side), force completion with a 1-scalar on-device
    reduction + fetch, and difference batches of k and 2k so the round
    trip and fetch cancel exactly. Validated against a known-duration
    matmul chain (~19 ms: measured 18.4-22.6 across trials; medians over
    5 pairs tighten it further)."""
    jitted = jax.jit(fn)
    summ = jax.jit(
        lambda t: jnp.sum(jax.tree.leaves(t)[0].astype(jnp.float32))
    )

    def run(k):
        out = None
        for _ in range(k):
            out = jitted(*args)
        return np.asarray(summ(out))

    run(1)  # compile + warm both programs
    k = max(iters // 4, 1)
    singles, doubles = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        run(k)
        singles.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(2 * k)
        doubles.append(time.perf_counter() - t0)
    per_call = (float(np.median(doubles)) - float(np.median(singles))) / k
    return max(per_call, 1e-9)


def main():
    # snapshot the PREVIOUS run's details before anything overwrites them:
    # stage rotation (r4 VERDICT next #1d) promotes stages the prior run
    # skipped, so every stage lands within two rounds even when the budget
    # can't fit them all
    try:
        with open("bench_details.json") as f:
            prior_details = json.load(f)
    except Exception:
        prior_details = {}

    from sovits_tpu import config as scfg
    from sovits_tpu.encoders.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
    from sovits_tpu.f0 import get_f0_predictor
    from sovits_tpu.models import Synthesizer, factory

    hps = scfg.default_config()
    sr = hps.data.sampling_rate
    hop = hps.data.hop_length
    t_frames = int(sr * SECONDS) // hop  # 861
    n_samples = t_frames * hop

    rng = np.random.default_rng(0)
    # a voiced-ish test signal so DIO does real work: 170 Hz with vibrato,
    # phase-integrated (sin(2*pi*f(t)*t) would chirp as t grows)
    t = np.arange(int(sr * SECONDS)) / sr
    inst_f = 170.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
    wav = (
        0.25 * np.sin(2 * np.pi * np.cumsum(inst_f) / sr)
        + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)

    # --- stage 1: speech encoder (vec768l12 topology, random weights) ---
    _log("stage 1: encoder init")
    enc_cfg = Wav2Vec2Config(output_layer=12)
    enc = Wav2Vec2Encoder(enc_cfg, dtype=jnp.bfloat16)
    wav16k = jnp.asarray(rng.standard_normal((1, int(16000 * SECONDS))), jnp.float32)
    enc_vars = jax.jit(enc.init)(jax.random.PRNGKey(0), wav16k)
    _log("stage 1: encoder scan")
    enc_time = _dispatch_time(lambda v, w: enc.apply(v, w), enc_vars, wav16k, iters=50)

    # --- stage 2: DIO f0 (host DSP, reference default predictor) ---
    _log("stage 2: dio")
    dio = get_f0_predictor("dio", hop_length=hop, sampling_rate=sr)
    dio.compute_f0_uv(wav)  # warm caches
    dio_times = []
    for _ in range(5):  # median: single-shot timing on a 1-core host is
        t0 = time.perf_counter()  # scheduler-noise dominated
        f0_np, uv_np = dio.compute_f0_uv(wav)
        dio_times.append(time.perf_counter() - t0)
    dio_time = float(np.median(dio_times))

    # --- stage 2b: harvest f0 timing fixture (r4 VERDICT next #4) ---
    _log("stage 2b: harvest")
    hv = get_f0_predictor("harvest", hop_length=hop, sampling_rate=sr)
    hv.compute_f0_uv(wav)  # warm caches / FFT plans
    hv_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        hv.compute_f0_uv(wav)
        hv_times.append(time.perf_counter() - t0)
    harvest_time = float(np.median(hv_times))

    # --- stage 3: synthesizer + NSF-HiFiGAN (noise sampling ON) ---
    c = jnp.asarray(rng.standard_normal((1, t_frames, hps.model.ssl_dim)), jnp.float32)
    f0 = jnp.asarray(np.maximum(f0_np, 1.0)[None, :t_frames], jnp.float32)
    uv = jnp.asarray(uv_np[None, :t_frames], jnp.float32)
    spk = jnp.zeros((1,), jnp.int32)

    def synth_time(fused):
        _log(f"stage 3: synthesizer build+init (fused={fused})")
        syn = factory.build_synthesizer(hps, dtype=jnp.bfloat16, fused_tail=fused)
        # init through a non-fused twin (identical param tree): initializing
        # the fused model compiles the four Mosaic trio kernels a SECOND
        # time at the init shapes, several minutes of pure compile the
        # timed forward then repeats at full length
        syn_init = (
            factory.build_synthesizer(hps, dtype=jnp.bfloat16) if fused else syn
        )
        # init is JITTED (factory): params are born device-resident from one
        # compiled program — the r4 driver run spent 513 s dispatching eager
        # init ops through the tunnel (BENCH_r04 tail), and host-CPU init +
        # a 270 MB param upload through the tunnel is no better
        params = factory.init_synthesizer_params(
            syn_init, jax.random.PRNGKey(0), hps, t_frames=32, batch=1
        )
        jax.block_until_ready(params)
        _log("stage 3: init done, compiling timed forward")

        # params is an explicit jit arg: closing over it bakes ~270 MB of
        # weights into the HLO as constants, which the dev tunnel then
        # uploads on EVERY compile/cache-load (the r3/r4 driver runs spent
        # minutes there)
        def fn(params, c, f0, uv):
            wav_out, _ = syn.apply(
                {"params": params}, c, f0, uv, spk, sample_noise=True,
                # rbg keys: threefry normal sampling costs ~2 ms/clip on v5e
                rngs={"noise": jax.random.key(1, impl="rbg")},
                method=Synthesizer.infer,
            )
            return wav_out

        t = _dispatch_time(fn, params, c, f0, uv)
        _log(f"stage 3: done ({t * 1e3:.2f} ms)")
        return t

    try:
        syn_time = synth_time(fused=True)
        syn_mode = "pallas_fused_tail"
    except Exception as e:  # pallas unavailable -> folded XLA pipeline
        syn_time = synth_time(fused=False)
        syn_mode = f"folded_xla ({type(e).__name__})"

    # The product path (infer/svc.py get_unit_f0) runs the f0 predictor's
    # host DSP CONCURRENTLY with the async device-side speech encoder, so
    # the pipeline cost is max(enc, dio) + synth, not the sum (r2 VERDICT
    # weak #3: summing overstated the real pipeline).
    total = max(enc_time, dio_time) + syn_time
    rtf = total / SECONDS
    target = 0.05
    result = {
        "metric": "svc_e2e_rtf_10s_44k1_bf16",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(target / rtf, 3) if rtf > 0 else 0.0,
    }
    # emit the headline immediately; details below must not delay/fail it
    print(json.dumps(result), flush=True)

    # Carry the PRIOR run's completed detail stages forward under an
    # explicit label: stage rotation means a budget-limited run may skip
    # stages a previous run captured, and the driver-written file must not
    # LOSE that evidence (r4: the driver's overwrite dropped the committed
    # train/learning numbers). Clearly marked as from a prior run, never
    # merged into this run's top-level numbers.
    _stage_keys = (
        "train_steps_per_sec", "learning", "learning_e2e",
        "pallas_parity", "mel_l1_vs_torch_fullsize",
    )
    prior_stages = {
        k: v
        for k, v in prior_details.items()
        if k in _stage_keys and not (isinstance(v, dict) and "skipped" in v)
    }
    # a prior run may itself carry older evidence: keep the freshest copy
    for k, v in (prior_details.get("prior_run_stages") or {}).items():
        if k in _stage_keys and k not in prior_stages and k != "stage_seconds":
            prior_stages[k] = v
    if isinstance(prior_details.get("stage_seconds"), dict):
        prior_stages["stage_seconds"] = prior_details["stage_seconds"]

    details = {
        "encoder_time_s": enc_time,
        "dio_time_s": dio_time,
        "harvest_time_s": harvest_time,
        "synthesizer_time_s": syn_time,
        "synthesizer_mode": syn_mode,
        "total_rtf": rtf,
        "sequential_sum_rtf": (enc_time + dio_time + syn_time) / SECONDS,
        "encoder_rtf": enc_time / SECONDS,
        "dio_rtf": dio_time / SECONDS,
        "synthesizer_rtf": syn_time / SECONDS,
        "n_samples": n_samples,
    }
    if prior_stages:
        details["prior_run_stages"] = prior_stages

    def flush():
        with open("bench_details.json", "w") as f:
            json.dump(details, f, indent=2)

    def stage(key, fn, min_budget_s):
        """Run a detail stage if the remaining budget allows; always flush."""
        left = _remaining()
        if left < min_budget_s:
            details[key] = {
                "skipped": f"deadline: {left:.0f}s left < {min_budget_s}s budget"
            }
            _log(f"stage {key}: skipped ({left:.0f}s left)")
        else:
            _log(f"stage {key}: start")
            t0 = time.monotonic()
            try:
                details[key] = fn()
            except Exception as e:
                details[key] = {"ok": False, "error": repr(e)}
            details.setdefault("stage_seconds", {})[key] = round(
                time.monotonic() - t0, 1
            )
            _log(f"stage {key}: done in {time.monotonic() - t0:.1f}s")
        flush()

    flush()
    # Detail stages, never-yet-driver-witnessed evidence first (r4 VERDICT
    # next #1b): the driver has recorded pallas_parity/mel_l1 via committed
    # bench_details in past rounds but NEVER train_steps_per_sec/learning.
    # Min budgets = measured cost in the driver environment with the
    # persistent compile cache warm (the builder's end-of-round full run
    # warms it) + >=40% headroom; a cold-cache run won't fit everything,
    # which the rotation absorbs: stages the PRIOR run skipped (or never
    # ran) are promoted to the front, so every stage lands within two
    # rounds even under a 480 s deadline (r4 VERDICT next #1d).
    stage_defs = [
        ("train_steps_per_sec", lambda: bench_train_step(hps), 150),
        ("learning", bench_learning, 120),
        ("learning_e2e", bench_learning_e2e, 150),
        ("pallas_parity", lambda: bench_pallas_parity(hps), 120),
        ("mel_l1_vs_torch_fullsize", lambda: bench_mel_l1(hps), 280),
    ]

    def ran_before(key: str) -> bool:
        v = prior_details.get(key)
        return v is not None and not (isinstance(v, dict) and "skipped" in v)

    # stable sort: stale/missing stages first, base priority within tiers
    stage_defs.sort(key=lambda kv: ran_before(kv[0]))
    for key, fn, budget in stage_defs:
        stage(key, fn, budget)


def bench_learning(steps: int = 300) -> dict:
    """On-chip proof the GAN trainer LEARNS (r3 VERDICT next #1).

    Overfits one fixed synthetic batch (sine-wave clips, tiny config) for
    `steps` fused train steps in a single device-side scan, then checks:
    G total loss and the mel term decline materially, and deterministic
    synthesis from the trained params is non-degenerate (finite,
    non-silent) with a much lower mel-L1 to ground truth than at init.
    The reference's implicit gate is periodic evaluate() synthesis
    (train.py:256-325); this is the bench-embedded equivalent of
    tests/test_learning.py on real hardware."""
    import sys

    sys.path.insert(0, "tests")
    from tiny import tiny_hps

    from sovits_tpu import train as strain
    from sovits_tpu.dsp import stft as dsp_stft
    from sovits_tpu.models import Synthesizer, factory

    # lr + eval scope calibrated in tests/test_learning.py: 8e-4 overfits
    # the fixed batch in ~150 steps; the prior-path eval is noisy under GAN
    # dynamics, so it is averaged over ALL items, and the full-size (not
    # disc_tiny) discriminator runs here — TPU affords it
    hps = tiny_hps(**{"train.learning_rate": 8e-4})
    rng = np.random.default_rng(11)
    sr, hop = hps.data.sampling_rate, hps.data.hop_length
    b, frames = 8, 64
    n = frames * hop
    t = np.arange(n) / sr
    wavs, f0s = [], []
    for i in range(b):
        freq = 150.0 + 22.0 * i
        wavs.append((0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32))
        f0s.append(np.full(frames, freq, np.float32))
    wav = np.stack(wavs)
    spec = np.stack(
        [
            np.asarray(
                dsp_stft.spectrogram(
                    jnp.asarray(w[None]), hps.data.filter_length, hop,
                    hps.data.win_length,
                )[0]
            )
            for w in wavs
        ]
    )
    batch = {
        "c": jnp.asarray(rng.standard_normal((b, frames, hps.model.ssl_dim)), jnp.float32),
        "f0": jnp.asarray(np.stack(f0s)),
        "uv": jnp.ones((b, frames), jnp.float32),
        "spec": jnp.asarray(spec),
        "wav": jnp.asarray(wav[..., None]),
        "spk": jnp.asarray(np.arange(b) % hps.model.n_speakers, jnp.int32),
        "lengths": jnp.full((b,), frames, jnp.int32),
        "volume": jnp.asarray(np.abs(wav).reshape(b, frames, hop).mean(-1)),
    }

    syn = factory.build_synthesizer(hps)
    disc = factory.build_discriminator(hps)
    g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
    d_params = factory.init_discriminator_params(
        disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
    )
    g_tx = strain.make_optimizer(hps)
    d_tx = strain.make_optimizer(hps)
    state = strain.create_train_state(g_params, d_params, g_tx, d_tx)
    raw_step = strain.make_train_step(syn, disc, g_tx, d_tx, hps, jit_compile=False)

    def eval_mel_l1(params):
        wav_hat, _ = syn.apply(
            {"params": params}, batch["c"], batch["f0"],
            batch["uv"], batch["spk"], vol=batch["volume"],
            sample_noise=False, method=Synthesizer.infer,
        )
        mel_kw = dict(
            n_fft=hps.data.filter_length, n_mels=hps.data.n_mel_channels,
            sample_rate=sr, hop_length=hop, win_length=hps.data.win_length,
            fmin=hps.data.mel_fmin, fmax=hps.data.mel_fmax,
        )
        gt = dsp_stft.mel_spectrogram(batch["wav"][:, :, 0], **mel_kw)
        got = dsp_stft.mel_spectrogram(wav_hat[..., 0], **mel_kw)
        tm = min(gt.shape[-1], got.shape[-1])
        return wav_hat, jnp.mean(jnp.abs(gt[..., :tm] - got[..., :tm]))

    @jax.jit
    def run(state):
        def body(st, i):
            st, metrics = raw_step(
                st, batch, jax.random.fold_in(jax.random.key(3, impl="rbg"), i)
            )
            return st, (metrics["loss/g/total"], metrics["loss/g/mel"])

        st, (g_tot, g_mel) = jax.lax.scan(body, state, jnp.arange(steps))
        return st, g_tot, g_mel

    _, mel0 = jax.jit(eval_mel_l1)(g_params)
    state, g_tot, g_mel = run(state)
    wav_hat, mel1 = jax.jit(eval_mel_l1)(state.g_params)
    wav_hat = np.asarray(wav_hat, np.float32)
    g_tot, g_mel = np.asarray(g_tot), np.asarray(g_mel)
    k = max(steps // 12, 1)
    out = {
        "steps": steps,
        "g_total_first": float(g_tot[:k].mean()),
        "g_total_last": float(g_tot[-k:].mean()),
        "g_mel_first": float(g_mel[:k].mean()),
        "g_mel_last": float(g_mel[-k:].mean()),
        "eval_mel_l1_init": float(mel0),
        "eval_mel_l1_trained": float(mel1),
        "eval_finite": bool(np.isfinite(wav_hat).all()),
        "eval_nonsilent": bool(np.abs(wav_hat).max() > 1e-3),
    }
    out["ok"] = (
        out["eval_finite"]
        and out["eval_nonsilent"]
        and out["g_mel_last"] < 0.7 * out["g_mel_first"]
        and out["eval_mel_l1_trained"] < 0.7 * out["eval_mel_l1_init"]
    )
    return out


def bench_learning_e2e(first: int = 120, second: int = 60) -> dict:
    """On-chip proof the trainer PRODUCT works end to end (r4 VERDICT next
    #5): not a hand-built batch, but the real pipeline — synthetic dataset
    on disk -> FeatureDataset/batch_iterator -> trainer_mod.train with
    orbax checkpointing -> a RESUMED second run that must continue the
    mel-loss trajectory. Tiny config so the whole thing fits a bench stage;
    the pytest twin is tests/test_learning.py::
    test_learning_resume_continues_trajectory (CPU mesh). Mirrors the
    reference's resume semantics (train.py:93-105) and periodic evaluate()
    gate (train.py:256-325)."""
    import sys
    import tempfile
    from pathlib import Path

    sys.path.insert(0, "tests")
    from tiny import make_synthetic_dataset, tiny_hps

    from sovits_tpu.train import trainer as trainer_mod

    hps = tiny_hps(**{
        "train.learning_rate": 8e-4,
        "train.log_interval": 1,
        "train.eval_interval": 10_000,  # only the max_steps save fires
        "train.epochs": 10_000,
    })
    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        make_synthetic_dataset(tmp / "data", hps, n_speakers=2, n_per_spk=3)
        model_dir = tmp / "model"
        state1 = trainer_mod.train(hps, model_dir, max_steps=first)
        state2 = trainer_mod.train(hps, model_dir, max_steps=first + second)
        recs = [
            json.loads(line)
            for line in (model_dir / "metrics.jsonl").read_text().splitlines()
        ]
    mel = {r["step"]: r["loss/g/mel"] for r in recs if "loss/g/mel" in r}
    w = 20
    head = float(np.mean([mel[s] for s in range(1, 1 + w)]))
    pre = float(np.mean([mel[s] for s in range(first - w + 1, first + 1)]))
    post = float(np.mean([mel[s] for s in range(first + 1, first + 1 + w)]))
    tail = float(np.mean(
        [mel[s] for s in range(first + second - w + 1, first + second + 1)]
    ))
    out = {
        "steps_run1": int(state1.step),
        "steps_run2": int(state2.step),
        "mel_head": head,
        "mel_pre_resume": pre,
        "mel_post_resume": post,
        "mel_tail": tail,
        "n_logged": len(mel),
    }
    out["ok"] = (
        int(state1.step) == first
        and int(state2.step) == first + second
        and len(mel) == first + second
        # learned in run 1; run 2 picks up where run 1 left off (no jump
        # back toward init) and keeps improving end to end
        and pre < 0.85 * head
        and post < pre * 1.15 + 1e-6
        and tail <= pre * 1.05 + 1e-6
    )
    return out


def bench_pallas_parity(hps) -> dict:
    """On-chip Pallas == XLA gate (r2 VERDICT weak #4).

    The test suite verifies the Pallas kernels only in interpret mode on the
    CPU mesh, which cannot see Mosaic codegen bugs. This runs the REAL
    kernels wherever a TPU backend is present and compares against the
    pure-XLA formulations with identical parameters; it skips cleanly
    elsewhere. Recorded in bench_details.json as {"ok": bool, ...}.
    """
    if jax.default_backend() != "tpu":
        return {"ok": True, "skipped": f"backend={jax.default_backend()}"}

    from sovits_tpu.nn.attention import Encoder as AttnEncoder
    from sovits_tpu.nn.attention import MultiHeadAttention
    from sovits_tpu.ops.fused_stage import trio_folded, trio_folded_xla

    rng = np.random.default_rng(3)
    out: dict = {}

    def rel_err(a, b):
        return float(np.abs(a - b).max() / (np.abs(a).max() + 1e-12))

    # 1) fused Pallas vocoder trio vs the differentiable folded-XLA chain,
    #    per production stage config (fold*C == 128; models/nsf_hifigan.py
    #    gate), bf16 inputs as in the production decode. Kernel-level
    #    rather than end-to-end full-size: same Mosaic codegen coverage,
    #    isolates the failing stage, and costs seconds instead of two
    #    ~100 s full-synthesizer compiles (r3 VERDICT next #3).
    ks = (3, 7, 11)
    dils = ((1, 3, 5),) * 3
    n_conv = sum(2 * len(d) for d in dils)
    for c_ch, fold in ((128, 1), (64, 2), (32, 4), (16, 8)):
        xf = jnp.asarray(
            rng.standard_normal((1, 2048 // fold, fold * c_ch)) * 0.3,
            jnp.bfloat16,
        )
        kernels = tuple(
            jnp.asarray(rng.standard_normal((k, c_ch, c_ch)) * 0.05, jnp.bfloat16)
            for k, d in zip(ks, dils) for _ in range(2 * len(d))
        )
        biases = tuple(
            jnp.asarray(rng.standard_normal(c_ch) * 0.01, jnp.bfloat16)
            for _ in range(n_conv)
        )
        got = jax.jit(
            lambda x, kr, b: trio_folded(x, kr, b, fold, ks, dils)
        )(xf, kernels, biases)
        ref = jax.jit(
            lambda x, kr, b: trio_folded_xla(x, kr, b, fold, ks, dils)
        )(xf, kernels, biases)
        out[f"fused_trio_c{c_ch}_rel_err"] = rel_err(
            np.asarray(got, np.float32), np.asarray(ref, np.float32)
        )

    # 1b) reduced-size END-TO-END fused-vs-nonfused synthesizer (r4 advisor
    #     finding #3): the kernel sweep can't see model-to-kernel wiring
    #     regressions (per-stage fold selection, return_weights extraction,
    #     noise_conv folding in models/nsf_hifigan.py). One short-clip
    #     full-model comparison on-chip closes that; t_frames=256 instead
    #     of the headline's 861 bounds the extra Mosaic compiles.
    from sovits_tpu.models import Synthesizer, factory as mfactory

    syn_f = mfactory.build_synthesizer(hps, dtype=jnp.bfloat16, fused_tail=True)
    syn_x = mfactory.build_synthesizer(hps, dtype=jnp.bfloat16, fused_tail=False)
    params = mfactory.init_synthesizer_params(
        syn_x, jax.random.PRNGKey(0), hps, t_frames=32, batch=1
    )
    t_sm = 256
    c = jnp.asarray(rng.standard_normal((1, t_sm, hps.model.ssl_dim)) * 0.3,
                    jnp.float32)
    f0 = jnp.asarray(rng.uniform(100, 300, (1, t_sm)), jnp.float32)
    uv = jnp.ones((1, t_sm), jnp.float32)
    spk = jnp.zeros((1,), jnp.int32)

    def e2e(syn):
        wav, _ = jax.jit(
            lambda p, c, f0, uv, s: syn.apply(
                {"params": p}, c, f0, uv, s, sample_noise=False,
                noise_scale=0.0, method=Synthesizer.infer,
            )
        )(params, c, f0, uv, spk)
        return np.asarray(wav, np.float32)

    out["e2e_synth_rel_err"] = rel_err(e2e(syn_f), e2e(syn_x))

    with jax.default_matmul_precision("highest"):
        # 2) fused rel-pos attention (windowed Encoder stack) vs the banded
        #    jnp path, identical params.
        enc_kw = dict(hidden_channels=192, filter_channels=768, n_heads=2,
                      n_layers=2, kernel_size=3, window_size=4)
        x = jnp.asarray(rng.standard_normal((2, 192, 192)) * 0.3, jnp.float32)
        x_mask = jnp.ones((2, 192, 1), jnp.float32)
        enc_jnp = AttnEncoder(**enc_kw, use_fused=False)
        enc_pl = AttnEncoder(**enc_kw, use_fused=True)
        variables = enc_jnp.init(jax.random.PRNGKey(1), x, x_mask)
        out["attention_windowed_rel_err"] = rel_err(
            np.asarray(jax.jit(enc_jnp.apply)(variables, x, x_mask)),
            np.asarray(jax.jit(enc_pl.apply)(variables, x, x_mask)),
        )

        # 3) fused causal attention (F0Decoder's FFT regime).
        mha_kw = dict(channels=192, out_channels=192, n_heads=2)
        q = jnp.asarray(rng.standard_normal((2, 160, 192)) * 0.3, jnp.float32)
        mha_jnp = MultiHeadAttention(**mha_kw, use_fused=False)
        mha_pl = MultiHeadAttention(**mha_kw, use_fused=True)
        variables = mha_jnp.init(jax.random.PRNGKey(2), q, q, causal=True)
        out["attention_causal_rel_err"] = rel_err(
            np.asarray(jax.jit(lambda v, q: mha_jnp.apply(v, q, q, causal=True))(variables, q)),
            np.asarray(jax.jit(lambda v, q: mha_pl.apply(v, q, q, causal=True))(variables, q)),
        )

    tols = {
        # bf16 comparisons: quantization floor
        **{f"fused_trio_c{c}_rel_err": 5e-2 for c in (128, 64, 32, 16)},
        "e2e_synth_rel_err": 5e-2,  # bf16 end-to-end decode, both paths
        "attention_windowed_rel_err": 5e-3,  # fp32-highest comparisons
        "attention_causal_rel_err": 5e-3,
    }
    out["tolerances"] = tols
    out["ok"] = all(out[k] < t for k, t in tols.items())
    return out


def bench_mel_l1(hps, t_frames: int = 861) -> float:
    """Full-size mel-L1 north star (BASELINE.md: < 1e-3 vs torch).

    Builds the reference SynthesizerTrn at full size (random init), converts
    its weights, runs both deterministically (fp32, no sampled noise) on the
    same inputs, and compares the mel spectrograms of the two waveforms.
    """
    import sys

    sys.path.insert(0, "tests")
    from torch_ref import setup_reference_imports, state_dict_numpy

    setup_reference_imports()
    import models as ref_models
    import torch
    from test_models import no_torch_randomness

    from sovits_tpu.convert import from_torch as ft
    from sovits_tpu.dsp import stft as dsp_stft
    from sovits_tpu.models import Synthesizer, factory

    torch.manual_seed(0)
    m, d = hps.model, hps.data
    ref = ref_models.SynthesizerTrn(
        spec_channels=d.filter_length // 2 + 1,
        segment_size=hps.train.segment_size // d.hop_length,
        inter_channels=m.inter_channels,
        hidden_channels=m.hidden_channels,
        filter_channels=m.filter_channels,
        n_heads=m.n_heads,
        n_layers=m.n_layers,
        kernel_size=m.kernel_size,
        p_dropout=m.p_dropout,
        resblock=m.resblock,
        resblock_kernel_sizes=list(m.resblock_kernel_sizes),
        resblock_dilation_sizes=list(map(list, m.resblock_dilation_sizes)),
        upsample_rates=list(m.upsample_rates),
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=list(m.upsample_kernel_sizes),
        gin_channels=m.gin_channels,
        ssl_dim=m.ssl_dim,
        n_speakers=m.n_speakers,
        sampling_rate=d.sampling_rate,
        vol_embedding=bool(m.vol_embedding),
        vocoder_name=m.vocoder_name or "nsf-hifigan",
        use_depthwise_conv=bool(m.use_depthwise_conv),
        use_automatic_f0_prediction=bool(m.use_automatic_f0_prediction),
        flow_share_parameter=bool(m.flow_share_parameter),
        n_flow_layer=m.n_flow_layer or 4,
    )
    ref.eval()

    rng = np.random.default_rng(7)
    c = rng.standard_normal((1, t_frames, m.ssl_dim)).astype(np.float32) * 0.3
    f0 = rng.uniform(100, 300, (1, t_frames)).astype(np.float32)
    uv = np.ones((1, t_frames), np.float32)

    with no_torch_randomness(), torch.no_grad():
        ref_wav, _ = ref.infer(
            torch.from_numpy(c.transpose(0, 2, 1)),
            torch.from_numpy(f0),
            torch.from_numpy(uv),
            g=torch.tensor([0]),
            noice_scale=0.0,
        )
    ref_wav = ref_wav.numpy()[0, 0]

    syn = factory.build_synthesizer(hps, dtype=jnp.float32)
    params = jax.tree.map(
        jnp.asarray,
        ft.synthesizer(
            state_dict_numpy(ref),
            n_flows=m.n_flow_layer or 4,
            use_automatic_f0_prediction=bool(m.use_automatic_f0_prediction),
            vol_embedding=bool(m.vol_embedding),
            n_upsamples=len(m.upsample_rates),
            n_resblock_kernels=len(m.resblock_kernel_sizes),
        ),
    )
    # parity measurement, not perf: force fp32 MXU passes (TPU's default
    # matmul precision is bf16x3/bf16, which inflates mel-L1 ~1e-5 -> ~4e-2).
    # Jitted with params as an ARG: eager apply dispatches every op through
    # the tunnel's ~28 ms floor, a params closure bakes 270 MB into the HLO.
    with jax.default_matmul_precision("highest"):
        got_wav, _ = jax.jit(
            lambda p, c, f0, uv, s: syn.apply(
                {"params": p}, c, f0, uv, s, sample_noise=False,
                noise_scale=0.0, method=Synthesizer.infer,
            )
        )(params, jnp.asarray(c), jnp.asarray(f0), jnp.asarray(uv),
          jnp.zeros((1,), jnp.int32))
    got_wav = np.asarray(got_wav)[0, :, 0]

    n = min(len(ref_wav), len(got_wav))
    mel_ref = np.asarray(dsp_stft.mel_spectrogram(
        jnp.asarray(ref_wav[None, :n]), d.filter_length, d.n_mel_channels,
        d.sampling_rate, d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax,
    ))
    mel_got = np.asarray(dsp_stft.mel_spectrogram(
        jnp.asarray(got_wav[None, :n]), d.filter_length, d.n_mel_channels,
        d.sampling_rate, d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax,
    ))
    return float(np.abs(mel_ref - mel_got).mean())


def bench_train_step(hps, iters: int = 60) -> float:
    """Full-size fused GAN train step rate on one chip (bf16 compute),
    batch 6 x 512 frames (max_speclen, config_template.json:23). One
    device-side scan of `iters` steps, ONE compile (the r3 long+short
    double compile was the bench's biggest cost and got the driver run
    killed); at 60 steps/call the tunnel's ~28 ms dispatch floor is a
    <1.5% pessimistic bias, noted rather than subtracted."""
    from sovits_tpu import train as strain
    from sovits_tpu.models import factory
    from sovits_tpu.parallel import make_mesh, replicate_tree, shard_batch

    hps.data["pad_to_frames"] = 512
    hps.train["batch_size"] = 6
    mesh = make_mesh(n_data=1, n_model=1)

    # folded-XLA train tail, as train/trainer.py: the Pallas trio's
    # remat-backward custom VJP measured SLOWER (26.6 vs 28.4 steps/s, r4)
    syn = factory.build_synthesizer(hps, dtype=jnp.bfloat16)
    disc = factory.build_discriminator(hps, dtype=jnp.bfloat16)
    # jitted init: params born on-device (no eager tunnel dispatches, no
    # host->TPU bulk upload)
    g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
    d_params = factory.init_discriminator_params(
        disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
    )
    g_tx = strain.make_optimizer(hps)
    d_tx = strain.make_optimizer(hps)
    state = replicate_tree(
        strain.create_train_state(g_params, d_params, g_tx, d_tx), mesh
    )
    raw_step = strain.make_train_step(syn, disc, g_tx, d_tx, hps, jit_compile=False)

    rng = np.random.default_rng(0)
    b, t, hop = 6, 512, hps.data.hop_length
    batch = shard_batch(
        {
            "c": jnp.asarray(rng.standard_normal((b, t, hps.model.ssl_dim)), jnp.float32),
            "f0": jnp.asarray(rng.uniform(80, 400, (b, t)), jnp.float32),
            "uv": jnp.ones((b, t), jnp.float32),
            "spec": jnp.asarray(
                np.abs(rng.standard_normal((b, t, hps.data.filter_length // 2 + 1))),
                jnp.float32,
            ),
            "wav": jnp.asarray(rng.standard_normal((b, t * hop, 1)) * 0.1, jnp.float32),
            "spk": jnp.zeros((b,), jnp.int32),
            "lengths": jnp.full((b,), t, jnp.int32),
            "volume": jnp.abs(jnp.asarray(rng.standard_normal((b, t)), jnp.float32)) * 0.05,
        },
        mesh,
    )

    # device-side loop: N steps per host round trip (tunnel-latency immune);
    # batch is an ARG so its ~30 MB isn't baked into the tunnel-uploaded HLO
    def loop(state, batch):
        def body(st, i):
            st, metrics = raw_step(
                st, batch,
                jax.random.fold_in(jax.random.key(0, impl="rbg"), i),
            )
            return st, metrics["loss/g/total"]

        st, losses = jax.lax.scan(body, state, jnp.arange(iters))
        return st, losses.sum()

    loop_jit = jax.jit(loop, donate_argnums=(0,))
    state, warm = loop_jit(state, batch)  # compile + warm
    np.asarray(warm)
    t0 = time.perf_counter()
    state, out = loop_jit(state, batch)
    np.asarray(out)
    return iters / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
