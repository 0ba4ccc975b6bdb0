"""Export roundtrip + profiling utility tests."""

import numpy as np

import jax
import jax.numpy as jnp

from sovits_tpu.utils import StageTimer, annotate


def test_export_roundtrip_small():
    from jax import export as jexport

    def fn(x):
        return jnp.sin(x) * 2.0

    exported = jexport.export(jax.jit(fn))(jnp.zeros((4,), jnp.float32))
    data = exported.serialize()
    restored = jexport.deserialize(data)
    x = jnp.asarray(np.arange(4, dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(restored.call(x)), np.asarray(fn(x)), rtol=1e-6
    )


def test_exported_synthesizer(tmp_path, svc):
    from sovits_tpu.cli.export import export_synthesizer, load_exported

    out = tmp_path / "model.stablehlo"
    ckpt, cfg = svc._test_paths
    export_synthesizer(ckpt, cfg, str(out), t_frames=32)
    assert out.exists() and out.with_suffix(".json").exists()
    call = load_exported(str(out))
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.standard_normal((1, 32, 24)), jnp.float32) * 0.1,
        jnp.full((1, 32), 220.0, jnp.float32),
        jnp.ones((1, 32), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 32), jnp.float32),
    )
    wav = np.asarray(call(*args))
    assert np.isfinite(wav).all()
    # round trip must reproduce the live model exactly (deterministic path)
    from sovits_tpu.models import Synthesizer

    direct, _ = svc.model.apply(
        {"params": svc.params}, *args[:4], sample_noise=False,
        method=Synthesizer.infer,
    )
    np.testing.assert_allclose(wav, np.asarray(direct), rtol=1e-5, atol=1e-6)


def test_stage_timer():
    timer = StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    with annotate("region"):
        x = jnp.ones((4,)) * 2
    s = timer.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0
    assert float(x.sum()) == 8.0
