"""Shared fixtures: a tiny Svc instance backed by an untrained checkpoint."""

import numpy as np
import pytest

import jax

from tests.tiny import make_synthetic_dataset, tiny_hps

from sovits_tpu import config as scfg
from sovits_tpu.models import factory
from sovits_tpu.train import checkpoint as ckpt_lib
from sovits_tpu.train.step import create_train_state, make_optimizer


class FakeEncoder:
    name = "fake"
    hidden_dim = 24

    def encode(self, wav16k):
        n_frames = max((len(wav16k) - 400) // 320 + 1, 1)
        rng = np.random.default_rng(42)
        return rng.standard_normal((n_frames, 24)).astype(np.float32) * 0.1


@pytest.fixture(scope="session")
def svc(tmp_path_factory):
    from sovits_tpu.infer.svc import Svc
    from sovits_tpu.models import MultiPeriodDiscriminator

    tmp = tmp_path_factory.mktemp("svc_shared")
    hps = tiny_hps()
    make_synthetic_dataset(tmp / "data", hps, n_per_spk=1)
    scfg.save_config(hps, tmp / "config.json")

    syn = factory.build_synthesizer(hps)
    g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
    d_params = factory.init_discriminator_params(
        MultiPeriodDiscriminator(), jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
    )
    tx = make_optimizer(hps)
    state = create_train_state(g_params, d_params, tx, tx)
    mgr = ckpt_lib.CheckpointManager(tmp / "ckpt", keep=1)
    mgr.save(0, state, extra={"epoch": 0})
    mgr.close()

    svc_obj = Svc(str(tmp / "ckpt"), str(tmp / "config.json"), encoder=FakeEncoder())
    svc_obj._test_paths = (str(tmp / "ckpt"), str(tmp / "config.json"))
    return svc_obj
