"""End-to-end trainer test: synthetic dataset -> train -> checkpoint -> resume."""

import numpy as np

import jax

from tests.tiny import make_synthetic_dataset, tiny_hps

from sovits_tpu.train import checkpoint as ckpt_lib
from sovits_tpu.train.data import FeatureDataset, batch_iterator
from sovits_tpu.train.trainer import epoch_lr, train


def test_dataset_and_iterator(tmp_path):
    hps = tiny_hps()
    make_synthetic_dataset(tmp_path, hps)
    ds = FeatureDataset(hps.data.training_files, hps)
    assert len(ds) == 5
    ex = ds.padded_example(0, np.random.default_rng(0))
    t = hps.data.pad_to_frames
    assert ex["c"].shape == (t, hps.model.ssl_dim)
    assert ex["spec"].shape == (t, hps.data.filter_length // 2 + 1)
    assert ex["wav"].shape == (t * hps.data.hop_length, 1)
    assert ex["lengths"] <= t

    it = batch_iterator(ds, 8, seed=0)
    batch = next(it)
    assert batch["c"].shape == (8, t, hps.model.ssl_dim)
    assert batch["spk"].shape == (8,)


def test_epoch_lr_schedule():
    hps = tiny_hps()
    base = hps.train.learning_rate
    assert epoch_lr(hps, 1) == base
    assert np.isclose(epoch_lr(hps, 2), base * hps.train.lr_decay)
    hps.train["warmup_epochs"] = 4
    assert np.isclose(epoch_lr(hps, 2), base / 4 * 2)


def test_train_checkpoint_resume(tmp_path):
    hps = tiny_hps(**{"train.eval_interval": 2, "train.log_interval": 1})
    make_synthetic_dataset(tmp_path / "data", hps)
    model_dir = tmp_path / "model"

    state = train(hps, model_dir, max_steps=2)
    assert int(state.step) == 2
    assert (model_dir / "ckpt").exists()
    assert (model_dir / "metrics.jsonl").exists()

    # resume: next train() call restores from step 2 and continues
    state2 = train(hps, model_dir, max_steps=4)
    assert int(state2.step) == 4
    g1 = jax.tree.leaves(state.g_params)[0]
    g2 = jax.tree.leaves(state2.g_params)[0]
    assert not np.allclose(np.asarray(g1), np.asarray(g2))


def test_merge_pretrained_shape_tolerance():
    init = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4), "d": np.zeros(5)}}
    loaded = {"a": np.ones((2, 3)), "b": {"c": np.ones(9)}}  # d missing, c mismatched
    merged = ckpt_lib.merge_pretrained(init, loaded)
    assert np.all(np.asarray(merged["a"]) == 1)
    assert np.all(np.asarray(merged["b"]["c"]) == 0)
    assert np.all(np.asarray(merged["b"]["d"]) == 0)
