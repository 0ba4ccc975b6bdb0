"""k-means + retrieval tests."""

import numpy as np

from sovits_tpu.cluster import (
    blend_retrieval,
    kmeans_fit,
    kmeans_predict,
    load_cluster_model,
    train_cluster_model,
)
from sovits_tpu.cluster.store import save_cluster_model


def _blobs(k=4, n_per=50, d=8, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)) * 10
    pts = np.concatenate([c + rng.standard_normal((n_per, d)) * 0.3 for c in centers])
    labels = np.repeat(np.arange(k), n_per)
    return pts.astype(np.float32), labels, centers


def test_kmeans_recovers_blobs():
    pts, labels, true_centers = _blobs()
    centers = kmeans_fit(pts, n_clusters=4, iters=25)
    pred = kmeans_predict(pts, centers)
    # cluster purity: every true blob maps to exactly one predicted cluster
    for blob in range(4):
        vals, counts = np.unique(pred[labels == blob], return_counts=True)
        assert counts.max() / counts.sum() > 0.98


def test_retrieval_blend_identity_for_stored_features():
    pts, _, _ = _blobs()
    out = blend_retrieval(pts[:10], pts, k=8)
    # nearest stored feature of a stored feature is itself (distance ~0 gets
    # dominant inverse-square weight)
    np.testing.assert_allclose(out, pts[:10], atol=1e-2)


def test_cluster_model_roundtrip(tmp_path):
    pts, _, _ = _blobs()
    model = train_cluster_model({"spk0": pts, "1": pts[:80]}, n_clusters=8)
    save_cluster_model(model, tmp_path / "clusters.npz")
    loaded = load_cluster_model(str(tmp_path / "clusters.npz"))
    assert set(loaded.per_speaker) == {"spk0", "1"}

    units = pts[:16]
    blended = loaded.blend(units, "spk0", 0.5, {})
    assert blended.shape == units.shape
    # ratio=0 returns the input
    np.testing.assert_allclose(loaded.blend(units, "spk0", 0.0, {}), units)


def test_reference_torch_cluster_format(tmp_path):
    import torch

    pts, _, _ = _blobs()
    torch.save(
        {"spk0": {"cluster_centers_": torch.from_numpy(pts[:8])}},
        tmp_path / "kmeans_10000.pt",
    )
    model = load_cluster_model(str(tmp_path / "kmeans_10000.pt"))
    assert model.per_speaker["spk0"].shape == (8, 8)
