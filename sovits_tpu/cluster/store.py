"""Cluster/retrieval model storage + inference-time blending.

File format: one .npz per model holding per-speaker arrays —
``centers_<spk>`` for k-means models, ``features_<spk>`` for retrieval
stores. Loading the reference's kmeans_10000.pt (a torch dict of sklearn
attributes, cluster/train_cluster.py:60-68) is also supported.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from .kmeans import kmeans_fit, nearest_centers


class ClusterModel:
    def __init__(self, per_speaker: dict[str, np.ndarray], retrieval: bool):
        self.per_speaker = per_speaker  # spk name/id -> centers or feature bank
        self.retrieval = retrieval

    def _bank(self, speaker, spk2id: dict):
        key = str(speaker)
        if key in self.per_speaker:
            return self.per_speaker[key]
        if speaker in spk2id and str(spk2id[speaker]) in self.per_speaker:
            return self.per_speaker[str(spk2id[speaker])]
        raise KeyError(f"speaker {speaker!r} not in cluster model")

    def blend(self, units: np.ndarray, speaker, ratio: float, spk2id: dict,
              retrieval: bool | None = None) -> np.ndarray:
        """units [T, H] -> blended units (infer_tool.py:227-251)."""
        bank = self._bank(speaker, spk2id)
        use_retrieval = self.retrieval if retrieval is None else retrieval
        if use_retrieval:
            replaced = blend_retrieval(units, bank)
        else:
            replaced = nearest_centers(units, bank)
        return ratio * replaced + (1.0 - ratio) * units


def blend_retrieval(units: np.ndarray, bank: np.ndarray, k: int = 8) -> np.ndarray:
    """k-NN retrieval with inverse-square-distance weights
    (infer_tool.py:241-247: weight = (1/score)^2, softmax-normalized)."""
    u = jnp.asarray(units, jnp.float32)
    b = jnp.asarray(bank, jnp.float32)
    d = (
        jnp.sum(u * u, axis=1, keepdims=True)
        + jnp.sum(b * b, axis=1)[None, :]
        - 2.0 * (u @ b.T)
    )
    neg_d, idx = jax.lax.top_k(-d, k)  # [T, k]
    score = jnp.maximum(-neg_d, 1e-8)
    weight = 1.0 / jnp.square(score)
    weight = weight / jnp.sum(weight, axis=1, keepdims=True)
    gathered = b[idx]  # [T, k, H]
    return np.asarray(jnp.sum(gathered * weight[..., None], axis=1))


def train_cluster_model(
    features_per_speaker: dict[str, np.ndarray],
    n_clusters: int = 10000,
    retrieval: bool = False,
) -> ClusterModel:
    """Train per-speaker k-means (or build retrieval banks).

    Mirrors cluster/train_cluster.py: 10k centers per speaker; the retrieval
    variant stores (optionally k-means-compacted) raw features like
    utils.train_index (utils.py:479-494 compacts >2e5 rows to 10k)."""
    per = {}
    for spk, feats in features_per_speaker.items():
        feats = np.asarray(feats, np.float32)
        if retrieval:
            if feats.shape[0] > 2e5:
                feats = kmeans_fit(feats, 10000)
            per[str(spk)] = feats
        else:
            per[str(spk)] = kmeans_fit(feats, n_clusters)
    return ClusterModel(per, retrieval)


def save_cluster_model(model: ClusterModel, path: str | Path) -> None:
    arrays = {f"bank_{k}": v for k, v in model.per_speaker.items()}
    np.savez(path, retrieval=np.asarray(model.retrieval), **arrays)


def load_cluster_model(path: str | Path, feature_retrieval: bool = False) -> ClusterModel:
    path = str(path)
    if path.endswith(".npz"):
        data = np.load(path, allow_pickle=False)
        per = {
            k.removeprefix("bank_"): data[k] for k in data.files if k.startswith("bank_")
        }
        return ClusterModel(per, bool(data["retrieval"]))
    # reference kmeans_10000.pt: torch dict {spk: {cluster_centers_: ...}}
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    per = {}
    for spk, attrs in ckpt.items():
        centers = attrs["cluster_centers_"]
        if hasattr(centers, "numpy"):
            centers = centers.numpy()
        per[str(spk)] = np.asarray(centers, np.float32)
    return ClusterModel(per, feature_retrieval)


def train_retrieval_index(features_per_speaker: dict[str, np.ndarray]) -> ClusterModel:
    """utils.train_index equivalent (utils.py:461-511), JAX brute-force."""
    return train_cluster_model(features_per_speaker, retrieval=True)
