"""Train per-speaker k-means / retrieval banks (cluster/train_cluster.py +
train_index.py equivalents)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..cluster import train_cluster_model
from ..cluster.store import save_cluster_model


def load_speaker_features(dataset: Path) -> dict[str, np.ndarray]:
    feats = {}
    for spk_dir in sorted(p for p in dataset.iterdir() if p.is_dir()):
        arrays = []
        for f in sorted(spk_dir.glob("*.soft.npy")):
            units = np.load(f)  # [H, T]
            arrays.append(units.T)
        if arrays:
            feats[spk_dir.name] = np.concatenate(arrays, axis=0)
    return feats


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=Path, default=Path("./dataset/44k"))
    parser.add_argument("--output", type=Path, default=Path("logs/44k/kmeans_10000.npz"))
    parser.add_argument("--n_clusters", type=int, default=10000)
    parser.add_argument(
        "--retrieval", action="store_true",
        help="store feature banks for RVC-style retrieval instead of k-means centers",
    )
    args = parser.parse_args(argv)

    feats = load_speaker_features(args.dataset)
    if not feats:
        raise SystemExit("no .soft.npy features found; run preprocess_features first")
    model = train_cluster_model(feats, n_clusters=args.n_clusters, retrieval=args.retrieval)
    args.output.parent.mkdir(parents=True, exist_ok=True)
    save_cluster_model(model, args.output)
    print(f"wrote {args.output} ({len(feats)} speakers)")


if __name__ == "__main__":
    main()
