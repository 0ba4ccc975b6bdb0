"""Timbre-leakage mitigation: k-means clustering + feature retrieval.

Equivalents of the reference's cluster/ package and RVC-style retrieval
(SURVEY.md section 2.7):
- per-speaker k-means over content units (cluster/train_cluster.py:16-86,
  kmeans++ GPU variant cluster/kmeans.py) -> JAX k-means (batched distance
  matmuls on the MXU),
- nearest-center replacement at inference (cluster/__init__.py:5-28),
- feature retrieval: k=8 nearest stored features, inverse-square-distance
  softmax blend (utils.py:461-511 + infer_tool.py:235-247) — brute-force
  top-k on-device instead of a faiss IVF index (10k x 768 fits comfortably;
  jax.lax.top_k over one matmul).
"""

from .kmeans import kmeans_fit, kmeans_predict, nearest_centers
from .store import (
    ClusterModel,
    blend_retrieval,
    load_cluster_model,
    train_cluster_model,
    train_retrieval_index,
)
