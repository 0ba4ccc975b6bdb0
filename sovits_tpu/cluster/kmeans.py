"""Batched k-means in JAX (cluster/kmeans.py equivalent, TPU-friendly).

kmeans++ initialization + Lloyd iterations; every distance computation is a
single [N, D] x [D, K] matmul (MXU). The reference trains 10k centers per
speaker on sklearn/torch (cluster/train_cluster.py:34-56).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _sq_dists(x: jax.Array, centers: jax.Array) -> jax.Array:
    """Squared euclidean distances [N, K] via the expanded-norm matmul."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=1)
    return x2 + c2[None, :] - 2.0 * (x @ centers.T)


def kmeans_plus_plus_init(rng: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """kmeans++ seeding (cluster/kmeans.py:10-50 behavior)."""
    n = x.shape[0]
    rngs = jax.random.split(rng, k)
    first = jax.random.randint(rngs[0], (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])
    min_d0 = _sq_dists(x, centers0[:1])[:, 0]

    def body(carry, inp):
        centers, min_d, i = carry
        r = inp
        probs = jnp.maximum(min_d, 0.0)
        probs = probs / (jnp.sum(probs) + 1e-12)
        idx = jax.random.choice(r, n, p=probs)
        centers = centers.at[i].set(x[idx])
        d_new = jnp.sum((x - x[idx]) ** 2, axis=1)
        return (centers, jnp.minimum(min_d, d_new), i + 1), None

    (centers, _, _), _ = jax.lax.scan(body, (centers0, min_d0, 1), rngs[1:])
    return centers


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_jit(rng, x, k: int, iters: int):
    centers = kmeans_plus_plus_init(rng, x, k)

    def step(centers, _):
        assign = jnp.argmin(_sq_dists(x, centers), axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [N, K]
        sums = one_hot.T @ x  # [K, D]
        counts = jnp.sum(one_hot, axis=0)[:, None]
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def kmeans_fit(features: np.ndarray, n_clusters: int = 10000, iters: int = 50, seed: int = 0) -> np.ndarray:
    """Fit k-means; returns centers [K, D]. K is capped at N."""
    x = jnp.asarray(features, jnp.float32)
    k = min(n_clusters, x.shape[0])
    centers = _kmeans_jit(jax.random.PRNGKey(seed), x, k, iters)
    return np.asarray(centers)


def kmeans_predict(features: np.ndarray, centers: np.ndarray) -> np.ndarray:
    d = _sq_dists(jnp.asarray(features, jnp.float32), jnp.asarray(centers, jnp.float32))
    return np.asarray(jnp.argmin(d, axis=1))


def nearest_centers(features: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Replace each feature by its nearest center (cluster/__init__.py:22-28)."""
    idx = kmeans_predict(features, centers)
    return np.asarray(centers)[idx]
