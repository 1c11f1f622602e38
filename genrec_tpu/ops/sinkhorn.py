"""Sinkhorn-Knopp balanced assignment and on-device k-means.

TPU-native replacements for the reference's host-side pieces:
- `RQ-VAE/models/layers.py:85-108` Sinkhorn (torch double precision) →
  fixed-iteration `lax.fori_loop` in float32 with clamped denominators.
- `RQ-VAE/models/layers.py:69-82` sklearn KMeans CPU round-trip →
  jit'd Lloyd iterations with k-means++-style farthest-point init,
  entirely on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def center_distance(distances: jnp.ndarray) -> jnp.ndarray:
    """Scale distances to ~[-1, 1] before Sinkhorn (RQ-VAE/models/vq.py:55-62)."""
    max_d = jnp.max(distances)
    min_d = jnp.min(distances)
    middle = (max_d + min_d) / 2
    amplitude = max_d - middle + 1e-5
    return (distances - middle) / amplitude


def sinkhorn(distances: jnp.ndarray, epsilon: float, iterations: int) -> jnp.ndarray:
    """Balanced assignment matrix Q from a (B, K) distance matrix.

    Same math as `RQ-VAE/models/layers.py:85-108` (exp(-d/eps), global
    normalization, then alternating row (per-sample, /B) and column
    (per-prototype, /K) renormalizations; returned scaled by B so rows are
    distributions) — but computed in LOG domain. The reference casts to
    float64 first (`vq.py:80`) because exp(-d/eps) spans e^±100 at its
    eps=0.01; in float32 that overflows to inf/underflows to 0 and the
    transport degenerates (near-identical rows then never split, which
    silently disables the collision-repair loop). logsumexp keeps the full
    ±100 range exactly in f32 — the TPU-native equivalent of its f64 cast.
    """
    B, K = distances.shape
    logq = -distances / epsilon
    logq = logq - jax.scipy.special.logsumexp(logq)  # global normalization

    log_b = jnp.log(jnp.asarray(B, distances.dtype))
    log_k = jnp.log(jnp.asarray(K, distances.dtype))

    def body(_, logq):
        logq = logq - jax.scipy.special.logsumexp(logq, axis=1,
                                                  keepdims=True) - log_b
        logq = logq - jax.scipy.special.logsumexp(logq, axis=0,
                                                  keepdims=True) - log_k
        return logq

    logq = jax.lax.fori_loop(0, iterations, body, logq)
    return jnp.exp(logq + log_b)


def _pairwise_sq_dists(x: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """(N, D) × (K, D) → (N, K) squared L2 via the MXU-friendly expansion."""
    return (jnp.sum(x * x, axis=1, keepdims=True)
            + jnp.sum(centers * centers, axis=1)[None, :]
            - 2.0 * jnp.dot(x, centers.T, preferred_element_type=jnp.float32))


def kmeans(key: jax.Array, x: jnp.ndarray, num_clusters: int,
           num_iters: int = 10) -> jnp.ndarray:
    """Lloyd k-means on device; returns (num_clusters, D) centers.

    Init: first center uniform, then greedy farthest-point (a deterministic
    k-means++ variant that avoids data-dependent control flow).
    """
    n, d = x.shape
    x = x.astype(jnp.float32)

    first = jax.random.randint(key, (), 0, n)
    centers0 = jnp.zeros((num_clusters, d), jnp.float32).at[0].set(x[first])

    def init_body(i, centers):
        dists = _pairwise_sq_dists(x, centers)
        ar = jax.lax.broadcasted_iota(jnp.int32, (1, num_clusters), 1)
        dists = jnp.where(ar < i, dists, jnp.inf)
        mind = jnp.min(dists, axis=1)
        nxt = jnp.argmax(mind)
        return centers.at[i].set(x[nxt])

    centers = jax.lax.fori_loop(1, num_clusters, init_body, centers0)

    def lloyd(_, centers):
        dists = _pairwise_sq_dists(x, centers)
        assign = jnp.argmin(dists, axis=1)
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=jnp.float32)  # (N, K)
        counts = jnp.sum(onehot, axis=0)[:, None]
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
        new = sums / jnp.maximum(counts, 1.0)
        return jnp.where(counts > 0, new, centers)

    return jax.lax.fori_loop(0, num_iters, lloyd, centers)
