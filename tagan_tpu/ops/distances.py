"""Vectorized pairwise distance / similarity metrics.

The reference computes non-dot-product metrics with Python ``for h / for i``
loops over heads and query positions
(`/root/reference/src/tagan/layers/geometric_attention.py:356-469`) —
O(heads·N) dispatch overhead. Here every metric is one batched broadcast
expression over ``q [..., H, N, D]`` and ``k [..., H, N, D]``, producing
score matrices ``[..., H, N, N]`` that XLA tiles onto the MXU/VPU.

Numerics match ``DistanceMetric`` (geometric_attention.py:15-225):
  euclidean          sqrt(sum((x-y)^2) + 1e-8)             (:24-35)
  squared_euclidean  sum((x-y)^2)                          (:38-49)
  manhattan          sum(|x-y|)                            (:52-63)
  cosine_similarity  eps-guarded, clamped to [-1, 1]       (:66-90)
  cosine_distance    1 - cosine_similarity                 (:93-104)
  dot_product        sum(x*y)                              (:107-118)
  scaled_dot_product sum(x*y)/sqrt(d)                      (:121-133)
  mahalanobis        sqrt(diff @ cov_inv · diff + 1e-8)    (:136-161)
  gaussian_kernel    exp(-sq/(2 sigma^2))                  (:164-177)
  rbf_kernel         exp(-gamma * sq)                      (:180-193)

Distance-type metrics are negated into similarities by the attention
layer (geometric_attention.py:396-401), mirrored in `pairwise_scores`.

Conventions: pairwise ``diff[i, j] = q[i] - k[j]``; per-head parameters
(sigma/gamma [H], cov_factors [H, R, D]) broadcast over the head axis.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

DISTANCE_LIKE = ("euclidean", "squared_euclidean", "manhattan",
                 "cosine_distance", "mahalanobis")
SIMILARITY_LIKE = ("cosine_similarity", "dot_product", "scaled_dot_product",
                   "gaussian_kernel", "rbf_kernel")
ALL_METRICS = DISTANCE_LIKE + SIMILARITY_LIKE


def _sq_dists(q: jax.Array, k: jax.Array) -> jax.Array:
    """sum((q_i - k_j)^2) via explicit broadcast: [..., N, N].

    Uses the subtract-then-square form (not ||q||²+||k||²-2qk) to match
    reference numerics bit-for-bit at fp32.
    """
    diff = q[..., :, None, :] - k[..., None, :, :]
    return jnp.sum(jnp.square(diff), axis=-1)


def pairwise_euclidean(q, k):
    return jnp.sqrt(_sq_dists(q, k) + 1e-8)


def pairwise_squared_euclidean(q, k):
    return _sq_dists(q, k)


def pairwise_manhattan(q, k):
    diff = q[..., :, None, :] - k[..., None, :, :]
    return jnp.sum(jnp.abs(diff), axis=-1)


def pairwise_cosine_similarity(q, k):
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    kn = jnp.linalg.norm(k, axis=-1, keepdims=True)
    qn = jnp.where(qn == 0, 1e-8, qn)
    kn = jnp.where(kn == 0, 1e-8, kn)
    dots = jnp.einsum("...id,...jd->...ij", q, k)
    sim = dots / (qn * jnp.swapaxes(kn, -1, -2))
    return jnp.clip(sim, -1.0, 1.0)


def pairwise_cosine_distance(q, k):
    return 1.0 - pairwise_cosine_similarity(q, k)


def pairwise_dot(q, k):
    return jnp.einsum("...id,...jd->...ij", q, k)


def pairwise_scaled_dot(q, k):
    return pairwise_dot(q, k) / math.sqrt(q.shape[-1])


def pairwise_mahalanobis(q, k, cov_inv: Optional[jax.Array] = None):
    """cov_inv: [D, D] or per-head [..., D, D]; None = identity
    (geometric_attention.py:451-453)."""
    diff = q[..., :, None, :] - k[..., None, :, :]        # [..., N, N, D]
    if cov_inv is None:
        m = jnp.sum(jnp.square(diff), axis=-1)
    else:
        md = jnp.einsum("...ijd,...de->...ije", diff, cov_inv)
        m = jnp.sum(md * diff, axis=-1)
    return jnp.sqrt(m + 1e-8)


def pairwise_gaussian_kernel(q, k, sigma=1.0):
    sq = _sq_dists(q, k)
    sigma = jnp.asarray(sigma)
    if sigma.ndim > 0:  # per-head [H] -> broadcast over [.., H, N, N]
        sigma = sigma[..., :, None, None]
    return jnp.exp(-sq / (2.0 * sigma ** 2))


def pairwise_rbf_kernel(q, k, gamma=1.0):
    sq = _sq_dists(q, k)
    gamma = jnp.asarray(gamma)
    if gamma.ndim > 0:
        gamma = gamma[..., :, None, None]
    return jnp.exp(-gamma * sq)


def pairwise_scores(
    metric: str,
    q: jax.Array,
    k: jax.Array,
    *,
    sigma: Optional[jax.Array] = None,
    gamma: Optional[jax.Array] = None,
    cov_inv: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention *scores* (similarities) for any metric; distance metrics
    are negated exactly as the reference does before softmax
    (geometric_attention.py:396-401, 465-466)."""
    if metric == "scaled_dot_product":
        return pairwise_scaled_dot(q, k)
    if metric == "dot_product":
        return pairwise_dot(q, k)
    if metric == "cosine_similarity":
        return pairwise_cosine_similarity(q, k)
    if metric == "euclidean":
        return -pairwise_euclidean(q, k)
    if metric == "squared_euclidean":
        return -pairwise_squared_euclidean(q, k)
    if metric == "manhattan":
        return -pairwise_manhattan(q, k)
    if metric == "cosine_distance":
        return -pairwise_cosine_distance(q, k)
    if metric == "gaussian_kernel":
        return pairwise_gaussian_kernel(q, k, 1.0 if sigma is None else sigma)
    if metric == "rbf_kernel":
        return pairwise_rbf_kernel(q, k, 1.0 if gamma is None else gamma)
    if metric == "mahalanobis":
        return -pairwise_mahalanobis(q, k, cov_inv)
    raise ValueError(f"Unknown distance metric: {metric}")


# -- edgewise variants (for the CSR/SDDMM path): scores per (q_i, k_j) pair
# gathered by edge, identical math on [..., E, D] gathers. -----------------

def edgewise_scores(
    metric: str,
    q_e: jax.Array,     # [..., E, D] query features gathered per edge
    k_e: jax.Array,     # [..., E, D] key features gathered per edge
    *,
    sigma: Optional[jax.Array] = None,
    gamma: Optional[jax.Array] = None,
    cov_inv: Optional[jax.Array] = None,
) -> jax.Array:
    d = q_e.shape[-1]
    if metric == "scaled_dot_product":
        return jnp.sum(q_e * k_e, -1) / math.sqrt(d)
    if metric == "dot_product":
        return jnp.sum(q_e * k_e, -1)
    if metric == "cosine_similarity":
        qn = jnp.linalg.norm(q_e, axis=-1)
        kn = jnp.linalg.norm(k_e, axis=-1)
        qn = jnp.where(qn == 0, 1e-8, qn)
        kn = jnp.where(kn == 0, 1e-8, kn)
        return jnp.clip(jnp.sum(q_e * k_e, -1) / (qn * kn), -1.0, 1.0)
    diff = q_e - k_e
    if metric == "euclidean":
        return -jnp.sqrt(jnp.sum(jnp.square(diff), -1) + 1e-8)
    if metric == "squared_euclidean":
        return -jnp.sum(jnp.square(diff), -1)
    if metric == "manhattan":
        return -jnp.sum(jnp.abs(diff), -1)
    if metric == "cosine_distance":
        qn = jnp.linalg.norm(q_e, axis=-1)
        kn = jnp.linalg.norm(k_e, axis=-1)
        qn = jnp.where(qn == 0, 1e-8, qn)
        kn = jnp.where(kn == 0, 1e-8, kn)
        sim = jnp.clip(jnp.sum(q_e * k_e, -1) / (qn * kn), -1.0, 1.0)
        return -(1.0 - sim)
    if metric == "gaussian_kernel":
        s = 1.0 if sigma is None else sigma
        s = jnp.asarray(s)
        if s.ndim > 0:
            s = s[..., :, None]
        return jnp.exp(-jnp.sum(jnp.square(diff), -1) / (2.0 * s ** 2))
    if metric == "rbf_kernel":
        g = 1.0 if gamma is None else gamma
        g = jnp.asarray(g)
        if g.ndim > 0:
            g = g[..., :, None]
        return jnp.exp(-g * jnp.sum(jnp.square(diff), -1))
    if metric == "mahalanobis":
        if cov_inv is None:
            m = jnp.sum(jnp.square(diff), -1)
        else:
            m = jnp.sum(
                jnp.einsum("...ed,...df->...ef", diff, cov_inv) * diff, -1)
        return -jnp.sqrt(m + 1e-8)
    raise ValueError(f"Unknown distance metric: {metric}")
