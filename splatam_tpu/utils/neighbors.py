"""K-nearest-neighbor search in JAX.

Replaces the reference's FAISS helper (`utils/neighbor_search.py:6-36`,
SURVEY.md §2.4): brute-force L2 top-k evaluated in query chunks so the
(Q, N) distance matrix never materializes — MXU-friendly matmul form
||q - p||^2 = ||q||^2 + ||p||^2 - 2 q.p.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(
    queries: jax.Array,  # (Q, D)
    points: jax.Array,  # (N, D)
    k: int = 4,
    chunk: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Return (sq_dists (Q, k), indices (Q, k)) of the k nearest points."""
    q = queries.shape[0]
    pad = (-q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    p_sq = jnp.sum(points * points, axis=-1)

    def body(qc):
        d = (
            jnp.sum(qc * qc, axis=-1, keepdims=True)
            + p_sq[None, :]
            - 2.0 * qc @ points.T
        )
        neg, idx = jax.lax.top_k(-d, k)
        return jnp.maximum(-neg, 0.0), idx

    dists, idx = jax.lax.map(
        body, qp.reshape(-1, chunk, queries.shape[-1])
    )
    return dists.reshape(-1, k)[:q], idx.reshape(-1, k)[:q]


def calculate_neighbors(
    points: jax.Array, k: int = 3
) -> Tuple[jax.Array, jax.Array]:
    """Self-KNN excluding each point itself (`neighbor_search.py:21-36`)."""
    d, i = knn(points, points, k=k + 1)
    return d[:, 1:], i[:, 1:]


def mean_squared_knn_distance(points, k: int = 3) -> jax.Array:
    """Per-point mean squared distance to its k nearest neighbors — the
    "knn" mean_sq_dist method for Gaussian scale init
    (`scripts/splatam.py:102-112`)."""
    d, _ = calculate_neighbors(points, k=k)
    return jnp.clip(d.mean(axis=-1), 1e-7, None)
