"""Retrieval recall@K — jittable rewrite of ``Trainer.get_recall``
(train.py:551-572).

The reference accumulates all validation embeddings into host numpy and runs a
double Python loop; here it is one (N, N) matmul + comparisons, jittable and
shardable (the distance assumes L2-normalized embeddings:
``d = 2 - 2 * cam @ map.T``)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def recall_at_k(
    cam_embeddings: jax.Array,  # (N, D)
    map_embeddings: jax.Array,  # (N, D)
    ks: Tuple[int, ...] = (1, 5, 10),
) -> Tuple[jax.Array, ...]:
    """Percentage of queries whose true match ranks inside the top-k.

    Mirrors train.py:554-571: for map column k the ground-truth distance is
    ``dist[k, k]`` and its rank is the number of cameras strictly closer.
    Returns one percentage per k.
    """
    dist = 2.0 - 2.0 * cam_embeddings @ map_embeddings.T
    gt = jnp.diagonal(dist)
    ranks = jnp.sum(dist < gt[None, :], axis=0)  # per map column
    return tuple(jnp.mean(ranks < k) * 100.0 for k in ks)


def recall_curve(cam_embeddings: jax.Array, map_embeddings: jax.Array, length: int = 11):
    """Full val_accuracy array of train.py:555-567 (index i = R@i fraction)."""
    dist = 2.0 - 2.0 * cam_embeddings @ map_embeddings.T
    gt = jnp.diagonal(dist)
    ranks = jnp.sum(dist < gt[None, :], axis=0)
    return jnp.stack([jnp.mean(ranks < i) for i in range(length)])
