"""Centroid helpers for the centroid-uniformity experiments.

Reference semantics: sparsify_clip.py:308-355.  Only
``compute_centroids_only`` (paired midpoints) is used by live
experiments; the pairwise ``compute_centroids`` is shipped for
capability parity.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def compute_centroids(
    text_embeddings: jnp.ndarray, visual_embeddings: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-pairs midpoints: (B1, B2, D) centroids plus their norms
    (sparsify_clip.py:308-332; unused by live experiments).
    """
    text = text_embeddings.astype(jnp.float32)[:, None, :]
    visual = visual_embeddings.astype(jnp.float32)[None, :, :]
    centroids = (text + visual) / 2.0
    centroid_norms = jnp.linalg.norm(centroids, axis=-1)
    return centroid_norms, centroids


def compute_centroids_only(
    text_embeddings: jnp.ndarray, visual_embeddings: jnp.ndarray
) -> jnp.ndarray:
    """Paired midpoints ``(text + visual) / 2`` of shape (B, D)
    (sparsify_clip.py:334-355).  Callers renormalize before feeding the
    result to ``lunif_loss`` (sparsify_clip.py:803-805).
    """
    return (
        text_embeddings.astype(jnp.float32) + visual_embeddings.astype(jnp.float32)
    ) / 2.0


def normalized_centroids(
    image_embeds: jnp.ndarray, text_embeds: jnp.ndarray
) -> jnp.ndarray:
    """The fused pattern used by every centroid experiment:
    ``F.normalize((img + txt) / 2)`` (sparsify_clip.py:803-804).
    """
    c = compute_centroids_only(image_embeds, text_embeds)
    norm = jnp.linalg.norm(c, axis=-1, keepdims=True)
    # F.normalize uses eps=1e-12 clamping on the denominator.
    return c / jnp.maximum(norm, 1e-12)
