"""Alignment losses (Wang–Isola style).

Reference semantics: sparsify_clip.py:178-187 (lalign,
random_alignment) and :487-505 (centroid alignment; defined in the
reference but only used by commented-out experiments).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lalign_loss(x: jnp.ndarray, y: jnp.ndarray, alpha: float = 2.0) -> jnp.ndarray:
    """``mean(||x - y||_2 ** alpha)`` (sparsify_clip.py:186-187).

    For the default α=2 this is computed as the mean of summed squares —
    mathematically identical to ``norm().pow(2)`` but with a defined
    gradient at x == y (torch's norm→pow path has a 0/0 there).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    sq = jnp.sum(jnp.square(x - y), axis=1)
    if alpha == 2.0:
        return jnp.mean(sq)
    return jnp.mean(jnp.power(jnp.sqrt(sq + 1e-20), alpha))


def random_alignment_loss(x: jnp.ndarray, y: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Alignment against randomly shuffled pairs (sparsify_clip.py:178-184).

    The reference uses ``torch.randperm``; here the permutation comes
    from an explicit PRNG key (functional JAX RNG discipline).
    """
    perm = jax.random.permutation(key, y.shape[0])
    return lalign_loss(x, y[perm], alpha=2.0)


def centroid_alignment_loss(
    img_embeds: jnp.ndarray, txt_embeds: jnp.ndarray, p: int = 2
) -> jnp.ndarray:
    """Distance between the two modality centroids (sparsify_clip.py:487-505)."""
    centroid_img = jnp.mean(img_embeds.astype(jnp.float32), axis=0)
    centroid_txt = jnp.mean(txt_embeds.astype(jnp.float32), axis=0)
    diff = centroid_img - centroid_txt
    if p == 2:
        return jnp.sqrt(jnp.sum(jnp.square(diff)))
    return jnp.power(jnp.sum(jnp.power(jnp.abs(diff), p)), 1.0 / p)
