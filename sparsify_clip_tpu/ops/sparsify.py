"""Sparse embedding projections (top-k / L1 shrinkage), on-device.

The driver's north star describes "L1/top-k embedding projection
applied after epoch 1".  The reference's live code contains no such
projection — its "sparsification" is the lunif-only warm phase
(SURVEY.md §2.6/§8; the nearest relative is the never-called
``sparsify_loss``, sparsify_clip.py:166-176).  This module supplies the
capability as a **gated extension** (off by default so reference
numerics are untouched): a jittable projection applied to the
normalized embeddings inside the train step once ``epoch >=
sparse_after_epoch``.

Both projections renormalize back onto the unit sphere, so all
downstream losses keep their unit-norm contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_project(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k largest-|magnitude| components per row, renormalize.

    Straight-through style: jittable, and gradients flow through the
    kept components (the mask is constant w.r.t. x under ``lax.top_k``'s
    implicit gather).
    """
    absx = jnp.abs(x.astype(jnp.float32))
    kth = jax.lax.top_k(absx, k)[0][:, -1:]
    mask = (absx >= kth).astype(jnp.float32)
    projected = x.astype(jnp.float32) * mask
    norm = jnp.linalg.norm(projected, axis=-1, keepdims=True)
    return projected / jnp.maximum(norm, 1e-12)


def l1_shrink(x: jnp.ndarray, lam: float) -> jnp.ndarray:
    """Soft-thresholding (proximal L1 step) then renormalize:
    ``sign(x)·max(|x|−λ, 0) / ‖·‖``."""
    xf = x.astype(jnp.float32)
    shrunk = jnp.sign(xf) * jnp.maximum(jnp.abs(xf) - lam, 0.0)
    norm = jnp.linalg.norm(shrunk, axis=-1, keepdims=True)
    return shrunk / jnp.maximum(norm, 1e-12)


def make_projection(kind: str, topk: int = 64, l1: float = 0.01):
    """kind ∈ {"none", "topk", "l1"} → fn(embeddings) or None."""
    if kind == "none":
        return None
    if kind == "topk":
        return lambda x: topk_project(x, topk)
    if kind == "l1":
        return lambda x: l1_shrink(x, l1)
    raise ValueError(f"unknown sparse projection {kind!r} (none|topk|l1)")
