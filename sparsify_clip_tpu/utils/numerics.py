"""Numerics helpers shared across losses / metrics.

On TPU the default fp32 matmul precision decomposes operands into
bfloat16 passes (error ~1e-1 on unit-scale 512-dim dots) — far too
coarse for the B×B loss block, where logits get divided by a 0.1
temperature.  All loss-path matmuls therefore request
``Precision.HIGHEST`` explicitly; encoder matmuls run in bf16 by design
(the "fp16: True" path of the reference, sparsify_clip.py:765).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fp32_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision fp32 matmul regardless of backend defaults."""
    return jnp.dot(
        a.astype(jnp.float32),
        b.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """x / ||x||₂ along ``axis`` in fp32 (sparsify_clip.py:772-773 uses a
    plain divide with no epsilon; pass ``eps`` for F.normalize semantics)."""
    x = x.astype(jnp.float32)
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return x / norm
