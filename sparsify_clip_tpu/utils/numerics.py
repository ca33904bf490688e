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


def masked_diagonal(m: jnp.ndarray) -> jnp.ndarray:
    """Main diagonal of a square 2-D array via mask-and-reduce.

    Deliberately NOT ``jnp.diagonal``: that traces a ``lax.cond`` whose
    gather (fwd) / scatter-add transpose (bwd) the SPMD partitioner
    turns into all-gathers inside a ``ConditionalThunk`` — *independent*
    of the program's other collectives.  On the multi-device CPU test
    mesh, XLA's thunk executor may start independent blocking
    collectives in a different order on each device thread, deadlocking
    the in-process rendezvous (crossed op_id waits → SIGABRT at the
    terminate timeout; see CLAUDE.md).  An iota-equality mask + row
    reduce partitions to purely local math with a broadcast-multiply
    transpose — and avoids dynamic gathers, which are slow on TPU
    anyway.  Values and gradients match ``jnp.diagonal`` exactly
    (pure selection, no arithmetic change).
    """
    if m.ndim != 2 or m.shape[0] != m.shape[1]:
        raise ValueError(f"masked_diagonal expects a square matrix, got {m.shape}")
    rows = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    zero = jnp.zeros((), m.dtype)
    return jnp.sum(jnp.where(rows == cols, m, zero), axis=1)


def masked_trace(m: jnp.ndarray) -> jnp.ndarray:
    """``jnp.trace`` twin built on :func:`masked_diagonal` (same rationale)."""
    return jnp.sum(masked_diagonal(m))
