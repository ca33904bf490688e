"""Uniformity losses over pairwise distances.

Reference semantics: sparsify_clip.py:159-176.

``lunif_loss`` is the Wang–Isola uniformity potential
``log(mean(exp(-t * pdist(x)^2)))`` where ``torch.pdist`` yields the
condensed upper triangle — N(N-1)/2 unordered pairs, **no self-pairs**
(SURVEY.md §5 loss-math note).

TPU-native formulation: instead of materializing the condensed pairwise
vector (a scalar-indexing-hostile layout), we compute the full Gram
matrix ``G = x @ x.T`` on the MXU and use

    d²(i,j) = ||x_i||² + ||x_j||² − 2·G[i,j]

and the condensed mean is the mean of ``exp(−t·d²)`` over the
diagonal-masked full matrix (each unordered pair appears twice, so the
double-counting cancels in the mean):

    mean = sum_{i≠j} exp(−t·d²(i,j)) / (N·(N−1))

The diagonal is masked to zero *before* the sum — subtracting N after
the fact would catastrophically cancel when the off-diagonal terms are
tiny (e.g. far-apart unnormalized inputs).  This is exact (not an
approximation) and turns a pdist into one matmul plus elementwise ops
that XLA fuses.  The Pallas fused version (tiled, never materializing
the N×N matrix in HBM) lives in :mod:`sparsify_clip_tpu.ops.pallas_lunif`.
"""

from __future__ import annotations

import jax.numpy as jnp

from sparsify_clip_tpu.utils.numerics import fp32_matmul


def pairwise_sq_dists(x: jnp.ndarray) -> jnp.ndarray:
    """Full (N, N) matrix of squared Euclidean distances."""
    x = x.astype(jnp.float32)
    sq_norms = jnp.sum(jnp.square(x), axis=1)
    gram = fp32_matmul(x, x.T)
    d2 = sq_norms[:, None] + sq_norms[None, :] - 2.0 * gram
    return jnp.maximum(d2, 0.0)


def lunif_loss(x: jnp.ndarray, t: float = 2.0) -> jnp.ndarray:
    """log-mean-exp of −t·d² over the N(N−1)/2 unordered distinct pairs.

    Matches ``sq_pdist.mul(-t).exp().mean().log()``
    (sparsify_clip.py:159-164) including the self-pair exclusion.
    """
    n = x.shape[0]
    d2 = pairwise_sq_dists(x)
    kernel = jnp.exp(-t * d2)
    off_diag = kernel * (1.0 - jnp.eye(n, dtype=kernel.dtype))
    mean = jnp.sum(off_diag) / (n * (n - 1))
    return jnp.log(mean)


def sparsify_loss(x: jnp.ndarray) -> jnp.ndarray:
    """MSE between the Gram matrix and a ±1 "eye" target
    (sparsify_clip.py:166-176; defined in the reference, never called by
    any live experiment — shipped for capability parity).
    """
    cos_sim = fp32_matmul(x, x.T)
    n = cos_sim.shape[0]
    target = 2.0 * jnp.eye(n, dtype=jnp.float32) - 1.0  # 1 on diag, −1 off
    return jnp.mean(jnp.square(cos_sim - target))
