"""Wasserstein-2 uniformity metric family.

The reference iterates on five variants of a W₂-to-uniform metric
(uniformity.py:6-205; the live eval path uses an inline clone of
``numpy_uniformity`` at sparsify_clip.py:459-485).  All share the
closed form for the 2-Wasserstein distance between the embedding
Gaussian approximation N(μ, Σ) and the uniform-on-sphere surrogate
N(0, I/√d):

    W₂² = ‖μ‖² + 1 + tr(Σ) − (2/√d)·tr(Σ^{1/2})

The variants differ in: single vs concatenated modalities, the matrix
sqrt algorithm (SVD / eigh / eig-real-part / abs-eig), epsilon
placement, and the sign of the returned value.  Shipped as a family
because the research treats them as alternatives.

TPU note: general nonsymmetric ``eig`` does not lower to TPU, but Σ is
symmetric PSD by construction, so eigh is the exact same decomposition
the reference's ``np.linalg.eig`` returns on Σ (up to column order) —
we use eigh/SVD on device and validate against a numpy golden in tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from sparsify_clip_tpu.utils.numerics import fp32_matmul, masked_trace


def _mean_cov(x: jnp.ndarray):
    x = x.astype(jnp.float32)
    n = x.shape[0]
    mu = jnp.mean(x, axis=0, keepdims=True)
    centered = x - mu
    sigma = fp32_matmul(centered.T, centered) / n
    return mu[0], sigma


def _w2(mu: jnp.ndarray, sigma: jnp.ndarray, trace_sqrt: jnp.ndarray) -> jnp.ndarray:
    d = sigma.shape[0]
    return jnp.sqrt(
        jnp.sum(mu * mu) + 1.0 + masked_trace(sigma) - (2.0 / jnp.sqrt(jnp.float32(d))) * trace_sqrt
    )


def unif_w2_single_svd(x: jnp.ndarray) -> jnp.ndarray:
    """Single-modality, SVD sqrt, returns **+W₂**
    (uniformity.py:6-51 ``torch_uniformity1``)."""
    mu, sigma = _mean_cov(x)
    s = jnp.linalg.svd(sigma, compute_uv=False)
    trace_sqrt = jnp.sum(jnp.sqrt(jnp.maximum(s + 1e-8, 0.0)))
    return _w2(mu, sigma, trace_sqrt)


def unif_w2_joint(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Two-modality concat, +1e-6 on Σ, eigh sqrt, returns **−W₂**
    (uniformity.py:53-98 ``torch_uniformity``)."""
    mu, sigma = _mean_cov(jnp.concatenate([x, y], axis=0))
    sigma = sigma + 1e-6
    evals = jnp.linalg.eigvalsh(sigma)
    trace_sqrt = jnp.sum(jnp.sqrt(jnp.maximum(evals + 1e-8, 0.0)))
    return -_w2(mu, sigma, trace_sqrt)


def eval_uniformity(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """The live eval metric: concat, eig sqrt with clip(min=0), −W₂
    (sparsify_clip.py:459-485, the inline ``numpy_uniformity`` clone).

    Matches the reference's trace computation: ``tr(Σ − (2/√d)·Σ^½)``
    with eigenvalues ε-shifted then clipped at 0.
    """
    mu, sigma = _mean_cov(jnp.concatenate([x, y], axis=0))
    evals = jnp.linalg.eigvalsh(sigma)
    trace_sqrt = jnp.sum(jnp.sqrt(jnp.clip(evals + 1e-8, 0.0, None)))
    return -_w2(mu, sigma, trace_sqrt)


def unif_w2_eig_real(x: jnp.ndarray) -> jnp.ndarray:
    """Single-modality, eig real-part sqrt, returns **+W₂**
    (uniformity.py:138-180 ``torch_uniformity_equivalent``)."""
    mu, sigma = _mean_cov(x)
    evals = jnp.linalg.eigvalsh(sigma)  # Σ symmetric: eig real part == eigh
    trace_sqrt = jnp.sum(jnp.sqrt(jnp.clip(evals + 1e-8, 0.0, None)))
    return _w2(mu, sigma, trace_sqrt)


def unif_w2_abs_eig(x: jnp.ndarray) -> jnp.ndarray:
    """Single-modality, |eigenvalue| sqrt, returns **+W₂**
    (uniformity.py:182-205 ``uniformity10``).

    Note: the reference also takes |Q| (abs of eigenvectors) before
    reconstructing Σ^½, but only the trace of the reconstruction is
    consumed, and tr(Q·√S·Qᵀ) = Σᵢ √sᵢ·‖qᵢ‖² — column norms are
    invariant under elementwise abs, so |Q| does not change the value
    (validated against a numpy transcription in tests).
    """
    mu, sigma = _mean_cov(x)
    evals = jnp.abs(jnp.linalg.eigvalsh(sigma))
    trace_sqrt = jnp.sum(jnp.sqrt(evals))
    return _w2(mu, sigma, trace_sqrt)
