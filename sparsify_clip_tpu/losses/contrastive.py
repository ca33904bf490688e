"""Contrastive (InfoNCE / "anchor") losses.

Reference semantics: sparsify_clip.py:110-157.  ``temperature`` is the
raw divisor of the similarity matrix — NOT a logit scale multiplier —
and when learnable it is an unconstrained parameter initialized at 0.1
(sparsify_clip.py:716-717,779).  We keep that parameterization for
matched numerics (it differs from standard CLIP's ``exp(logit_scale)``).

The B×B similarity matmul runs on the MXU; the row-wise log-softmax is
fused by XLA.  A Pallas fused kernel for the full block lives in
:mod:`sparsify_clip_tpu.ops.pallas_infonce`; this module is the
always-available XLA path and the numerics golden.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from sparsify_clip_tpu.utils.numerics import fp32_matmul, masked_diagonal


def _symmetric_ce(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean of image→text and text→image cross-entropy vs diagonal targets."""
    # mask-reduce, not jnp.diagonal — see masked_diagonal's docstring
    diag = masked_diagonal(logits)
    # CE(logits, arange) = mean_i (logsumexp(row_i) - logit[i, i])
    loss_i2t = jnp.mean(logsumexp(logits, axis=1) - diag)
    loss_t2i = jnp.mean(logsumexp(logits, axis=0) - diag)
    return (loss_i2t + loss_t2i) / 2.0


def contrastive_loss(
    image_embeds: jnp.ndarray,
    text_embeds: jnp.ndarray,
    temperature=0.07,
) -> jnp.ndarray:
    """Symmetric InfoNCE with diagonal targets (sparsify_clip.py:110-132).

    Args:
        image_embeds: (B, D) L2-normalized image embeddings.
        text_embeds: (B, D) L2-normalized text embeddings.
        temperature: scalar divisor of the similarity matrix (raw, may be
            a learnable parameter — the reference lets AdamW drive it
            unconstrained, including toward/through zero).
    """
    logits = fp32_matmul(image_embeds, text_embeds.T) / temperature
    return _symmetric_ce(logits)


def contrastive_loss_roberta(
    image_embeds: jnp.ndarray,
    text_embeds: jnp.ndarray,
    soft_targets: jnp.ndarray,
    temperature=0.07,
) -> jnp.ndarray:
    """CE against a soft similarity target matrix (sparsify_clip.py:135-157).

    ``soft_targets`` is a (B, B) row-stochastic matrix (the reference
    derives it from RoBERTa sentence similarities).  Matches
    ``F.cross_entropy`` with probability targets: mean over rows of
    ``-sum(target * log_softmax(logits))``.
    """
    soft_targets = soft_targets.astype(jnp.float32)
    logits = fp32_matmul(image_embeds, text_embeds.T) / temperature

    def ce_soft(lg, tg):
        logp = lg - logsumexp(lg, axis=1, keepdims=True)
        return -jnp.mean(jnp.sum(tg * logp, axis=1))

    return (ce_soft(logits, soft_targets) + ce_soft(logits.T, soft_targets.T)) / 2.0
