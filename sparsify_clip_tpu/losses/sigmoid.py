"""SigLIP-style pairwise sigmoid contrastive loss.

**Framework extension — not in the reference.**  The reference's only
contrastive objective is softmax InfoNCE (sparsify_clip.py:110-132).
The sigmoid loss (Zhai et al., "Sigmoid Loss for Language Image
Pre-Training", 2023) replaces the row/column softmax with an
independent binary classification per (image, text) pair:

    L = -(1/B) * sum_ij log sigmoid( z_ij * (s * <x_i, y_j> + b) )

with ``z_ij = +1`` on the diagonal (true pairs) and ``-1`` elsewhere,
``s`` a learnable scale and ``b`` a learnable bias (paper inits:
``s = 10``, ``b = -10``; we learn ``t' = log s`` so the scale stays
positive under unconstrained AdamW — unlike the reference's raw
temperature divisor, which is deliberately allowed to drift through 0
for matched numerics, the sigmoid loss has no reference numerics to
match and gets the standard parameterization).

Why this is the TPU-friendly contrastive objective: every pair's term
is **independent** — there is no log-sum-exp coupling a row across
devices — so the global-batch loss decomposes into per-device-block
partial sums.  The distributed form never materializes the (N, N)
logit matrix or an all-gathered (N, D) embedding matrix: each device
ring-shifts its text shard with ``ppermute`` and accumulates local
(b, b) blocks (:func:`sparsify_clip_tpu.parallel.dist_losses.ring_siglip_loss`).

The B×B similarity matmul rides the MXU; XLA fuses the scale/bias/
log-sigmoid/sum epilogue into the matmul consumer, so no custom Pallas
kernel is needed for this loss (the InfoNCE kernel exists because of
the LSE row coupling; sigmoid has none).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.utils.numerics import fp32_matmul


def siglip_loss(
    image_embeds: jnp.ndarray,
    text_embeds: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
) -> jnp.ndarray:
    """Pairwise sigmoid loss over the full (B, B) block.

    Args:
        image_embeds: (B, D) L2-normalized image embeddings.
        text_embeds: (B, D) L2-normalized text embeddings.
        logit_scale: positive scalar multiplier ``s`` (callers pass
            ``exp(t')`` of the learnable log-scale).
        logit_bias: scalar ``b`` added to every logit.

    Returns the scalar loss, normalized by the batch size ``B`` (sum
    over pairs ``j``, mean over anchors ``i`` — the paper's convention,
    eq. 1).
    """
    b = image_embeds.shape[0]
    logits = fp32_matmul(image_embeds, text_embeds.T) * logit_scale + logit_bias
    # +1 on the true-pair diagonal, -1 elsewhere; iota comparison, not
    # jnp.eye/diagonal (gather-free — see utils.numerics.masked_diagonal
    # for why that matters under SPMD partitioning)
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    z = jnp.where(row == col, 1.0, -1.0)
    # log sigmoid(x) = -softplus(-x), numerically stable both tails
    return -jnp.sum(jax.nn.log_sigmoid(z * logits)) / b
