"""Explicit-collective (shard_map) global-batch losses.

The default train path is global-view jit: the loss math is written on
full arrays and XLA's partitioner inserts the ICI collectives.  This
module is the manual-control twin — each loss is written **per shard**
with explicit ``jax.lax.all_gather`` / ``psum`` over the ``data`` axis,
for use inside ``shard_map`` (kernel fusion experiments, comms
scheduling, pedagogy).  Numerics match the global computation exactly;
tests equate both on an 8-device CPU mesh.

Pair-counting note (SURVEY.md §5): ``lunif`` uses the condensed-pdist
convention — N(N−1)/2 unordered distinct pairs.  Per shard we compute
the local-rows × global-columns block of exp(−t·d²), mask the true
diagonal (global row id == global col id), and psum the partial sums;
every ordered pair (i≠j) is counted exactly once across devices, so
dividing by N(N−1) reproduces the condensed mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from sparsify_clip_tpu.utils.numerics import fp32_matmul

DATA_AXIS = "data"


def _axis_size(axis_name: str) -> jnp.ndarray:
    return jax.lax.psum(1, axis_name)


def global_contrastive_loss(
    img_local: jnp.ndarray,
    txt_local: jnp.ndarray,
    temperature,
    axis_name: str = DATA_AXIS,
) -> jnp.ndarray:
    """Symmetric InfoNCE over the global batch from per-device shards.

    Strategy: all-gather both modality shards (512-d embeddings — tiny
    on ICI), compute only the **local-row** blocks of both directions'
    logit matrices, and psum the partial CE sums.
    """
    b_local = img_local.shape[0]
    n_dev = _axis_size(axis_name)
    n = b_local * n_dev
    my = jax.lax.axis_index(axis_name)
    row0 = my * b_local

    img_all = jax.lax.all_gather(img_local, axis_name, tiled=True)  # (N, D)
    txt_all = jax.lax.all_gather(txt_local, axis_name, tiled=True)

    # image→text: local image rows vs all texts
    logits_i = fp32_matmul(img_local, txt_all.T) / temperature  # (b, N)
    # text→image: local text rows vs all images
    logits_t = fp32_matmul(txt_local, img_all.T) / temperature

    local_ids = row0 + jnp.arange(b_local)
    diag_i = jnp.take_along_axis(logits_i, local_ids[:, None], axis=1)[:, 0]
    diag_t = jnp.take_along_axis(logits_t, local_ids[:, None], axis=1)[:, 0]

    part_i = jnp.sum(logsumexp(logits_i, axis=1) - diag_i)
    part_t = jnp.sum(logsumexp(logits_t, axis=1) - diag_t)
    loss_i2t = jax.lax.psum(part_i, axis_name) / n
    loss_t2i = jax.lax.psum(part_t, axis_name) / n
    return (loss_i2t + loss_t2i) / 2.0


def global_lunif_loss(
    x_local: jnp.ndarray, t: float = 2.0, axis_name: str = DATA_AXIS
) -> jnp.ndarray:
    """Condensed-pdist uniformity over the global batch."""
    b_local = x_local.shape[0]
    n_dev = _axis_size(axis_name)
    n = b_local * n_dev
    my = jax.lax.axis_index(axis_name)
    row0 = my * b_local

    x_all = jax.lax.all_gather(x_local, axis_name, tiled=True)  # (N, D)
    xl = x_local.astype(jnp.float32)
    xa = x_all.astype(jnp.float32)
    gram = fp32_matmul(xl, xa.T)
    nl = jnp.sum(jnp.square(xl), axis=1)
    na = jnp.sum(jnp.square(xa), axis=1)
    d2 = jnp.maximum(nl[:, None] + na[None, :] - 2.0 * gram, 0.0)
    w = jnp.exp(-t * d2)
    # mask the true diagonal: global row id == global col id
    row_ids = row0 + jnp.arange(b_local)
    col_ids = jnp.arange(n)
    w = jnp.where(row_ids[:, None] == col_ids[None, :], 0.0, w)
    total = jax.lax.psum(jnp.sum(w), axis_name)
    return jnp.log(total / (n * (n - 1)))


def global_lalign_loss(
    x_local: jnp.ndarray, y_local: jnp.ndarray, alpha: float = 2.0,
    axis_name: str = DATA_AXIS,
) -> jnp.ndarray:
    """Paired alignment — pointwise, so only the mean needs a psum."""
    b_local = x_local.shape[0]
    n = b_local * _axis_size(axis_name)
    sq = jnp.sum(
        jnp.square(x_local.astype(jnp.float32) - y_local.astype(jnp.float32)), axis=1
    )
    if alpha == 2.0:
        local = jnp.sum(sq)
    else:
        local = jnp.sum(jnp.power(jnp.sqrt(sq + 1e-20), alpha))
    return jax.lax.psum(local, axis_name) / n


def ring_siglip_loss(
    img_local: jnp.ndarray,
    txt_local: jnp.ndarray,
    logit_scale,
    logit_bias,
    axis_name: str = DATA_AXIS,
) -> jnp.ndarray:
    """Ring-chunked global-batch sigmoid loss (the SigLIP paper's
    "chunked" implementation, re-derived for ``shard_map``/``ppermute``).

    Unlike InfoNCE, the sigmoid loss has **no cross-row coupling** — the
    global (N, N) sum is just the sum of all (b, b) device blocks.  So
    instead of all-gathering the text embeddings (as
    :func:`global_contrastive_loss` must for its row LSE), each device
    keeps its image shard resident and the text shards travel the ring:
    at step k device d holds the texts of device (d - k) mod n and adds
    that block's partial sum.  Peak memory is O(b·D + b²) per device —
    independent of the device count — and each step's (b, D) ppermute
    rides a single ICI hop, overlapping the (b, b) block matmul.

    Positives (the +1-diagonal block) appear exactly once, at k = 0,
    where a device's own image and text shards meet; every other block
    is all-negatives.  Summation order differs from the single-device
    computation, so equality with :func:`losses.sigmoid.siglip_loss` is
    up to fp accumulation order (tests pin ~1e-6 rel on fp32).
    """
    b_local = img_local.shape[0]
    n_dev = _axis_size(axis_name)  # psum of a python int: static
    n = b_local * n_dev

    def block(txt_chunk: jnp.ndarray, diag_positive: bool) -> jnp.ndarray:
        logits = (
            fp32_matmul(img_local, txt_chunk.T) * logit_scale + logit_bias
        )
        if diag_positive:
            row = jax.lax.broadcasted_iota(jnp.int32, (b_local, b_local), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (b_local, b_local), 1)
            z = jnp.where(row == col, 1.0, -1.0)
        else:
            z = -1.0
        return -jnp.sum(jax.nn.log_sigmoid(z * logits))

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    total = block(txt_local, True)
    chunk = txt_local
    # unrolled ring: n_dev - 1 data-dependent ppermute+matmul steps.
    # (deliberately NOT lax.scan: collectives inside scan deadlock the
    # fake-device CPU mesh the tests run on — see CLAUDE.md — and for
    # real meshes the unrolled chain lets XLA overlap hop k+1's ppermute
    # with hop k's matmul)
    for _ in range(n_dev - 1):
        chunk = jax.lax.ppermute(chunk, axis_name, perm)
        total = total + block(chunk, False)
    return jax.lax.psum(total, axis_name) / n


def global_normalized_centroids(img_local: jnp.ndarray, txt_local: jnp.ndarray):
    """Paired midpoints are local math — shard-parallel for free."""
    c = (img_local.astype(jnp.float32) + txt_local.astype(jnp.float32)) / 2.0
    norm = jnp.linalg.norm(c, axis=-1, keepdims=True)
    return c / jnp.maximum(norm, 1e-12)
