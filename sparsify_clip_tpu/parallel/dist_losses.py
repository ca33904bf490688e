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

import functools

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


# --------------------------------------------------------------------
# Ring-chunked losses: O(b·D + b²) peak memory per device, independent
# of the device count.  Unlike the all-gather formulations above, the
# (N, D) gathered embeddings and the (b, N) row blocks are NEVER
# materialized — per hop only one (b, b) block exists, and softmax
# statistics accumulate online (flash-attention style).  See
# docs/SCALING.md for the memory table.
# --------------------------------------------------------------------

_NEG = -1e30  # finite -inf stand-in: avoids (-inf) − (-inf) = NaN


def _ring_hop(args, axis_name, perm):
    return tuple(jax.lax.ppermute(a, axis_name, perm) for a in args)


def _infonce_ring_stats(img32, txt32, temp, axis_name):
    """One ring pass → (row_lse, col_lse), both (b,) local.

    Row (image→text) LSE stays resident and folds in each visiting text
    chunk.  Column (text→image) statistics TRAVEL with their chunk: at
    hop k the holder folds its own image rows into the chunk's column
    max/sum, so after a full loop the stats return home complete.  The
    final hop carries only the (b,) stat vectors, not the (b, D) chunk.
    """
    b = img32.shape[0]
    n_dev = _axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    row_max = jnp.full((b,), _NEG, jnp.float32)
    row_sum = jnp.zeros((b,), jnp.float32)
    col_max = jnp.full((b,), _NEG, jnp.float32)
    col_sum = jnp.zeros((b,), jnp.float32)
    chunk = txt32
    # unrolled ring — NOT lax.scan (CLAUDE.md: collectives inside scan
    # deadlock the fake-device CPU mesh; unrolled lets XLA overlap the
    # next hop's ppermute with this hop's block matmul on real ICI)
    for k in range(n_dev):
        z = fp32_matmul(img32, chunk.T) / temp  # (b, b) — the only block
        new_rmax = jnp.maximum(row_max, jnp.max(z, axis=1))
        row_sum = row_sum * jnp.exp(row_max - new_rmax) + jnp.sum(
            jnp.exp(z - new_rmax[:, None]), axis=1
        )
        row_max = new_rmax
        new_cmax = jnp.maximum(col_max, jnp.max(z, axis=0))
        col_sum = col_sum * jnp.exp(col_max - new_cmax) + jnp.sum(
            jnp.exp(z - new_cmax[None, :]), axis=0
        )
        col_max = new_cmax
        if k < n_dev - 1:
            chunk, col_max, col_sum = _ring_hop(
                (chunk, col_max, col_sum), axis_name, perm
            )
        else:  # stats-only hop: brings each chunk's column LSE home
            col_max, col_sum = _ring_hop((col_max, col_sum), axis_name, perm)
    return row_max + jnp.log(row_sum), col_max + jnp.log(col_sum)


def _ring_infonce_fwd(img_local, txt_local, temperature, axis_name):
    img32 = img_local.astype(jnp.float32)
    txt32 = txt_local.astype(jnp.float32)
    temp = jnp.asarray(temperature, jnp.float32)
    b = img32.shape[0]
    n = b * _axis_size(axis_name)
    row_lse, col_lse = _infonce_ring_stats(img32, txt32, temp, axis_name)
    diag = jnp.sum(img32 * txt32, axis=1) / temp  # positives are paired rows
    part = jnp.sum(row_lse - diag) + jnp.sum(col_lse - diag)
    loss = jax.lax.psum(part, axis_name) / (2.0 * n)
    return loss, (img_local, txt_local, temperature, row_lse, col_lse)


def _ring_infonce_bwd(axis_name, residuals, g):
    img_local, txt_local, temperature, row_lse, col_lse = residuals
    img32 = img_local.astype(jnp.float32)
    txt32 = txt_local.astype(jnp.float32)
    temp = jnp.asarray(temperature, jnp.float32)
    b = img32.shape[0]
    n_dev = _axis_size(axis_name)
    n = b * n_dev
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    scale = jnp.asarray(g, jnp.float32) / (2.0 * n)

    dimg = jnp.zeros_like(img32)
    dtxt = jnp.zeros_like(txt32)  # travels with the chunk; returns home
    dtemp_acc = jnp.float32(0.0)
    chunk, chunk_lse = txt32, col_lse
    for k in range(n_dev):
        z = fp32_matmul(img32, chunk.T) / temp
        # dZ = (g/2N)·(softmax_row + softmax_col − 2δ); δ only in the
        # own-chunk block (hop 0), where global row id == col id.
        p = jnp.exp(z - row_lse[:, None]) + jnp.exp(z - chunk_lse[None, :])
        if k == 0:
            p = p - 2.0 * jnp.eye(b, dtype=jnp.float32)
        dz = scale * p
        dimg = dimg + fp32_matmul(dz, chunk) / temp
        dtxt = dtxt + fp32_matmul(dz.T, img32) / temp
        dtemp_acc = dtemp_acc + jnp.sum(dz * z)
        if k < n_dev - 1:
            chunk, chunk_lse, dtxt = _ring_hop(
                (chunk, chunk_lse, dtxt), axis_name, perm
            )
        else:  # final hop returns each chunk's grad to its owner
            (dtxt,) = _ring_hop((dtxt,), axis_name, perm)

    # every device returns the FULL temperature grad (replicated input →
    # replicated cotangent; shard_map check_vma=False does not psum)
    dtemp = -jax.lax.psum(dtemp_acc, axis_name) / temp
    t_arr = jnp.asarray(temperature)
    return (
        dimg.astype(img_local.dtype),
        dtxt.astype(txt_local.dtype),
        jnp.reshape(dtemp.astype(t_arr.dtype), jnp.shape(t_arr)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ring_infonce(img_local, txt_local, temperature, axis_name):
    loss, _ = _ring_infonce_fwd(img_local, txt_local, temperature, axis_name)
    return loss


_ring_infonce.defvjp(_ring_infonce_fwd, _ring_infonce_bwd)


def ring_infonce_loss(
    img_local: jnp.ndarray,
    txt_local: jnp.ndarray,
    temperature,
    axis_name: str = DATA_AXIS,
) -> jnp.ndarray:
    """Ring-chunked symmetric InfoNCE (sparsify_clip.py:110-132 at global
    batch) — the softmax counterpart of :func:`ring_siglip_loss`.

    :func:`global_contrastive_loss` must all-gather the (N, D) text and
    image matrices for its row logsumexp; this version never does.  Text
    chunks travel the ring (one (b, D) ppermute per hop — a single ICI
    hop that overlaps the (b, b) block matmul), row-LSE accumulates
    locally and column-LSE rides along with each chunk, flash-style.
    The custom VJP recomputes the blocks in a second ring pass with the
    saved (b,) LSE vectors and ferries each text shard's gradient around
    the ring, so neither pass materializes more than O(b·D + b²) per
    device — independent of the device count.  Value and gradients match
    :func:`global_contrastive_loss` (and the single-device
    :func:`~sparsify_clip_tpu.losses.contrastive.contrastive_loss`) to
    fp32 accumulation order; the learnable raw-divisor temperature
    (sparsify_clip.py:716-717) receives its exact gradient.
    """
    return _ring_infonce(img_local, txt_local, temperature, axis_name)


def _lunif_block(x32, chunk, t, own_block):
    gram = fp32_matmul(x32, chunk.T)
    nl = jnp.sum(jnp.square(x32), axis=1)
    nc = jnp.sum(jnp.square(chunk), axis=1)
    d2 = jnp.maximum(nl[:, None] + nc[None, :] - 2.0 * gram, 0.0)
    w = jnp.exp(-t * d2)
    if own_block:  # self-pairs live only where a shard meets itself
        w = w * (1.0 - jnp.eye(x32.shape[0], dtype=jnp.float32))
    return w


def _ring_lunif_fwd(x_local, t, axis_name):
    x32 = x_local.astype(jnp.float32)
    b = x32.shape[0]
    n_dev = _axis_size(axis_name)
    n = b * n_dev
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    chunk = x32
    total = jnp.float32(0.0)
    for k in range(n_dev):
        total = total + jnp.sum(_lunif_block(x32, chunk, t, k == 0))
        if k < n_dev - 1:
            (chunk,) = _ring_hop((chunk,), axis_name, perm)
    s = jax.lax.psum(total, axis_name)  # Σ_{i≠j} over ordered pairs
    return jnp.log(s / (n * (n - 1))), (x_local, s)


def _ring_lunif_bwd(t, axis_name, residuals, g):
    x_local, s = residuals
    x32 = x_local.astype(jnp.float32)
    b = x32.shape[0]
    n_dev = _axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    chunk = x32
    r = jnp.zeros((b,), jnp.float32)
    wx = jnp.zeros_like(x32)
    # W is symmetric, so each device's full row sums close after one
    # loop — no traveling accumulator needed (unlike InfoNCE's dtxt)
    for k in range(n_dev):
        w = _lunif_block(x32, chunk, t, k == 0)
        r = r + jnp.sum(w, axis=1)
        wx = wx + fp32_matmul(w, chunk)
        if k < n_dev - 1:
            (chunk,) = _ring_hop((chunk,), axis_name, perm)
    dx = (-4.0 * t / s) * (x32 * r[:, None] - wx)
    return (jnp.asarray(g, jnp.float32) * dx).astype(x_local.dtype),


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _ring_lunif(x_local, t, axis_name):
    loss, _ = _ring_lunif_fwd(x_local, t, axis_name)
    return loss


_ring_lunif.defvjp(_ring_lunif_fwd, _ring_lunif_bwd)


def ring_lunif_loss(
    x_local: jnp.ndarray, t: float = 2.0, axis_name: str = DATA_AXIS
) -> jnp.ndarray:
    """Ring-chunked condensed-pdist uniformity (sparsify_clip.py:159-164
    at global batch).

    :func:`global_lunif_loss` all-gathers the (N, D) embeddings; here
    the shards travel the ring instead and only one (b, b)
    exp(−t·d²) block exists per hop.  The custom VJP recomputes the
    blocks (residuals: just the local shard and the scalar pair sum) and
    uses W's symmetry to close each row sum in a single loop:
    dx_i = −4t/S·(r_i·x_i − (Wx)_i).  Value and gradients match
    :func:`global_lunif_loss` / the single-device
    :func:`~sparsify_clip_tpu.losses.unif.lunif_loss`.
    """
    return _ring_lunif(x_local, t, axis_name)
