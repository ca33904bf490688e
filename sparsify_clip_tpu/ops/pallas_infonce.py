"""Pallas TPU kernel: fused B×B similarity + symmetric InfoNCE.

Computes the reference's "anchor" loss (contrastive_loss,
sparsify_clip.py:110-132) — mean of image→text and text→image
cross-entropy against diagonal targets over ``logits = img @ txt.T /
temperature`` — in one pass that never materializes the full B×B logit
matrix in HBM.

Forward: the grid walks row tiles of the logit matrix.  Each program
computes a (TM, B) logit tile on the MXU, reduces its row-wise
logsumexp directly, and maintains an **online column logsumexp**
(flash-attention style running max + rescaled sumexp) in VMEM scratch
across the sequential TPU grid.  Diagonal logits accumulate alongside.
Outputs: loss scalar + saved row/col LSE vectors for the backward.

Backward (second kernel): with the saved LSEs the softmax tiles are
recomputed as ``exp(z − lse)`` and

    dZ_ij = (g/2N)·(p_row_ij + p_col_ij − 2δ_ij)
    d_img = (dZ @ txt)/T     d_txt = (dZᵀ @ img)/T  (accumulated)
    dT    = −(1/T)·Σ dZ·Z

The temperature is the raw divisor (reference parameterization,
sparsify_clip.py:716-717,779), and its gradient is returned so the
learnable-temperature experiments run through the fused path too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
NEG_INF = -1e30


def _fwd_kernel(
    img_ref, txt_ref, temp_ref,
    loss_ref, row_lse_ref, col_lse_out_ref,
    col_max_ref, col_sum_ref, row_acc_ref, diag_acc_ref,
    *, n: int,
):
    i = pl.program_id(0)
    tm = img_ref.shape[0]

    @pl.when(i == 0)
    def _():
        col_max_ref[:] = jnp.full_like(col_max_ref, NEG_INF)
        col_sum_ref[:] = jnp.zeros_like(col_sum_ref)
        row_acc_ref[0, 0] = jnp.float32(0.0)
        diag_acc_ref[0, 0] = jnp.float32(0.0)

    temp = temp_ref[0, 0]
    z = jnp.dot(
        img_ref[:], txt_ref[:].T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / temp  # (TM, B)

    b = z.shape[1]
    row_ids = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, b), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, b), 1)
    valid_row = row_ids < n
    valid_col = col_ids < n
    z = jnp.where(valid_col, z, NEG_INF)  # padded txt columns never win

    # row-wise LSE (full row is resident)
    row_max = jnp.max(z, axis=1, keepdims=True)
    row_lse = row_max + jnp.log(
        jnp.sum(jnp.exp(z - row_max), axis=1, keepdims=True)
    )
    row_lse_ref[:] = row_lse

    # diagonal logits of this tile
    on_diag = (row_ids == col_ids) & valid_row
    diag_sum = jnp.sum(jnp.where(on_diag, z, 0.0))
    diag_acc_ref[0, 0] += diag_sum
    row_acc_ref[0, 0] += jnp.sum(
        jnp.where(valid_row[:, :1], row_lse, 0.0)
    )

    # online column LSE update
    zc = jnp.where(valid_row, z, NEG_INF)
    tile_col_max = jnp.max(zc, axis=0, keepdims=True)  # (1, B)
    new_max = jnp.maximum(col_max_ref[:], tile_col_max)
    col_sum_ref[:] = (
        col_sum_ref[:] * jnp.exp(col_max_ref[:] - new_max)
        + jnp.sum(jnp.exp(zc - new_max), axis=0, keepdims=True)
    )
    col_max_ref[:] = new_max

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        col_lse = col_max_ref[:] + jnp.log(col_sum_ref[:])
        col_lse_out_ref[:] = col_lse
        col_ids1 = jax.lax.broadcasted_iota(jnp.int32, col_lse.shape, 1)
        col_total = jnp.sum(jnp.where(col_ids1 < n, col_lse, 0.0))
        loss_i2t = (row_acc_ref[0, 0] - diag_acc_ref[0, 0]) / n
        loss_t2i = (col_total - diag_acc_ref[0, 0]) / n
        loss_ref[0, 0] = (loss_i2t + loss_t2i) / 2.0


def _bwd_kernel(
    img_ref, txt_ref, temp_ref, row_lse_ref, col_lse_ref, g_ref,
    dimg_ref, dtxt_ref, dtemp_ref,
    dtxt_acc_ref, dtemp_acc_ref,
    *, n: int,
):
    i = pl.program_id(0)
    tm = img_ref.shape[0]

    @pl.when(i == 0)
    def _():
        dtxt_acc_ref[:] = jnp.zeros_like(dtxt_acc_ref)
        dtemp_acc_ref[0, 0] = jnp.float32(0.0)

    temp = temp_ref[0, 0]
    g = g_ref[0, 0]
    img = img_ref[:]
    txt = txt_ref[:]
    z = jnp.dot(img, txt.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) / temp

    b = z.shape[1]
    row_ids = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, b), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, b), 1)
    valid = (row_ids < n) & (col_ids < n)

    p_row = jnp.exp(z - row_lse_ref[:])          # softmax over columns
    p_col = jnp.exp(z - col_lse_ref[:])          # softmax over rows
    delta = (row_ids == col_ids).astype(jnp.float32)
    dz = jnp.where(valid, (g / (2.0 * n)) * (p_row + p_col - 2.0 * delta), 0.0)

    dimg_ref[:] = jnp.dot(dz, txt, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) / temp
    dtxt_acc_ref[:] += jnp.dot(dz.T, img, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) / temp
    dtemp_acc_ref[0, 0] += jnp.sum(dz * jnp.where(valid, z, 0.0))

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dtxt_ref[:] = dtxt_acc_ref[:]
        dtemp_ref[0, 0] = -dtemp_acc_ref[0, 0] / temp


def _pad_rows(x, multiple):
    rem = (-x.shape[0]) % multiple
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0)))
    return x


def _run_fwd(img, txt, temperature):
    n, d = img.shape
    imgp = _pad_rows(img.astype(jnp.float32), TILE)
    txtp = _pad_rows(txt.astype(jnp.float32), TILE)
    npad = imgp.shape[0]
    grid = (npad // TILE,)
    temp = jnp.reshape(temperature.astype(jnp.float32), (1, 1))
    loss, row_lse, col_lse = pl.pallas_call(
        functools.partial(_fwd_kernel, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, npad), jnp.float32),
            pltpu.VMEM((1, npad), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
    )(imgp, txtp, temp)
    return loss[0, 0], row_lse, col_lse, npad


@jax.custom_vjp
def infonce_loss_pallas(img: jnp.ndarray, txt: jnp.ndarray, temperature) -> jnp.ndarray:
    """Fused symmetric InfoNCE; numerics-matched to
    :func:`sparsify_clip_tpu.losses.contrastive.contrastive_loss`."""
    temperature = jnp.asarray(temperature)
    loss, _, _, _ = _run_fwd(img, txt, temperature)
    return loss


def _vjp_fwd(img, txt, temperature):
    temperature = jnp.asarray(temperature)
    loss, row_lse, col_lse, _ = _run_fwd(img, txt, temperature)
    return loss, (img, txt, temperature, row_lse, col_lse)


def _vjp_bwd(residuals, g):
    img, txt, temperature, row_lse, col_lse = residuals
    n, d = img.shape
    imgp = _pad_rows(img.astype(jnp.float32), TILE)
    txtp = _pad_rows(txt.astype(jnp.float32), TILE)
    npad = imgp.shape[0]
    grid = (npad // TILE,)
    temp = jnp.reshape(temperature.astype(jnp.float32), (1, 1))
    gg = jnp.reshape(jnp.asarray(g, jnp.float32), (1, 1))
    dimg, dtxt, dtemp = pl.pallas_call(
        functools.partial(_bwd_kernel, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, d), jnp.float32),
            jax.ShapeDtypeStruct((npad, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((npad, d), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
    )(imgp, txtp, temp, row_lse, col_lse, gg)
    # g is already folded into dz inside the kernel — no second factor.
    dtemp_scalar = dtemp[0, 0].astype(jnp.asarray(temperature).dtype)
    return dimg[:n], dtxt[:n], jnp.reshape(dtemp_scalar, jnp.shape(temperature))


infonce_loss_pallas.defvjp(_vjp_fwd, _vjp_bwd)
