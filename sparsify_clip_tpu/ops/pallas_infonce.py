"""Pallas TPU kernel: fused B×B similarity + symmetric InfoNCE.

Computes the reference's "anchor" loss (contrastive_loss,
sparsify_clip.py:110-132) — mean of image→text and text→image
cross-entropy against diagonal targets over ``logits = img @ txt.T /
temperature`` — without materializing the B×B logit matrix in HBM, at
any global batch size (VMEM holds only (TILE, D) operand tiles and
(TILE, TILE) logit tiles; per-row and per-column logsumexp statistics
accumulate online across the sequential TPU grid, flash-attention
style).

Forward: 2-D grid over (row tiles, col tiles).  Row-LSE accumulates in
a (TILE, 1) scratch reset at each new row tile; column-LSE accumulates
in a persistent (1, N) scratch across the whole grid; diagonal logits
and the running row-loss accumulate in SMEM.  Outputs: loss + row/col
LSE vectors (saved for the backward).

Backward: with the saved LSEs,

    dZ_ij = (g/2N)·(p_row_ij + p_col_ij − 2δ_ij)
    d_img_i = Σ_j dZ_ij·txt_j / T      (grid (i, j), accumulate over j)
    d_txt_j = Σ_i dZ_ij·img_i / T      (grid (j, i), accumulate over i)
    dT      = −(1/T)·Σ dZ·Z            (accumulated during the d_img pass)

The temperature is the raw divisor (reference parameterization,
sparsify_clip.py:716-717,779) and receives a gradient, so the
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
_HIGH = jax.lax.Precision.HIGHEST


def _pad_rows(x, multiple):
    rem = (-x.shape[0]) % multiple
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0)))
    return x


def _tile_logits(img_tile, txt_tile, temp):
    return jnp.dot(
        img_tile, txt_tile.T, preferred_element_type=jnp.float32, precision=_HIGH
    ) / temp


def _tile_ids(i, j, tm, tn):
    rows = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
    cols = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    return rows, cols


# ---------------------------------------------------------------- forward
def _fwd_kernel(
    img_ref, txt_ref, temp_ref,
    loss_ref, row_lse_ref, col_lse_ref,
    row_max_ref, row_sum_ref, col_max_ref, col_sum_ref,
    row_acc_ref, diag_acc_ref,
    *, n: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tm, tn = img_ref.shape[0], txt_ref.shape[0]

    @pl.when((i == 0) & (j == 0))
    def _():
        col_max_ref[:] = jnp.full_like(col_max_ref, NEG_INF)
        col_sum_ref[:] = jnp.zeros_like(col_sum_ref)
        row_acc_ref[0, 0] = jnp.float32(0.0)
        diag_acc_ref[0, 0] = jnp.float32(0.0)

    @pl.when(j == 0)
    def _():
        row_max_ref[:] = jnp.full_like(row_max_ref, NEG_INF)
        row_sum_ref[:] = jnp.zeros_like(row_sum_ref)

    z = _tile_logits(img_ref[:], txt_ref[:], temp_ref[0, 0])
    rows, cols = _tile_ids(i, j, tm, tn)
    valid_row = rows < n
    valid_col = cols < n
    zr = jnp.where(valid_col, z, NEG_INF)  # for row stats: mask pad cols
    zc = jnp.where(valid_row, z, NEG_INF)  # for col stats: mask pad rows

    # online row LSE over this tile's columns
    tile_rmax = jnp.max(zr, axis=1, keepdims=True)
    new_rmax = jnp.maximum(row_max_ref[:], tile_rmax)
    row_sum_ref[:] = row_sum_ref[:] * jnp.exp(row_max_ref[:] - new_rmax) + jnp.sum(
        jnp.exp(zr - new_rmax), axis=1, keepdims=True
    )
    row_max_ref[:] = new_rmax

    # online column LSE (persistent scratch spans the whole batch)
    col_slice = pl.ds(j * tn, tn)
    cmax = col_max_ref[0, col_slice][None, :]
    csum = col_sum_ref[0, col_slice][None, :]
    tile_cmax = jnp.max(zc, axis=0, keepdims=True)
    new_cmax = jnp.maximum(cmax, tile_cmax)
    csum = csum * jnp.exp(cmax - new_cmax) + jnp.sum(
        jnp.exp(zc - new_cmax), axis=0, keepdims=True
    )
    col_max_ref[0, col_slice] = new_cmax[0]
    col_sum_ref[0, col_slice] = csum[0]

    # diagonal logits (each appears in exactly one tile)
    on_diag = (rows == cols) & valid_row & valid_col
    diag_acc_ref[0, 0] += jnp.sum(jnp.where(on_diag, z, 0.0))

    @pl.when(j == nj - 1)
    def _():
        row_lse = row_max_ref[:] + jnp.log(row_sum_ref[:])
        row_lse_ref[:] = row_lse
        row_ids = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
        row_acc_ref[0, 0] += jnp.sum(jnp.where(row_ids < n, row_lse, 0.0))

    @pl.when((i == pl.num_programs(0) - 1) & (j == nj - 1))
    def _():
        col_lse = col_max_ref[:] + jnp.log(col_sum_ref[:])
        col_lse_ref[:] = col_lse
        cols1 = jax.lax.broadcasted_iota(jnp.int32, col_lse.shape, 1)
        col_total = jnp.sum(jnp.where(cols1 < n, col_lse, 0.0))
        loss_i2t = (row_acc_ref[0, 0] - diag_acc_ref[0, 0]) / n
        loss_t2i = (col_total - diag_acc_ref[0, 0]) / n
        loss_ref[0, 0] = (loss_i2t + loss_t2i) / 2.0


def _run_fwd(img, txt, temperature):
    n, d = img.shape
    imgp = _pad_rows(img.astype(jnp.float32), TILE)
    txtp = _pad_rows(txt.astype(jnp.float32), TILE)
    npad = imgp.shape[0]
    grid = (npad // TILE, npad // TILE)
    temp = jnp.reshape(temperature.astype(jnp.float32), (1, 1))
    loss, row_lse, col_lse = pl.pallas_call(
        functools.partial(_fwd_kernel, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, 1), jnp.float32),   # row max
            pltpu.VMEM((TILE, 1), jnp.float32),   # row sumexp
            pltpu.VMEM((1, npad), jnp.float32),   # col max (persistent)
            pltpu.VMEM((1, npad), jnp.float32),   # col sumexp (persistent)
            pltpu.SMEM((1, 1), jnp.float32),      # row-loss acc
            pltpu.SMEM((1, 1), jnp.float32),      # diag acc
        ],
    )(imgp, txtp, temp)
    return loss[0, 0], row_lse, col_lse


# ---------------------------------------------------------------- backward
def _dz_tile(img_tile, txt_tile, temp, row_lse, col_lse, g, rows, cols, n):
    z = _tile_logits(img_tile, txt_tile, temp)
    valid = (rows < n) & (cols < n)
    p_row = jnp.exp(z - row_lse)
    p_col = jnp.exp(z - col_lse)
    delta = (rows == cols).astype(jnp.float32)
    dz = jnp.where(valid, (g / (2.0 * n)) * (p_row + p_col - 2.0 * delta), 0.0)
    return z, dz, valid


def _bwd_dimg_kernel(
    img_ref, txt_ref, temp_ref, row_lse_ref, col_lse_ref, g_ref,
    dimg_ref, dtemp_ref, acc_ref, dtemp_acc_ref, *, n: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tm, tn = img_ref.shape[0], txt_ref.shape[0]
    temp = temp_ref[0, 0]

    @pl.when((i == 0) & (j == 0))
    def _():
        dtemp_acc_ref[0, 0] = jnp.float32(0.0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rows, cols = _tile_ids(i, j, tm, tn)
    z, dz, valid = _dz_tile(
        img_ref[:], txt_ref[:], temp, row_lse_ref[:],
        col_lse_ref[0, pl.ds(j * tn, tn)][None, :], g_ref[0, 0], rows, cols, n,
    )
    acc_ref[:] += jnp.dot(
        dz, txt_ref[:], preferred_element_type=jnp.float32, precision=_HIGH
    ) / temp
    dtemp_acc_ref[0, 0] += jnp.sum(dz * jnp.where(valid, z, 0.0))

    @pl.when(j == nj - 1)
    def _():
        dimg_ref[:] = acc_ref[:]

    @pl.when((i == pl.num_programs(0) - 1) & (j == nj - 1))
    def _():
        dtemp_ref[0, 0] = -dtemp_acc_ref[0, 0] / temp


def _bwd_dtxt_kernel(
    txt_ref, img_ref, temp_ref, row_lse_ref, col_lse_ref, g_ref,
    dtxt_ref, acc_ref, *, n: int,
):
    # grid (j, i): for each txt tile j, accumulate over img tiles i.
    j = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    tn, tm = txt_ref.shape[0], img_ref.shape[0]
    temp = temp_ref[0, 0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rows, cols = _tile_ids(i, j, tm, tn)
    _, dz, _ = _dz_tile(
        img_ref[:], txt_ref[:], temp, row_lse_ref[:],
        col_lse_ref[0, pl.ds(j * tn, tn)][None, :], g_ref[0, 0], rows, cols, n,
    )
    acc_ref[:] += jnp.dot(
        dz.T, img_ref[:], preferred_element_type=jnp.float32, precision=_HIGH
    ) / temp

    @pl.when(i == ni - 1)
    def _():
        dtxt_ref[:] = acc_ref[:]


def _run_bwd(img, txt, temperature, row_lse, col_lse, g):
    n, d = img.shape
    imgp = _pad_rows(img.astype(jnp.float32), TILE)
    txtp = _pad_rows(txt.astype(jnp.float32), TILE)
    npad = imgp.shape[0]
    nt = npad // TILE
    temp = jnp.reshape(temperature.astype(jnp.float32), (1, 1))
    gg = jnp.reshape(jnp.asarray(g, jnp.float32), (1, 1))

    dimg, dtemp = pl.pallas_call(
        functools.partial(_bwd_dimg_kernel, n=n),
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, d), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
    )(imgp, txtp, temp, row_lse, col_lse, gg)

    dtxt = pl.pallas_call(
        functools.partial(_bwd_dtxt_kernel, n=n),
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, d), jnp.float32)],
    )(txtp, imgp, temp, row_lse, col_lse, gg)

    return dimg[:n], dtxt[:n], dtemp[0, 0]


# ---------------------------------------------------------------- public op
@jax.custom_vjp
def infonce_loss_pallas(img: jnp.ndarray, txt: jnp.ndarray, temperature) -> jnp.ndarray:
    """Fused symmetric InfoNCE; numerics-matched to
    :func:`sparsify_clip_tpu.losses.contrastive.contrastive_loss`."""
    temperature = jnp.asarray(temperature)
    loss, _, _ = _run_fwd(img, txt, temperature)
    return loss


def _vjp_fwd(img, txt, temperature):
    temperature = jnp.asarray(temperature)
    loss, row_lse, col_lse = _run_fwd(img, txt, temperature)
    return loss, (img, txt, temperature, row_lse, col_lse)


def _vjp_bwd(residuals, g):
    img, txt, temperature, row_lse, col_lse = residuals
    dimg, dtxt, dtemp = _run_bwd(img, txt, temperature, row_lse, col_lse, g)
    dtemp_scalar = dtemp.astype(jnp.asarray(temperature).dtype)
    return dimg, dtxt, jnp.reshape(dtemp_scalar, jnp.shape(temperature))


infonce_loss_pallas.defvjp(_vjp_fwd, _vjp_bwd)
