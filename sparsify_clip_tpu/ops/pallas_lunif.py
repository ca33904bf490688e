"""Pallas TPU kernel: pairwise-distance log-mean-exp uniformity.

Computes ``log( mean_{i≠j} exp(-t·‖x_i − x_j‖²) )`` — the condensed-
pdist uniformity potential (reference: lunif_loss,
sparsify_clip.py:159-164) — without ever materializing the N×N
distance matrix in HBM.  The grid tiles the implicit N×N Gram matrix;
each program computes one (TM, TN) tile on the MXU, applies the
exp(−t·d²) kernel and a diagonal/padding mask on the VPU, and
accumulates the masked sum in SMEM across the (sequential) TPU grid.

The custom VJP recomputes the weight tile and accumulates

    dx_i = −4t/S · Σ_j w_ij (x_i − x_j)
         = −4t/S · (r_i·x_i − (Wx)_i),   r_i = Σ_j w_ij

in a second tiled kernel (W is symmetric; each unordered pair
contributes twice to S, hence the 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _pad_rows(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0)))
    return x


# ------------------------------------------------------------- forward
def _fwd_kernel(xi_ref, xj_ref, s_ref, acc_ref, *, t: float, n: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    xi = xi_ref[:]
    xj = xj_ref[:]
    gram = jnp.dot(xi, xj.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    ni = jnp.sum(xi * xi, axis=1, keepdims=True)
    nj = jnp.sum(xj * xj, axis=1, keepdims=True)
    d2 = jnp.maximum(ni + nj.T - 2.0 * gram, 0.0)
    w = jnp.exp(-t * d2)

    tm, tn = w.shape
    row_ids = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
    col_ids = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    mask = (row_ids != col_ids) & (row_ids < n) & (col_ids < n)
    acc_ref[0, 0] += jnp.sum(jnp.where(mask, w, 0.0))

    @pl.when((i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1))
    def _():
        s_ref[0, 0] = acc_ref[0, 0]


def _pairwise_exp_sum(x: jnp.ndarray, t: float) -> jnp.ndarray:
    """S = Σ_{i≠j} exp(−t·d²ij) over ordered pairs, as a (1,1) array."""
    n = x.shape[0]
    xp = _pad_rows(x.astype(jnp.float32), TILE)
    npad = xp.shape[0]
    grid = (npad // TILE, npad // TILE)
    s = pl.pallas_call(
        functools.partial(_fwd_kernel, t=t, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, xp.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, xp.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    )(xp, xp)
    return s


# ------------------------------------------------------------- backward
def _bwd_kernel(xi_ref, xj_ref, r_ref, wx_ref, racc_ref, wxacc_ref, *, t: float, n: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        racc_ref[:] = jnp.zeros_like(racc_ref)
        wxacc_ref[:] = jnp.zeros_like(wxacc_ref)

    xi = xi_ref[:]
    xj = xj_ref[:]
    gram = jnp.dot(xi, xj.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    ni = jnp.sum(xi * xi, axis=1, keepdims=True)
    nj = jnp.sum(xj * xj, axis=1, keepdims=True)
    d2 = jnp.maximum(ni + nj.T - 2.0 * gram, 0.0)
    w = jnp.exp(-t * d2)
    tm, tn = w.shape
    row_ids = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
    col_ids = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    mask = (row_ids != col_ids) & (row_ids < n) & (col_ids < n)
    w = jnp.where(mask, w, 0.0)

    racc_ref[:] += jnp.sum(w, axis=1, keepdims=True)
    wxacc_ref[:] += jnp.dot(w, xj, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        r_ref[:] = racc_ref[:]
        wx_ref[:] = wxacc_ref[:]


def _row_sums_and_wx(x: jnp.ndarray, t: float):
    """r = W·1 and Wx = W·x with the diagonal masked."""
    n, d = x.shape
    xp = _pad_rows(x.astype(jnp.float32), TILE)
    npad = xp.shape[0]
    grid = (npad // TILE, npad // TILE)
    r, wx = pl.pallas_call(
        functools.partial(_bwd_kernel, t=t, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, d), jnp.float32),
        ],
    )(xp, xp)
    return r[:n], wx[:n]


# ------------------------------------------------------------- public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def lunif_loss_pallas(x: jnp.ndarray, t: float = 2.0) -> jnp.ndarray:
    """Fused uniformity potential; numerics-matched to
    :func:`sparsify_clip_tpu.losses.unif.lunif_loss`."""
    n = x.shape[0]
    s = _pairwise_exp_sum(x, t)[0, 0]
    return jnp.log(s / (n * (n - 1)))


def _fwd(x, t):
    n = x.shape[0]
    s = _pairwise_exp_sum(x, t)[0, 0]
    return jnp.log(s / (n * (n - 1))), (x, s)


def _bwd(t, residuals, g):
    x, s = residuals
    r, wx = _row_sums_and_wx(x, t)
    dx = (-4.0 * t / s) * (x.astype(jnp.float32) * r - wx)
    return (g * dx,)


lunif_loss_pallas.defvjp(_fwd, _bwd)
