"""Pallas TPU kernel: fused multi-head self-attention for the CLIP towers.

At CLIP sequence lengths (50 vision tokens, 77 text tokens) XLA's
attention lowering materializes the (B, H, L, L) fp32 score tensor and
several padded (B, L, H, 64) layout copies in HBM — the dominant cost
of both towers on v5e (the head dim of 64 pads 2× to the 128-lane
register shape; profiling notes in the repo history).  This kernel
keeps the whole attention block in VMEM:

* input is the **fused qkv projection output** (B, L, 3W) — no
  (B, L, H, D) intermediates ever touch HBM;
* the grid tiles the batch; each program slices per-head q/k/v from
  VMEM, computes scores on the MXU, applies the (optional causal) mask
  + fp32 softmax on the VPU, and writes only the (TB, L, W) context
  back;
* the custom VJP recomputes probabilities from saved row-LSE
  (flash-attention style) and emits the (B, L, 3W) qkv gradient in the
  same fused layout.

Numerics match the einsum path in
:class:`sparsify_clip_tpu.models.layers.MultiHeadAttention` (fp32
scores/softmax) to fp32 tolerance; values and grads are tested in
interpreter mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _scores(q, k, scale):
    # (TB, L, D) x (TB, L, D) -> (TB, L, L), batched over TB
    return jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale


def _pv(p, v):
    # (TB, L, L) x (TB, L, D) -> (TB, L, D)
    return jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(qkv_ref, out_ref, lse_ref, *, heads: int, causal: bool, seq: int):
    tb, l, w3 = qkv_ref.shape
    width = w3 // 3
    head_dim = width // heads
    scale = head_dim ** -0.5
    qkv = qkv_ref[:]

    col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    invalid = col >= seq  # padded key positions
    if causal:
        invalid = invalid | (col > row)
    neg = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    for h in range(heads):
        q = qkv[:, :, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, :, width + h * head_dim: width + (h + 1) * head_dim]
        v = qkv[:, :, 2 * width + h * head_dim: 2 * width + (h + 1) * head_dim]
        s = _scores(q.astype(jnp.float32), k.astype(jnp.float32), scale) + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        p = e / denom
        ctx = _pv(p, v.astype(jnp.float32))
        out_ref[:, :, h * head_dim:(h + 1) * head_dim] = ctx.astype(out_ref.dtype)
        lse_ref[:, :, h] = (m + jnp.log(denom))[:, :, 0]


def _bwd_kernel(
    qkv_ref, lse_ref, dout_ref, dqkv_ref, *, heads: int, causal: bool, seq: int
):
    tb, l, w3 = qkv_ref.shape
    width = w3 // 3
    head_dim = width // heads
    scale = head_dim ** -0.5
    qkv = qkv_ref[:]
    dout = dout_ref[:].astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    invalid = col >= seq
    if causal:
        invalid = invalid | (col > row)
    neg = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    for h in range(heads):
        q = qkv[:, :, h * head_dim:(h + 1) * head_dim].astype(jnp.float32)
        k = qkv[:, :, width + h * head_dim: width + (h + 1) * head_dim].astype(jnp.float32)
        v = qkv[:, :, 2 * width + h * head_dim: 2 * width + (h + 1) * head_dim].astype(jnp.float32)
        do = dout[:, :, h * head_dim:(h + 1) * head_dim]

        s = _scores(q, k, scale) + neg
        p = jnp.exp(s - lse_ref[:, :, h][:, :, None])

        # dv = p^T @ do   (TB, L, L)^T x (TB, L, D)
        dv = jax.lax.dot_general(
            p, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dp = do @ v^T
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # softmax bwd: ds = p * (dp - rowsum(dp * p))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # dq = ds @ k * scale ; dk = ds^T @ q * scale
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale

        dt = dqkv_ref.dtype
        dqkv_ref[:, :, h * head_dim:(h + 1) * head_dim] = dq.astype(dt)
        dqkv_ref[:, :, width + h * head_dim: width + (h + 1) * head_dim] = dk.astype(dt)
        dqkv_ref[:, :, 2 * width + h * head_dim: 2 * width + (h + 1) * head_dim] = (
            dv.astype(dt)
        )


def _pick_tile(batch: int, seq: int, w3: int, itemsize: int) -> int:
    """Largest batch tile whose qkv block stays within a VMEM budget
    (~3MB for the input block; in+out+per-head temps must fit 16M)."""
    budget = 3 * 1024 * 1024
    for tb in (16, 8, 4, 2, 1):
        if batch % tb == 0 and tb * seq * w3 * itemsize <= budget:
            return tb
    return 1


def _run_fwd(qkv: jnp.ndarray, heads: int, causal: bool):
    b, l, w3 = qkv.shape
    width = w3 // 3
    tb = _pick_tile(b, l, w3, qkv.dtype.itemsize)
    grid = (b // tb,)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, causal=causal, seq=l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, l, w3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, l, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, l, heads), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, width), qkv.dtype),
            jax.ShapeDtypeStruct((b, l, heads), jnp.float32),
        ],
    )(qkv)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def mha_pallas(qkv: jnp.ndarray, heads: int, causal: bool = False) -> jnp.ndarray:
    """Fused MHA over a packed (B, L, 3·W) qkv tensor → (B, L, W) context."""
    out, _ = _run_fwd(qkv, heads, causal)
    return out


def _vjp_fwd(qkv, heads, causal):
    out, lse = _run_fwd(qkv, heads, causal)
    return out, (qkv, lse)


def _vjp_bwd(heads, causal, residuals, g):
    qkv, lse = residuals
    b, l, w3 = qkv.shape
    tb = _pick_tile(b, l, w3, qkv.dtype.itemsize)
    grid = (b // tb,)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, causal=causal, seq=l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, l, w3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, l, heads), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, l, w3 // 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, l, w3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, w3), qkv.dtype),
    )(qkv, lse, g)
    return (dqkv,)


mha_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def mha_pallas_sharded(qkv: jnp.ndarray, heads: int, causal: bool = False) -> jnp.ndarray:
    """Mesh-aware wrapper: under a traced abstract mesh with a >1 data
    axis, run the kernel per-shard via shard_map (attention is
    batch-parallel).  Without this, XLA treats the unpartitioned custom
    call as replicated and ALL-GATHERS the whole global batch into every
    chip at every layer.  Requires the enclosing jit to be traced under
    ``jax.sharding.set_mesh`` (the train step does this)."""
    am = jax.sharding.get_abstract_mesh()
    if (
        am is not None
        and not am.empty
        and "data" in am.axis_names
        and dict(am.shape).get("data", 1) > 1
    ):
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            functools.partial(mha_pallas, heads=heads, causal=causal),
            mesh=am,
            in_specs=P("data"),
            out_specs=P("data"),
            # pallas_call out_shapes don't carry vma annotations
            check_vma=False,
        )
        return fn(qkv)
    return mha_pallas(qkv, heads, causal)


def attention_core(
    qkv: jnp.ndarray,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Backend-aware attention core used by the towers: Pallas on TPU,
    einsum elsewhere.  ``qkv`` is the packed projection output."""
    if use_pallas and mask is None and jax.default_backend() == "tpu":
        return mha_pallas_sharded(qkv, heads, causal)
    # reference einsum path (identical math)
    b, l, w3 = qkv.shape
    width = w3 // 3
    head_dim = width // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, heads, head_dim)
    k = k.reshape(b, l, heads, head_dim)
    v = v.reshape(b, l, heads, head_dim)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (head_dim ** -0.5)
    if causal:
        neg = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
        scores = scores + neg
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, width)
