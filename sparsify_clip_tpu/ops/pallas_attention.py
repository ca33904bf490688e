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
* long sequences (e.g. ViT-L/14-336's 577 visual tokens, whose qkv
  block exceeds the scoped-vmem stack even at batch-tile 1) move to a
  **(batch, head-group) grid**: each program streams a 128-lane group
  of heads' q/k/v slices (Mosaic requires lane blocks in 128-lane
  units), so the stack holds one group's score temps instead of every
  head's (``_use_per_head``).  The head-group backward recomputes the
  softmax from q/k directly instead of loading saved LSE — a per-head
  LSE output block would be (TB, L, 1), which Mosaic cannot lower;
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

from sparsify_clip_tpu.ops._overrides import flag_override

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


_QKV_BUDGET = 3 * 1024 * 1024


def _pick_tile(batch: int, seq: int, w3: int, itemsize: int) -> int:
    """Largest batch tile whose qkv block stays within a VMEM budget
    (~3MB for the input block; in+out+per-head temps must fit 16M)."""
    for tb in (16, 8, 4, 2, 1):
        if batch % tb == 0 and tb * seq * w3 * itemsize <= _QKV_BUDGET:
            return tb
    return 1


def _lane_group(width: int, head_dim: int) -> int:
    """Lane width of one head-group block: the smallest multiple of
    head_dim that Mosaic can tile (128 lanes), capped at the tower
    width (interpret-mode tests use sub-128 widths)."""
    if head_dim % 128 == 0:
        return head_dim
    return min(width, head_dim * max(1, 128 // head_dim))


def _use_per_head(l: int, w3: int, itemsize: int, heads: int) -> bool:
    """Route long sequences to the (batch, head-group) grid.

    The whole-width kernel keeps the full qkv block plus every head's
    fp32 score temps on the kernel stack; past ~3MB of qkv block even
    at batch-tile 1 (e.g. the 577-token ViT-L/14-336 vision tower)
    Mosaic's 16MB scoped-vmem stack overflows at compile time.  The
    head-group grid streams a 128-lane group of heads per program
    instead.  Mosaic only lowers lane blocks that are 128-multiples,
    so head_dim must pack into 128 lanes exactly (64 or 128; the
    odd-head-dim towers like g-14's 88 never exceed the budget — they
    are 257-token towers)."""
    width = w3 // 3
    head_dim = width // heads
    if l * w3 * itemsize <= _QKV_BUDGET:
        return False
    if head_dim % 128 == 0:
        return True
    return 128 % head_dim == 0 and width % 128 == 0


def _pick_tile_per_head(batch: int, seq: int, hpb: int) -> int:
    """Batch tile for the head-group grid: ~4 live (tb, L, L) fp32
    score temps per unrolled head must fit comfortably under the
    scoped-vmem stack."""
    budget = 10 * 1024 * 1024
    for tb in (16, 8, 4, 2, 1):
        if batch % tb == 0 and tb * seq * seq * 16 * hpb <= budget:
            return tb
    return 1


def _fwd_kernel_head_group(q_ref, k_ref, v_ref, out_ref, *,
                           causal: bool, seq: int, head_dim: int):
    _, l, lane = q_ref.shape
    scale = head_dim ** -0.5

    col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    invalid = col >= seq
    if causal:
        invalid = invalid | (col > row)
    neg = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    for h in range(lane // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[:, :, sl].astype(jnp.float32)
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        s = _scores(q, k, scale) + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        ctx = _pv(e / jnp.sum(e, axis=-1, keepdims=True), v)
        out_ref[:, :, sl] = ctx.astype(out_ref.dtype)


def _bwd_kernel_head_group(q_ref, k_ref, v_ref, dout_ref,
                           dq_ref, dk_ref, dv_ref, *,
                           causal: bool, seq: int, head_dim: int):
    _, l, lane = q_ref.shape
    scale = head_dim ** -0.5

    col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    invalid = col >= seq
    if causal:
        invalid = invalid | (col > row)
    neg = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    for h in range(lane // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[:, :, sl].astype(jnp.float32)
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        do = dout_ref[:, :, sl].astype(jnp.float32)

        # recompute the softmax (no saved LSE on this path)
        s = _scores(q, k, scale) + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        dv = jax.lax.dot_general(
            p, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale

        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _head_group_specs(tb, l, n_groups, lane):
    """q/k/v input specs slicing the packed (B, L, 3·width) qkv at one
    head-group's offsets (block index units of ``lane``)."""
    return [
        pl.BlockSpec((tb, l, lane), lambda i, g: (i, 0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, l, lane), lambda i, g: (i, 0, n_groups + g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, l, lane), lambda i, g: (i, 0, 2 * n_groups + g),
                     memory_space=pltpu.VMEM),
    ]


def _run_fwd_per_head(qkv: jnp.ndarray, heads: int, causal: bool):
    b, l, w3 = qkv.shape
    width = w3 // 3
    head_dim = width // heads
    lane = _lane_group(width, head_dim)
    n_groups = width // lane
    tb = _pick_tile_per_head(b, l, lane // head_dim)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_head_group, causal=causal, seq=l, head_dim=head_dim
        ),
        grid=(b // tb, n_groups),
        in_specs=_head_group_specs(tb, l, n_groups, lane),
        out_specs=pl.BlockSpec((tb, l, lane), lambda i, g: (i, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, width), qkv.dtype),
    )(qkv, qkv, qkv)
    # no LSE residual on this path: the backward recomputes the softmax
    return out, None


def _run_fwd(qkv: jnp.ndarray, heads: int, causal: bool):
    b, l, w3 = qkv.shape
    if _use_per_head(l, w3, qkv.dtype.itemsize, heads):
        return _run_fwd_per_head(qkv, heads, causal)
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
    if _use_per_head(l, w3, qkv.dtype.itemsize, heads):
        width = w3 // 3
        head_dim = width // heads
        lane = _lane_group(width, head_dim)
        n_groups = width // lane
        tb = _pick_tile_per_head(b, l, lane // head_dim)
        group_out = pl.BlockSpec((tb, l, lane), lambda i, g: (i, 0, g),
                                 memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_kernel_head_group, causal=causal, seq=l, head_dim=head_dim
            ),
            grid=(b // tb, n_groups),
            in_specs=_head_group_specs(tb, l, n_groups, lane) + [group_out],
            out_specs=[group_out, group_out, group_out],
            out_shape=[jax.ShapeDtypeStruct((b, l, width), qkv.dtype)] * 3,
        )(qkv, qkv, qkv, g)
        # reassemble the packed (B, L, 3W) qkv-gradient layout
        return (jnp.concatenate([dq, dk, dv], axis=-1),)
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
        # Already inside a shard_map (axis types Manual — e.g. the GPipe
        # trunk, parallel/pipeline.py): the batch is device-local here,
        # and nesting another shard_map over 'data' would re-split it.
        and am.axis_types[am.axis_names.index("data")]
        != jax.sharding.AxisType.Manual
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


# Trace-time override: when True, attention_core always takes the
# einsum path even on TPU.  Used by :mod:`sparsify_clip_tpu.export` —
# a serialized artifact with a symbolic batch dimension (or lowered
# for multiple platforms) cannot contain the batch-tiled Pallas grid,
# whose tiling is resolved against concrete shapes at trace time.
_FORCE_XLA_ATTENTION = False
_FORCE_PALLAS_ATTENTION = False

force_pallas_attention = flag_override(
    __name__, "_FORCE_PALLAS_ATTENTION",
    "Trace-time override: attention_core takes the TPU (Pallas) "
    "branch regardless of ``jax.default_backend()``.  For "
    "cross-platform lowering tests that export TPU artifacts from the "
    "CPU host (tests/test_pipeline.py::test_pipelined_trunk_lowers_for_tpu) "
    "— the composition bugs that only bite on the TPU backend (nested "
    "shard_map, vma checks) must be catchable without a chip.",
)

force_xla_attention = flag_override(
    __name__, "_FORCE_XLA_ATTENTION",
    "Routes attention_core to the einsum path for traces performed "
    "inside the ``with`` block (math identical to the Pallas kernel to "
    "fp32 tolerance; see module docstring).",
)


def attention_core(
    qkv: jnp.ndarray,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Backend-aware attention core used by the towers: Pallas on TPU,
    einsum elsewhere.  ``qkv`` is the packed projection output."""
    if (
        use_pallas and not _FORCE_XLA_ATTENTION and mask is None
        and (jax.default_backend() == "tpu" or _FORCE_PALLAS_ATTENTION)
    ):
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
