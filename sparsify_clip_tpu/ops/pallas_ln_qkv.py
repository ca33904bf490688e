"""Pallas TPU kernel: LayerNorm fused into the qkv projection.

In the pre-LN transformer block the only consumer of ``ln_1``'s output
is the fused qkv projection (reference towers: open_clip blocks used at
sparsify_clip.py:685-689).  XLA cannot fuse a reduce-then-normalize
into a matmul *producer*, so the unfused path materializes the
normalized (B·L, W) activation in HBM (one write + one read per block,
per direction).  This kernel computes

    qkv = LN_fp32(x) · W_qkv + b_qkv

with the LayerNorm statistics and normalization living entirely in
VMEM: a row tile of ``x`` is normalized once (fp32, fast-variance —
bit-matching ``models.layers.LayerNorm``), cached in scratch, and
multiplied against column tiles of the weight on the MXU.

The custom VJP recomputes through the XLA reference twin
(:func:`ln_qkv_reference` — same dtype-cast sequence as
``LayerNorm(fp32=True)`` + ``nn.Dense(dtype)``), so gradients are
exactly the unfused path's and the fusion is forward-only: the measured
quantity for the BASELINE.md A/B (VERDICT r4 #3a).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsify_clip_tpu.ops._overrides import flag_override

TM = 512   # row tile (B·L rows) — large enough to fill the MXU pipeline
# bytes for the (W, TN) weight tile: pallas double-buffers input tiles,
# so the effective VMEM cost is ~2× this plus the x/scratch/out tiles —
# 4MB keeps W=1024 towers inside the 16MB scoped limit (W=768 still
# gets the full 3W width resident)
_WEIGHT_VMEM_BUDGET = 4 * 1024 * 1024


def _pick_tiles(n_rows: int, w: int, w3: int, itemsize: int):
    """(tm, tn): prefer the FULL weight width resident in VMEM (one
    column tile → each x row tile is fetched once and the per-program
    matmul is tm×w×w3, a shape the MXU pipelines well); halve tn only
    when the weight tile exceeds the VMEM budget (ViT-g/bigG widths)."""
    tn = w3
    while w * tn * itemsize > _WEIGHT_VMEM_BUDGET and tn % 2 == 0:
        tn //= 2
    tm = TM if n_rows >= TM else 256
    return tm, max(tn, 128)


def _fwd_kernel(x_ref, scale_ref, bias_ref, k_ref, kb_ref, out_ref,
                norm_ref, *, epsilon: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(x, axis=1, keepdims=True)
        # fast variance (mean of squares minus squared mean) — the
        # nn.LayerNorm default the XLA path computes
        var = jnp.mean(x * x, axis=1, keepdims=True) - mean * mean
        y = (x - mean) * jax.lax.rsqrt(var + epsilon)
        y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
        norm_ref[:] = y.astype(norm_ref.dtype)

    out_ref[:] = (
        jnp.dot(norm_ref[:], k_ref[:], preferred_element_type=jnp.float32)
        .astype(out_ref.dtype)
        + kb_ref[:]
    )


def _run_fwd(x2d, scale, bias, kernel, kbias, epsilon, dtype):
    n, w = x2d.shape
    w3 = kernel.shape[1]
    tm, tn = _pick_tiles(n, w, w3, jnp.dtype(dtype).itemsize)
    rem = (-n) % tm
    xp = jnp.pad(x2d, ((0, rem), (0, 0))) if rem else x2d
    npad = xp.shape[0]
    grid = (npad // tm, w3 // tn)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, epsilon=epsilon),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, w3), dtype),
        scratch_shapes=[pltpu.VMEM((tm, w), dtype)],
    )(
        xp,
        scale.reshape(1, w),
        bias.reshape(1, w),
        kernel.astype(dtype),
        kbias.reshape(1, w3).astype(dtype),
    )
    return out[:n]


def ln_qkv_reference(x2d, scale, bias, kernel, kbias, epsilon, dtype):
    """XLA twin with the exact cast sequence of
    ``LayerNorm(fp32=True)(x)`` then ``nn.Dense(dtype)``."""
    x32 = x2d.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
    y = (x32 - mean) * jax.lax.rsqrt(var + epsilon)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = y.astype(x2d.dtype).astype(dtype)
    return jnp.dot(y, kernel.astype(dtype)) + kbias.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ln_qkv_pallas(x2d, scale, bias, kernel, kbias, epsilon, dtype):
    return _run_fwd(x2d, scale, bias, kernel, kbias, epsilon, dtype)


def _vjp_fwd(x2d, scale, bias, kernel, kbias, epsilon, dtype):
    out = _run_fwd(x2d, scale, bias, kernel, kbias, epsilon, dtype)
    return out, (x2d, scale, bias, kernel, kbias)


def _vjp_bwd(epsilon, dtype, residuals, g):
    # gradient of the XLA twin — the fusion is forward-only, so the
    # backward pass (and its numerics) are exactly the unfused path's
    _, vjp = jax.vjp(
        lambda *a: ln_qkv_reference(*a, epsilon, dtype), *residuals
    )
    return vjp(g)


ln_qkv_pallas.defvjp(_vjp_fwd, _vjp_bwd)


_FORCE_PALLAS_LN_QKV = False

force_pallas_ln_qkv = flag_override(
    __name__, "_FORCE_PALLAS_LN_QKV",
    "Trace-time override: ln_qkv_core routes to the Pallas kernel "
    "regardless of jax.default_backend() — for interpret-mode numerics "
    "tests and cross-platform TPU lowering from the CPU host.",
)


def _mesh_blocks_manual_or_single():
    """True when the kernel may be issued directly (single device or
    already inside a fully-manual shard_map)."""
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty or am.size == 1:
        return True
    return all(t == jax.sharding.AxisType.Manual for t in am.axis_types)


def ln_qkv_core(x, scale, bias, kernel, kbias, *, epsilon: float,
                dtype, use_pallas: bool = True):
    """Backend-aware fused LN+qkv: Pallas on TPU, XLA twin elsewhere.

    ``x`` is (B, L, W); returns (B, L, 3W) in ``dtype``.  Under a
    multi-device mesh the rows are batch-parallel, so the kernel runs
    per-shard inside a shard_map over 'data' (mosaic refuses automatic
    partitioning); a model-parallel mesh (TP shards the qkv weight
    columns) falls back to the XLA twin — fusing a TP-sharded weight
    is not this kernel's job.
    """
    b, l, w = x.shape
    x2d = x.reshape(b * l, w)

    route = use_pallas and (
        jax.default_backend() == "tpu" or _FORCE_PALLAS_LN_QKV
    )
    if route:
        if _mesh_blocks_manual_or_single():
            return ln_qkv_pallas(
                x2d, scale, bias, kernel, kbias, epsilon, dtype
            ).reshape(b, l, -1)
        am = jax.sharding.get_abstract_mesh()
        if "data" in am.axis_names and dict(am.shape).get("model", 1) == 1 \
                and b % dict(am.shape)["data"] == 0:
            from jax.sharding import PartitionSpec as P

            fn = jax.shard_map(
                lambda xs, s, bi, k, kb: ln_qkv_pallas(
                    xs, s, bi, k, kb, epsilon, dtype
                ),
                mesh=am,
                in_specs=(P("data"), P(), P(), P(), P()),
                out_specs=P("data"),
                # pallas_call out_shapes carry no vma annotations
                check_vma=False,
            )
            return fn(x2d, scale, bias, kernel, kbias).reshape(b, l, -1)
    return ln_qkv_reference(
        x2d, scale, bias, kernel, kbias, epsilon, dtype
    ).reshape(b, l, -1)
