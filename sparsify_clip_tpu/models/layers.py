"""Shared transformer building blocks (flax linen).

TPU-first conventions used throughout the model zoo:

* params live in fp32; matmul-heavy compute runs in a configurable
  ``dtype`` (bf16 for the reference's "fp16: True" path — the MXU's
  native input type);
* LayerNorm and attention softmax always compute in fp32 (bf16
  accumulation there visibly degrades CLIP training);
* the attention core runs as a fused Pallas kernel on TPU
  (:mod:`sparsify_clip_tpu.ops.pallas_attention`) — XLA's lowering at
  CLIP sequence lengths round-trips padded (B, L, H, 64) tensors and
  fp32 scores through HBM, measured at ~25-45% of the train step;
* weights are stored in (in, out) layout via ``nn.Dense`` so tensor
  parallelism is a pure sharding annotation (see
  :mod:`sparsify_clip_tpu.parallel.mesh`).

Functional equivalent of the reference's external open_clip towers
(consumed at sparsify_clip.py:685-689).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


def resolve_remat_policy(name: Optional[str]):
    """Map a config string to a ``jax.checkpoint`` rematerialization
    policy (None = recompute everything, the jax default).

    * ``"nothing"``/``"full"``/None — save nothing, recompute the whole
      block (the round-2 behavior; max memory savings, max recompute);
    * ``"dots"`` — save every dot_general result (matmuls + attention
      einsums), recompute only elementwise ops;
    * ``"dots_no_batch"`` — save dot_generals with no batch dims (the
      dense projections), recompute batched attention einsums;
    * ``"attn_out"`` — save each block's attention output (tagged via
      ``checkpoint_name`` below), recompute everything else — the
      "save attention, recompute MLP" middle ground.

    Policies change what the backward pass recomputes, never the math.
    """
    if name in (None, "nothing", "full"):
        return None
    table = {
        "dots": jax.checkpoint_policies.checkpoint_dots,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "attn_out": jax.checkpoint_policies.save_only_these_names("attn_out"),
    }
    if name not in table:
        raise ValueError(
            f"Unknown remat_policy {name!r}; choose from "
            f"{['nothing', *table]}"
        )
    return table[name]


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32 by default (bf16 statistics
    measurably cost quality in CLIP runs).  ``fp32=False`` exists for
    experimentation but measured NO speedup on v5e — XLA fuses the
    dtype conversions into the surrounding reductions for free."""

    epsilon: float = 1e-5
    fp32: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.fp32:
            return nn.LayerNorm(epsilon=self.epsilon, dtype=x.dtype, name="ln")(x)
        orig_dtype = x.dtype
        out = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32)
        )
        return out.astype(orig_dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — OpenAI CLIP's activation; open_clip's
    plain "RN50"/"ViT-B-32" configs (the ones the reference
    instantiates) use exact (erf) GELU instead, so this is only wired
    up for the ``*-quickgelu`` registry names."""
    return x * nn.sigmoid(1.702 * x)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """GELU matching torch ``nn.GELU()`` (exact erf — what open_clip's
    plain model configs compute) wherever the dtype can represent the
    difference.

    flax's ``nn.gelu`` defaults to the tanh approximation, a standing
    ~3e-4 absolute delta vs the reference's erf GELU that the torch
    interop tests would trip on.  In fp32 we therefore compute erf.
    In bfloat16 the erf lowering measurably costs ~11 ms on the
    ViT-B/32 bs256 train step (2,573 → 2,291 pairs/s, measured round
    4) while the 3e-4 difference sits ~26× below bf16's own ~0.8%
    quantization step — so the bf16 compute path keeps the tanh form:
    numerically indistinguishable at that precision, and free.  fp32
    surfaces (eval twins, interop, numerics goldens) get exact erf.
    """
    if x.dtype == jnp.bfloat16:
        return nn.gelu(x, approximate=True)
    return nn.gelu(x, approximate=False)


class MultiHeadAttention(nn.Module):
    """Self-attention with a fused qkv projection (CLIP's in_proj layout).

    The attention core (scores → fp32 softmax → context) runs as a
    fused Pallas kernel on TPU — the packed (B, L, 3W) qkv never gets
    re-laid-out into padded (B, L, H, 64) HBM intermediates — and as
    the equivalent einsum elsewhere
    (:func:`sparsify_clip_tpu.ops.pallas_attention.attention_core`).
    """

    width: int
    heads: int
    dtype: Dtype = jnp.float32
    causal: bool = False
    fused: bool = True

    @nn.compact
    def __call__(
        self, x: Optional[jnp.ndarray] = None, qkv: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Either ``x`` (the in_proj Dense runs here) or a precomputed
        ``qkv`` (the block's fused LN+qkv kernel already produced it —
        apply mode only; the in_proj params were created at init)."""
        from sparsify_clip_tpu.ops.pallas_attention import attention_core

        if qkv is None:
            qkv = nn.Dense(
                3 * self.width,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(self.width ** -0.5),
                name="in_proj",
            )(x)
        out = attention_core(
            qkv, self.heads, causal=self.causal, use_pallas=self.fused
        ).astype(self.dtype)
        return nn.Dense(
            self.width,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(self.width ** -0.5),
            name="out_proj",
        )(out)


class MLP(nn.Module):
    width: int
    expansion: int = 4
    # Explicit hidden width; overrides width*expansion when set (the
    # LAION ViT-g/bigG towers use non-4x ratios: 6144/1408, 8192/1664).
    mlp_hidden: Optional[int] = None
    dtype: Dtype = jnp.float32
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu_exact

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = nn.Dense(
            self.mlp_hidden or self.width * self.expansion,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal((2 * self.width) ** -0.5),
            name="c_fc",
        )(x)
        hidden = self.act(hidden)
        return nn.Dense(
            self.width,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(self.width ** -0.5),
            name="c_proj",
        )(hidden)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block: x += attn(ln(x)); x += mlp(ln(x))."""

    width: int
    heads: int
    mlp_hidden: Optional[int] = None
    dtype: Dtype = jnp.float32
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu_exact
    causal: bool = False
    ln_fp32: bool = True
    # Fuse ln_1 into the qkv projection (ops/pallas_ln_qkv): the
    # normalized activation never round-trips HBM.  Forward-only fusion
    # (backward = the unfused path's exact grads); requires fp32 LN and
    # takes effect in apply mode only — init always runs the unfused
    # path so the param tree is identical either way.  A/B measured in
    # BASELINE.md (VERDICT r4 #3a).
    fused_ln_qkv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mha = MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype, causal=self.causal,
            name="attn",
        )
        if self.fused_ln_qkv and self.ln_fp32 and not self.is_initializing():
            from sparsify_clip_tpu.ops.pallas_ln_qkv import ln_qkv_core

            ln_p = self.scope.get_variable("params", "ln_1")["ln"]
            proj = self.scope.get_variable("params", "attn")["in_proj"]
            qkv = ln_qkv_core(
                x, ln_p["scale"], ln_p["bias"], proj["kernel"], proj["bias"],
                epsilon=1e-5, dtype=self.dtype,
            )
            attn = mha(qkv=qkv)
        else:
            attn = mha(LayerNorm(fp32=self.ln_fp32, name="ln_1")(x))
        # identity tag for the "attn_out" selective-remat policy
        # (resolve_remat_policy); free outside remat
        x = x + checkpoint_name(attn, "attn_out")
        x = x + MLP(self.width, mlp_hidden=self.mlp_hidden,
                    dtype=self.dtype, act=self.act, name="mlp")(
            LayerNorm(fp32=self.ln_fp32, name="ln_2")(x)
        )
        return x


class _ScanBlock(nn.Module):
    """Carry-signature adapter so ``nn.scan`` can loop one
    :class:`ResidualAttentionBlock` over a stacked parameter tree."""

    width: int
    heads: int
    mlp_hidden: Optional[int] = None
    dtype: Dtype = jnp.float32
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu_exact
    causal: bool = False
    ln_fp32: bool = True
    fused_ln_qkv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, _) -> tuple:
        y = ResidualAttentionBlock(
            self.width, self.heads, mlp_hidden=self.mlp_hidden,
            dtype=self.dtype, act=self.act, causal=self.causal,
            ln_fp32=self.ln_fp32, fused_ln_qkv=self.fused_ln_qkv,
            name="block",
        )(x)
        return y, None


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    mlp_hidden: Optional[int] = None
    dtype: Dtype = jnp.float32
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu_exact
    # Causal (autoregressive) attention — the text tower's mask.
    causal: bool = False
    ln_fp32: bool = True
    # Fuse each block's ln_1 into its qkv projection on TPU
    # (ops/pallas_ln_qkv; forward-only fusion, identical param tree).
    fused_ln_qkv: bool = False
    # Rematerialize each block in the backward pass (memory for
    # recompute).  With the fused attention kernel, ViT-B/32 trains at
    # 1024/chip on 16G HBM without this; enable for larger batches.
    remat: bool = False
    # Selective remat policy name (resolve_remat_policy): what the
    # backward pass may keep instead of recomputing.  Only read when
    # remat is on.
    remat_policy: Optional[str] = None
    # lax.scan over layers instead of the unrolled python loop: ONE
    # traced/compiled block body regardless of depth, params stacked
    # (layers, ...).  The compile-time/HLO-size lever for the 32-48
    # layer towers (ViT-H/g/bigG); per-layer math is identical —
    # tests/test_scan_layers.py pins scan == unrolled given repacked
    # params.  Param tree changes (resblock_i → layers_scan/block with
    # a leading layer axis), so torch interop and existing checkpoints
    # require the unrolled layout.
    scan_layers: bool = False
    # GPipe pipeline parallelism over the mesh 'model' axis
    # (parallel/pipeline.py): >1 splits the scan-layout block stack into
    # that many stages, one per 'model'-axis member.  Requires
    # scan_layers and a mesh whose model-axis size equals the stage
    # count.  Per-(microbatch, stage) remat replaces block remat here.
    pipeline_stages: int = 1
    # Microbatches per pipeline pass; None → one per stage.
    pipeline_microbatches: Optional[int] = None
    # The jax.sharding.Mesh the pipeline shard_maps over (required when
    # pipeline_stages > 1; hashable, so safe as a module attribute).
    pipeline_mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.pipeline_stages > 1 and not self.is_initializing():
            return self._pipelined(x)
        if self.scan_layers:
            body = _ScanBlock
            if self.remat:
                # prevent_cse is unnecessary (and costly) under scan
                body = nn.remat(
                    _ScanBlock,
                    policy=resolve_remat_policy(self.remat_policy),
                    prevent_cse=False,
                )
            scan = nn.scan(
                body,
                variable_axes={"params": 0},   # stack params per layer
                split_rngs={"params": True},   # distinct init per layer
                length=self.layers,
            )
            x, _ = scan(
                self.width, self.heads, mlp_hidden=self.mlp_hidden,
                dtype=self.dtype, act=self.act, causal=self.causal,
                ln_fp32=self.ln_fp32, fused_ln_qkv=self.fused_ln_qkv,
                name="layers_scan",
            )(x, None)
            return x

        block_cls = ResidualAttentionBlock
        if self.remat:
            block_cls = nn.remat(
                ResidualAttentionBlock,
                policy=resolve_remat_policy(self.remat_policy),
            )
        # Unrolled python loop (default): 12-24 blocks trace fast and
        # XLA pipelines them; scan-over-layers pays off at 32+ layers.
        for i in range(self.layers):
            x = block_cls(
                self.width, self.heads, mlp_hidden=self.mlp_hidden,
                dtype=self.dtype, act=self.act,
                causal=self.causal, ln_fp32=self.ln_fp32,
                fused_ln_qkv=self.fused_ln_qkv, name=f"resblock_{i}",
            )(x)
        return x

    def _pipelined(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply the block stack as a GPipe pipeline over the mesh
        'model' axis (parallel/pipeline.py).  Init always runs the
        nn.scan path (which creates the stacked params this branch
        reads); per-layer math is identical, so pipeline == scan ==
        unrolled to numerical exactness (tests/test_pipeline.py)."""
        from sparsify_clip_tpu.parallel.pipeline import gpipe_apply

        if not self.scan_layers:
            raise ValueError(
                "pipeline_stages > 1 requires scan_layers=True (the "
                "stacked (layers, ...) param layout is the stage split)"
            )
        if self.pipeline_mesh is None:
            raise ValueError("pipeline_stages > 1 requires pipeline_mesh")
        stacked = self.scope.get_variable("params", "layers_scan")
        block = ResidualAttentionBlock(
            self.width, self.heads, mlp_hidden=self.mlp_hidden,
            dtype=self.dtype, act=self.act, causal=self.causal,
            ln_fp32=self.ln_fp32,
        )

        def stage_fn(local_params, xm):
            def body(carry, layer_params):
                return block.apply({"params": layer_params["block"]}, carry), None

            y, _ = jax.lax.scan(body, xm, local_params)
            return y

        return gpipe_apply(
            stage_fn, stacked, x, self.pipeline_mesh,
            n_micro=self.pipeline_microbatches,
        )
