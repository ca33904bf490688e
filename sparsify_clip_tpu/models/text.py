"""CLIP text tower: token embedding + causal transformer + EOT pooling.

Capability equivalent of open_clip's text transformer as instantiated
by the reference (sparsify_clip.py:685-692): vocab 49408, context 77,
width 512, 8 heads, 12 layers for both the RN50 and ViT-B/32 configs;
the pooled feature is the ln_final output at the EOT position (the
argmax of token ids — EOT is the largest id), projected to the joint
embedding dim.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from sparsify_clip_tpu.models.layers import LayerNorm, Transformer, gelu_exact


class TextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    # Non-4x MLP hidden width (ViT-bigG's text tower); None → width*4.
    mlp_hidden: Any = None
    embed_dim: int = 512
    dtype: Any = jnp.float32
    act: Callable[[jnp.ndarray], jnp.ndarray] = gelu_exact
    remat: bool = False
    remat_policy: Any = None
    ln_fp32: bool = True
    # Fuse each block's ln_1 into its qkv projection on TPU
    # (ops/pallas_ln_qkv).
    fused_ln_qkv: bool = False
    # Token-embedding lookup as a one-hot matmul instead of a gather
    # (BASELINE.md A/B, VERDICT r4 #3b): forward becomes a
    # (B·L, V)×(V, W) matmul on the MXU and the backward a dense
    # transpose matmul instead of a scatter-add into the (V, W) table.
    onehot_embed: bool = False
    scan_layers: bool = False
    # GPipe stages over the mesh 'model' axis (parallel/pipeline.py).
    pipeline_stages: int = 1
    pipeline_microbatches: Any = None
    pipeline_mesh: Any = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens: (B, context_length) int32 → (B, embed_dim) unnormalized."""
        b, l = tokens.shape
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        if self.onehot_embed:
            onehot = jax.nn.one_hot(
                tokens.reshape(-1), self.vocab_size, dtype=self.dtype
            )
            x = jnp.dot(
                onehot, token_embedding.astype(self.dtype)
            ).reshape(b, l, self.width)
        else:
            x = token_embedding[tokens].astype(self.dtype)
        x = x + positional_embedding[:l].astype(self.dtype)
        x = Transformer(
            self.width, self.layers, self.heads, mlp_hidden=self.mlp_hidden,
            dtype=self.dtype, act=self.act,
            causal=True, remat=self.remat, remat_policy=self.remat_policy,
            ln_fp32=self.ln_fp32, fused_ln_qkv=self.fused_ln_qkv,
            scan_layers=self.scan_layers,
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
            pipeline_mesh=self.pipeline_mesh,
            name="transformer",
        )(x)
        x = LayerNorm(name="ln_final")(x)

        # Pool at the EOT token: argmax works because EOT is the highest
        # token id the tokenizer ever emits.
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eot_idx]

        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        return jnp.dot(pooled, text_projection.astype(self.dtype)).astype(jnp.float32)
