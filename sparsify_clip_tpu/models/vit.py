"""Vision Transformer tower (ViT-B/32 family).

Capability equivalent of open_clip's VisionTransformer (the north-star
``model: "ViT-B-32"`` configuration; reachable in the reference by
changing the ``model`` key consumed at sparsify_clip.py:686).

Layout is NHWC (TPU-native); the patchify conv is a single strided
convolution that XLA lowers onto the MXU.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from sparsify_clip_tpu.models.layers import LayerNorm, Transformer, gelu_exact


class VisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    # Non-4x MLP hidden width (ViT-g/bigG); None → width*4.
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
    scan_layers: bool = False
    # GPipe stages over the mesh 'model' axis (parallel/pipeline.py).
    pipeline_stages: int = 1
    pipeline_microbatches: Any = None
    pipeline_mesh: Any = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) float → (B, embed_dim) unnormalized."""
        b = images.shape[0]
        grid = self.image_size // self.patch_size
        scale = self.width ** -0.5

        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(images.astype(self.dtype))
        x = x.reshape(b, grid * grid, self.width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (self.width,), jnp.float32
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (grid * grid + 1, self.width),
            jnp.float32,
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype), (b, 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding.astype(self.dtype)

        x = LayerNorm(name="ln_pre")(x)
        x = Transformer(
            self.width, self.layers, self.heads, mlp_hidden=self.mlp_hidden,
            dtype=self.dtype, act=self.act,
            remat=self.remat, remat_policy=self.remat_policy,
            ln_fp32=self.ln_fp32, fused_ln_qkv=self.fused_ln_qkv,
            scan_layers=self.scan_layers,
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
            pipeline_mesh=self.pipeline_mesh,
            name="transformer",
        )(x)
        x = LayerNorm(name="ln_post")(x[:, 0, :])

        proj = self.param(
            "proj", nn.initializers.normal(scale), (self.width, self.embed_dim), jnp.float32
        )
        return jnp.dot(x, proj.astype(self.dtype)).astype(jnp.float32)
