"""Modified ResNet vision tower (RN50 family).

Capability equivalent of CLIP's "ModifiedResNet" — the architecture
every shipped reference config instantiates (``model: "RN50"``,
consumed at sparsify_clip.py:686).  Differences from a vanilla ResNet,
reproduced here:

* 3-conv "stem" (3→w/2→w/2→w channels, first conv stride 2) followed
  by a 2×2 average pool instead of max pool;
* anti-aliased downsampling: stride-2 convolutions are replaced by
  stride-1 conv + average pool, both in the residual branch and the
  shortcut;
* the final pooling is a multi-head **attention pool** with a learned
  positional embedding and the spatial mean as the query.

Layout NHWC; BatchNorm runs over the global batch under jit (the
reference's effective semantics: a single device sees the whole batch,
SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class BatchNormHalf(nn.Module):
    """BatchNorm with fp32 statistics and compute-dtype normalization.

    ``nn.BatchNorm(dtype=fp32)`` materializes an fp32 output for every
    activation tensor, which doubles the HBM traffic of a bf16 conv
    tower (BN output feeds the next conv, which reads it back just to
    cast to bf16).  Here the mean/var reductions accumulate in fp32 —
    XLA fuses the cast into the reduce, so no fp32 tensor is ever
    materialized — running statistics live in fp32 (torch parity for
    checkpoint interop), and the normalization itself folds into a
    single per-channel multiply-add in the compute dtype, fusable into
    the producing conv's epilogue.

    Same param/batch_stats tree names as ``nn.BatchNorm``
    (scale/bias, mean/var), same momentum convention
    (``ra = m*ra + (1-m)*batch``) and the same E[x²]−E[x]² "fast
    variance" flax defaults to, so this is a drop-in swap.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        return x.astype(self.dtype) * inv.astype(self.dtype) + shift.astype(
            self.dtype
        )


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        def bn(name):
            return BatchNormHalf(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=name,
            )

        out_ch = self.planes * self.expansion
        identity = x

        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
        )(out)
        out = nn.relu(bn("bn2")(out))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)

        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                identity = nn.avg_pool(
                    identity, (self.stride, self.stride), (self.stride, self.stride)
                )
            identity = nn.Conv(
                out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="downsample_conv"
            )(identity)
            identity = bn("downsample_bn")(identity)

        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Spatial attention pooling: query = mean over positions."""

    embed_dim: int  # channel width of the incoming feature map
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hw = h * w
        x = x.reshape(b, hw, c)
        mean = jnp.mean(x, axis=1, keepdims=True)
        x = jnp.concatenate([mean, x], axis=1)  # (B, HW+1, C), mean first

        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(c ** -0.5),
            (hw + 1, c),
            jnp.float32,
        )
        x = x + positional_embedding.astype(x.dtype)

        head_dim = c // self.num_heads
        scale = head_dim ** -0.5
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)

        q = q.reshape(b, 1, self.num_heads, head_dim)
        k = k.reshape(b, hw + 1, self.num_heads, head_dim)
        v = v.reshape(b, hw + 1, self.num_heads, head_dim)

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, 1, c)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)  # RN50
    width: int = 64
    image_size: int = 224
    embed_dim: int = 1024
    heads: int = 32  # attnpool heads = width * 32 // 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """images: (B, H, W, 3) → (B, embed_dim) unnormalized."""

        def bn(name):
            return BatchNormHalf(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=name,
            )

        x = images.astype(self.dtype)
        # 3-conv stem
        x = nn.Conv(
            self.width // 2, (3, 3), strides=2, padding=1, use_bias=False,
            dtype=self.dtype, name="stem_conv1",
        )(x)
        x = nn.relu(bn("stem_bn1")(x))
        x = nn.Conv(
            self.width // 2, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="stem_conv2",
        )(x)
        x = nn.relu(bn("stem_bn2")(x))
        x = nn.Conv(
            self.width, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="stem_conv3",
        )(x)
        x = nn.relu(bn("stem_bn3")(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        planes = self.width
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for block in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if block == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train=train)
            planes *= 2

        # final width = width * 32 (2048 for RN50)
        return AttentionPool2d(
            embed_dim=self.width * 32,
            num_heads=self.heads,
            output_dim=self.embed_dim,
            dtype=self.dtype,
            name="attnpool",
        )(x).astype(jnp.float32)
