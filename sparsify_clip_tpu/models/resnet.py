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

import functools
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

    Backward is plain autodiff: a hand-written closed-form training
    VJP was A/B'd on the real chip and measured NEUTRAL on the full
    RN50 step (149.4 vs 148.5 ms — XLA already fuses the stats-path
    cotangent), so it was dropped for simplicity.

    Same param/batch_stats tree names as ``nn.BatchNorm``
    (scale/bias, mean/var), same momentum convention
    (``ra = m*ra + (1-m)*batch``) and the same E[x²]−E[x]² "fast
    variance" flax defaults to.  One deliberate divergence from flax:
    the running **variance** update uses the unbiased n/(n−1) estimate,
    matching ``torch.nn.BatchNorm2d`` (the reference's BN) — torch
    normalizes with the biased batch variance but tracks the unbiased
    one, and train-curve parity is against torch, not flax.
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
                n = x.size // c
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        return x.astype(self.dtype) * inv.astype(self.dtype) + shift.astype(
            self.dtype
        )


class _ConvKernel(nn.Module):
    """Param holder: a 1×1 conv kernel under the standard ``kernel`` path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
            jnp.float32,
        )


class _BNState(nn.Module):
    """Param/state holder with ``nn.BatchNorm``'s tree layout."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        return scale, bias, ra_mean, ra_var


_SPATIAL = (0, 1, 2)  # contract batch+spatial of NHWC


def _conv1x1(x4, w2):
    """1×1 NHWC conv with a (C_in, C_out) kernel — keeps conv layouts
    end to end (a reshape-to-2D matmul forces a physical relayout of
    the conv-tiled activations; measured +1-4 ms per RN50 block)."""
    return jax.lax.conv_general_dilated(
        x4, w2[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _folded_train_impl(eps, x4, w, scale, bias):
    """Forward of the folded conv+BN (training stats from input moments)."""
    n = x4.shape[0] * x4.shape[1] * x4.shape[2]
    m_x = jnp.mean(x4, axis=_SPATIAL, dtype=jnp.float32)  # (K,)
    second = (
        jax.lax.dot_general(
            x4, x4,
            dimension_numbers=((_SPATIAL, _SPATIAL), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        / n
    )  # (K,K) fp32
    # small (K,)/(K,K)-by-(K,C) products at HIGHEST so fp32 mode stays
    # exact (TPU default fp32 matmul is bf16-grade; negligible cost)
    hi = jax.lax.Precision.HIGHEST
    mean = jnp.matmul(m_x, w, precision=hi)
    e2 = jnp.sum(jnp.matmul(second, w, precision=hi) * w, axis=0)
    var = e2 - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    d = inv * scale
    w_folded = (w * d[None, :]).astype(x4.dtype)
    shift = (bias - mean * d).astype(x4.dtype)
    y = _conv1x1(x4, w_folded) + shift
    return y, mean, var, (x4, w, scale, m_x, second, mean, inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _folded_train(eps, x4, w, scale, bias):
    y, mean, var, _ = _folded_train_impl(eps, x4, w, scale, bias)
    return y, mean, var


def _folded_train_fwd(eps, x4, w, scale, bias):
    # symbolic_zeros=True wraps primals in CustomVJPPrimal
    y, mean, var, res = _folded_train_impl(
        eps, x4.value, w.value, scale.value, bias.value
    )
    return (y, mean, var), res


def _folded_train_bwd(eps, res, cts):
    """Analytic BN-through-linear backward with minimal HBM traffic.

    Standard training-mode BN backward is
    ``dh = d·(g − Σg/N − ĥ·Σ(g·ĥ)/N)`` followed by ``dx = dh@Wᵀ`` and
    ``dW = xᵀ@dh`` — three sweeps over the (N, C) tensors plus the
    reductions.  Because ``h = x@W`` and elementwise per-channel scaling
    commutes through the matmul, every reduction collapses onto
    ``t = xᵀ@g`` (one MXU pass) and the rest is (K,K)/(K,C) algebra::

        dx = g@Wfᵀ − x@A + r ,  A = W·diag(q)·Wᵀ  (tiny)
        dW = t·d − m_x⊗(d·s1) − (S@W − m_x⊗mean)·(inv·d·s2)

    so the big tensors (g, x) are read exactly twice each and ``h`` is
    never needed — autodiff of the moment form instead materializes an
    fp32 cotangent of x (measured +6 ms on RN50 layer1).

    Cotangents for the returned (mean, var) must be structurally zero —
    they only feed the running-statistics update, which the caller
    wraps in stop_gradient (matching flax BatchNorm, whose running
    stats are non-differentiable state).  ``symbolic_zeros=True`` makes
    the invariant self-enforcing: a caller that differentiates through
    mean/var delivers a non-SymbolicZero cotangent and gets a loud
    trace-time error instead of silently dropped gradient.
    """
    from jax.custom_derivatives import SymbolicZero

    gy, gmean, gvar = cts
    x4, w, scale, m_x, second, mean, inv = res
    if not (isinstance(gmean, SymbolicZero) and isinstance(gvar, SymbolicZero)):
        raise ValueError(
            "_folded_train's (mean, var) outputs are running-statistics "
            "values whose cotangents this custom VJP structurally "
            "discards; differentiating through them would silently lose "
            "gradient. Wrap the stats update in stop_gradient (as "
            "_conv1x1_bn_folded does)."
        )
    if isinstance(gy, SymbolicZero):
        return (
            jnp.zeros_like(x4),
            jnp.zeros_like(w),
            jnp.zeros_like(scale),
            jnp.zeros_like(scale),
        )
    n = x4.shape[0] * x4.shape[1] * x4.shape[2]
    dt = x4.dtype
    d = inv * scale  # (C,)

    # HIGHEST precision on every small matmul feeding the differenced
    # dW terms: the forward's second moment is HIGHEST, and mixing a
    # bf16-grade t against it would amplify cancellation error in fp32
    # mode (bf16 inputs are unaffected by the flag)
    hi = jax.lax.Precision.HIGHEST
    t = jax.lax.dot_general(
        x4, gy,
        dimension_numbers=((_SPATIAL, _SPATIAL), ((), ())),
        preferred_element_type=jnp.float32,
        precision=hi,
    )  # (K,C)
    s1 = jnp.sum(gy, axis=_SPATIAL, dtype=jnp.float32)  # (C,)
    gh_sum = jnp.sum(w * t, axis=0)  # Σ g·h per channel
    s2 = (gh_sum - mean * s1) * inv  # Σ g·ĥ
    q = inv * d * s2 / n
    a_small = jnp.matmul(w * q[None, :], w.T, precision=hi)  # (K,K)
    r = jnp.matmul(w, mean * q - d * s1 / n, precision=hi)  # (K,)
    w_folded = w * d[None, :]

    dx = (
        _conv1x1(gy, w_folded.astype(dt).T)
        - _conv1x1(x4, a_small.astype(dt))
        + r.astype(dt)
    )
    sw = jnp.matmul(second, w, precision=hi)
    dw = (
        t * d[None, :]
        - jnp.outer(m_x, d * s1)
        - (sw - jnp.outer(m_x, mean)) * (inv * d * s2)[None, :]
    )
    return dx, dw, s2, s1


_folded_train.defvjp(_folded_train_fwd, _folded_train_bwd, symbolic_zeros=True)


def _conv1x1_bn_folded(
    parent: nn.Module,
    x: jnp.ndarray,
    features: int,
    conv_name: str,
    bn_name: str,
    train: bool,
    dtype: Dtype,
    momentum: float = 0.9,
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """1×1 conv + BatchNorm with the norm folded into the conv weights.

    ``h = x @ W`` is linear, so BatchNorm's batch statistics over ``h``
    are functions of the *input's* first and second moments::

        mean(h)_o  = mean(x) @ W[:, o]
        E[h²]_o    = W[:, o]ᵀ · E[x xᵀ] · W[:, o]
        var        = E[h²] − mean(h)²          (flax's "fast variance")

    ``E[x xᵀ]`` is a (C_in, C_in) matmul over the batch — for the
    bottleneck's expanding conv (C_out = 4·C_in) that is 25% of the
    conv's own FLOPs — after which the normalization is a per-output-
    channel affine that folds into the conv kernel.  The conv output
    ``h`` is therefore **never materialized**: at layer1 of RN50 that
    deletes an HBM write+read of the block's largest tensor (411 MB at
    bs256) per block in forward, and the BN backward reductions over it
    (autodiff of this form reads only the small moments).  Same math as
    conv→BN (reassociated sums; exact in fp32 to ~1e-6), same parameter
    tree (``{conv_name}/kernel``, ``{bn_name}/{scale,bias}`` +
    batch_stats) so checkpoints/torch-interop are unchanged.

    Replaces the reference's conv3+bn3 and downsample conv+bn pairs
    inside every bottleneck (open_clip ModifiedResNet, instantiated at
    /root/reference/sparsify_clip.py:686).  Measured A/B on v5e
    (scripts/bench_fold.py, bs256): layer1 mid block 11.5→9.0 ms
    fwd+bwd, layer2 mid block 6.7→5.5 ms.
    """

    kernel = _ConvKernel(x.shape[-1], features, name=conv_name)()
    scale, bias, ra_mean, ra_var = _BNState(features, name=bn_name)()

    w = kernel[0, 0]  # (C_in, C_out) fp32
    x4 = x.astype(dtype)
    if train:
        y, mean, var = _folded_train(epsilon, x4, w, scale, bias)
        if not parent.is_initializing():
            n = x4.shape[0] * x4.shape[1] * x4.shape[2]
            mean_s = jax.lax.stop_gradient(mean)
            # torch BatchNorm2d tracks the UNBIASED variance (n/(n-1))
            # even though it normalizes with the biased one
            var_s = jax.lax.stop_gradient(var) * (n / max(n - 1, 1))
            ra_mean.value = momentum * ra_mean.value + (1 - momentum) * mean_s
            ra_var.value = momentum * ra_var.value + (1 - momentum) * var_s
        return y

    inv = jax.lax.rsqrt(ra_var.value + epsilon) * scale
    shift = (bias - ra_mean.value * inv).astype(dtype)
    w_folded = (w * inv[None, :]).astype(dtype)
    return _conv1x1(x4, w_folded) + shift


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32
    fold_bn3: bool = True  # fold bn3 into conv3 (same math, no h3 in HBM)

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
        if self.fold_bn3:
            out = _conv1x1_bn_folded(
                self, out, out_ch, "conv3", "bn3", train, self.dtype
            )
        else:
            out = nn.Conv(
                out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
            )(out)
            out = bn("bn3")(out)

        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                identity = nn.avg_pool(
                    identity, (self.stride, self.stride), (self.stride, self.stride)
                )
            if self.fold_bn3:
                identity = _conv1x1_bn_folded(
                    self, identity, out_ch, "downsample_conv", "downsample_bn",
                    train, self.dtype,
                )
            else:
                identity = nn.Conv(
                    out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="downsample_conv",
                )(identity)
                identity = bn("downsample_bn")(identity)

        return nn.relu(out + identity)


class _StemConvKernel(nn.Module):
    """Param holder: the stem's 3×3 conv kernel under ``kernel``."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
            jnp.float32,
        )


def s2d_pack_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Repack a 3×3 stride-2 conv kernel for a space-to-depth(2) input.

    With ``y[p, q, (pi, pj, c)] = x[2p+pi, 2q+pj, c]`` the original
    stride-2 conv (padding 1) is exactly a 2×2 stride-1 conv over y
    with top/left padding 1: output row i reads y rows i-1 (pi=1 →
    x[2i-1]) and i (pi=0/1 → x[2i]/x[2i+1]); the (a=0, pi=0) tap would
    be x[2i-2], outside the 3×3 support, so its weights are zero.
    Mapping: K2[a, b, (pi, pj, c), o] = w[2a+pi-1, 2b+pj-1, c, o]
    (zero where the index is -1).  Pure weight reshuffle — the conv's
    math, and therefore the model, is unchanged.
    """
    cin, co = w.shape[2], w.shape[3]
    zeros_row = jnp.zeros_like(w[:1])
    rows = jnp.concatenate([zeros_row, w], axis=0)  # (4,3,cin,co): (a,pi)→di
    zeros_col = jnp.zeros_like(rows[:, :1])
    full = jnp.concatenate([zeros_col, rows], axis=1)  # (4,4,cin,co)
    # (a*2+pi, b*2+pj, cin, co) → (a, b, pi*2cin + pj*cin + cin)
    k2 = (
        full.reshape(2, 2, 2, 2, cin, co)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(2, 2, 4 * cin, co)
    )
    return k2


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/b, W/b, b²·C), channel-minor (pi, pj, c)."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h // block, block, w // block, block, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // block, w // block, block * block * c)
    )


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
    # Per-bottleneck rematerialization (memory for recompute) — the
    # high-resolution RN50x16 (384²) OOMs at bs64 without it.
    remat: bool = False
    # Selective remat policy name (models.layers.resolve_remat_policy).
    remat_policy: Any = None
    # Space-to-depth stem: run stem_conv1 as a 2×2 conv over the
    # s2d(2)-repacked input — identical math and parameter tree (the
    # 3×3 kernel is repacked in-graph, s2d_pack_kernel), different
    # data layout for the MXU.  Measured A/B in scripts/bench_stem.py.
    stem_s2d: bool = False
    # Profiling hook (scripts/profile_rn50.py): return the feature map
    # after this stage instead of the pooled embedding.  0 = stem,
    # 1..4 = through layer{n}; None (default) = the full tower.  Keeps
    # the per-stage profiler on the real module instead of a copy.
    stop_after: Any = None

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
        if self.stem_s2d:
            # same parameter path (stem_conv1/kernel) as the nn.Conv
            # branch, so checkpoints/interop are layout-independent
            kernel = _StemConvKernel(3, self.width // 2, name="stem_conv1")()
            packed = s2d_pack_kernel(kernel).astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                space_to_depth(x, 2), packed, (1, 1),
                padding=((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
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
        if self.stop_after == 0:
            return x

        block_cls = Bottleneck
        if self.remat:
            from sparsify_clip_tpu.models.layers import resolve_remat_policy

            # (self, x, train): train is a static python bool
            block_cls = nn.remat(
                Bottleneck, static_argnums=(2,),
                policy=resolve_remat_policy(self.remat_policy),
            )
        planes = self.width
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for block in range(blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if block == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train)
            planes *= 2
            if self.stop_after == stage + 1:
                return x

        # final width = width * 32 (2048 for RN50)
        return AttentionPool2d(
            embed_dim=self.width * 32,
            num_heads=self.heads,
            output_dim=self.embed_dim,
            dtype=self.dtype,
            name="attnpool",
        )(x).astype(jnp.float32)
