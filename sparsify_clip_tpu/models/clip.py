"""Two-tower CLIP model + the model-name registry.

Capability equivalent of ``open_clip.create_model_and_transforms(name,
pretrained=None)`` as used by the reference (sparsify_clip.py:685-689):
a fresh randomly-initialized two-tower model exposing
``encode_image`` / ``encode_text``.  The learnable temperature is NOT a
model parameter — the reference keeps it as a separate raw parameter
appended to the optimizer (sparsify_clip.py:716-730), and the train
state mirrors that.

Registry names cover the reference's config surface (``RN50`` in every
shipped YAML) plus the north-star ``ViT-B-32`` and the common CLIP
family siblings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sparsify_clip_tpu.models.layers import gelu_exact, quick_gelu
from sparsify_clip_tpu.models.resnet import ModifiedResNet
from sparsify_clip_tpu.models.text import TextTransformer
from sparsify_clip_tpu.models.vit import VisionTransformer


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    embed_dim: int
    # vision tower
    vision_kind: str  # "resnet" | "vit"
    image_size: int = 224
    vision_width: int = 64        # resnet: stem width; vit: transformer width
    vision_layers: Tuple[int, ...] = (3, 4, 6, 3)  # resnet stages or (depth,) for vit
    vision_heads: int = 32        # resnet: attnpool heads; vit: attention heads
    patch_size: int = 32          # vit only
    # Non-4x MLP hidden widths (LAION ViT-g/bigG); None → width*4.
    vision_mlp_hidden: Optional[int] = None
    text_mlp_hidden: Optional[int] = None
    # text tower
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    quick_gelu: bool = False


MODEL_REGISTRY: Dict[str, CLIPConfig] = {
    "RN50": CLIPConfig(
        name="RN50", embed_dim=1024, vision_kind="resnet",
        vision_width=64, vision_layers=(3, 4, 6, 3), vision_heads=32,
    ),
    "RN101": CLIPConfig(
        name="RN101", embed_dim=512, vision_kind="resnet",
        vision_width=64, vision_layers=(3, 4, 23, 3), vision_heads=32,
    ),
    # EfficientNet-style scaled ResNets (CLIP RN50x4/x16 conventions:
    # width/resolution scaled together).
    "RN50x4": CLIPConfig(
        name="RN50x4", embed_dim=640, vision_kind="resnet", image_size=288,
        vision_width=80, vision_layers=(4, 6, 10, 6), vision_heads=40,
        text_width=640, text_heads=10, text_layers=12,
    ),
    "RN50x16": CLIPConfig(
        name="RN50x16", embed_dim=768, vision_kind="resnet", image_size=384,
        vision_width=96, vision_layers=(6, 8, 18, 8), vision_heads=48,
        text_width=768, text_heads=12, text_layers=12,
    ),
    "ViT-B-32": CLIPConfig(
        name="ViT-B-32", embed_dim=512, vision_kind="vit",
        vision_width=768, vision_layers=(12,), vision_heads=12, patch_size=32,
    ),
    "ViT-B-16": CLIPConfig(
        name="ViT-B-16", embed_dim=512, vision_kind="vit",
        vision_width=768, vision_layers=(12,), vision_heads=12, patch_size=16,
    ),
    "RN50x64": CLIPConfig(
        name="RN50x64", embed_dim=1024, vision_kind="resnet", image_size=448,
        vision_width=128, vision_layers=(3, 15, 36, 10), vision_heads=64,
        text_width=1024, text_heads=16, text_layers=12,
    ),
    "ViT-L-14": CLIPConfig(
        name="ViT-L-14", embed_dim=768, vision_kind="vit",
        vision_width=1024, vision_layers=(24,), vision_heads=16, patch_size=14,
        text_width=768, text_heads=12, text_layers=12,
    ),
    # The @336px fine-tune resolution of ViT-L-14 (open_clip
    # "ViT-L-14-336"): identical towers, larger positional grid.
    "ViT-L-14-336": CLIPConfig(
        name="ViT-L-14-336", embed_dim=768, vision_kind="vit", image_size=336,
        vision_width=1024, vision_layers=(24,), vision_heads=16, patch_size=14,
        text_width=768, text_heads=12, text_layers=12,
    ),
    # LAION-scale ViT-H/14 (open_clip "ViT-H-14"): standard 4x MLP.
    "ViT-H-14": CLIPConfig(
        name="ViT-H-14", embed_dim=1024, vision_kind="vit",
        vision_width=1280, vision_layers=(32,), vision_heads=16, patch_size=14,
        text_width=1024, text_heads=16, text_layers=24,
    ),
    # LAION ViT-g/bigG (open_clip "ViT-g-14" / "ViT-bigG-14"):
    # non-4x vision MLPs (6144/1408, 8192/1664).
    "ViT-g-14": CLIPConfig(
        name="ViT-g-14", embed_dim=1024, vision_kind="vit",
        vision_width=1408, vision_layers=(40,), vision_heads=16,
        patch_size=14, vision_mlp_hidden=6144,
        text_width=1024, text_heads=16, text_layers=24,
    ),
    "ViT-bigG-14": CLIPConfig(
        name="ViT-bigG-14", embed_dim=1280, vision_kind="vit",
        vision_width=1664, vision_layers=(48,), vision_heads=16,
        patch_size=14, vision_mlp_hidden=8192,
        text_width=1280, text_heads=20, text_layers=32,
    ),
    # Minutes-scale smoke model for CLI verification runs (full 49408
    # vocab / 77 context so the real tokenizer path is exercised, tiny
    # towers so init+compile are seconds even through the axon tunnel).
    "tiny-test": CLIPConfig(
        name="tiny-test", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=49408, context_length=77, text_width=16, text_heads=2,
        text_layers=2,
    ),
}
# OpenAI-parameterized (QuickGELU) variants, mirroring open_clip's
# "<name>-quickgelu" registry convention.
for _base in ["RN50", "RN101", "ViT-B-32", "ViT-B-16", "ViT-L-14",
              "ViT-L-14-336"]:
    _cfg = MODEL_REGISTRY[_base]
    MODEL_REGISTRY[f"{_base}-quickgelu"] = dataclasses.replace(
        _cfg, name=f"{_base}-quickgelu", quick_gelu=True
    )


class CLIP(nn.Module):
    """Two-tower CLIP.  Returns **unnormalized** embeddings — callers
    L2-normalize, matching the reference train/eval loops
    (sparsify_clip.py:772-773,624-625)."""

    cfg: CLIPConfig
    dtype: Any = jnp.float32
    # Per-block rematerialization in all towers (memory for recompute;
    # needed for ViT-B per-chip batches >= 512 and for RN50x16's 384²
    # activations on 16G HBM).
    remat: bool = False
    # Selective remat policy (models.layers.resolve_remat_policy):
    # None/"nothing" recomputes whole blocks; "dots", "dots_no_batch",
    # "attn_out" keep chosen intermediates to trade memory for less
    # recompute.  Read only when remat is on.
    remat_policy: Any = None
    # Space-to-depth stem for ResNet towers (models/resnet.py): same
    # math/params, different MXU data layout.  Measured in BASELINE.md.
    stem_s2d: bool = False
    # fp32 LayerNorm statistics (quality default; bf16 measured no
    # faster on v5e — knob retained for experimentation).
    ln_fp32: bool = True
    # Fuse each transformer block's ln_1 into its qkv projection on TPU
    # (ops/pallas_ln_qkv; forward-only fusion, same param tree).
    fused_ln_qkv: bool = False
    # Token-embedding lookup as a one-hot matmul (text tower A/B knob).
    onehot_embed: bool = False
    # lax.scan over transformer layers (ViT + text towers): one
    # compiled block body regardless of depth — the compile-time lever
    # for ViT-H/g/bigG.  Changes the param tree (stacked layer axis);
    # torch interop and unrolled checkpoints don't convert.  ResNet
    # stages (heterogeneous blocks) always unroll.
    scan_layers: bool = False
    # GPipe pipeline stages over the mesh 'model' axis for the
    # transformer trunks (parallel/pipeline.py).  Requires scan_layers,
    # a ViT vision tower, pipeline_mesh, and both towers' depths
    # divisible by the stage count.
    pipeline_stages: int = 1
    pipeline_microbatches: Any = None
    pipeline_mesh: Any = None

    def setup(self):
        act = quick_gelu if self.cfg.quick_gelu else gelu_exact
        if self.pipeline_stages > 1 and self.cfg.vision_kind != "vit":
            raise ValueError(
                "pipeline_stages > 1 pipelines transformer block stacks; "
                f"the {self.cfg.name} vision tower is a ResNet (stage-"
                "heterogeneous blocks) — use TP (mesh_model) or FSDP instead"
            )
        if self.cfg.vision_kind == "resnet":
            self.visual = ModifiedResNet(
                layers=tuple(self.cfg.vision_layers),
                width=self.cfg.vision_width,
                image_size=self.cfg.image_size,
                embed_dim=self.cfg.embed_dim,
                heads=self.cfg.vision_heads,
                dtype=self.dtype,
                remat=self.remat,
                remat_policy=self.remat_policy,
                stem_s2d=self.stem_s2d,
            )
        elif self.cfg.vision_kind == "vit":
            self.visual = VisionTransformer(
                image_size=self.cfg.image_size,
                patch_size=self.cfg.patch_size,
                width=self.cfg.vision_width,
                layers=self.cfg.vision_layers[0],
                heads=self.cfg.vision_heads,
                mlp_hidden=self.cfg.vision_mlp_hidden,
                embed_dim=self.cfg.embed_dim,
                dtype=self.dtype,
                act=act,
                remat=self.remat,
                remat_policy=self.remat_policy,
                ln_fp32=self.ln_fp32,
                fused_ln_qkv=self.fused_ln_qkv,
                scan_layers=self.scan_layers,
                pipeline_stages=self.pipeline_stages,
                pipeline_microbatches=self.pipeline_microbatches,
                pipeline_mesh=self.pipeline_mesh,
            )
        else:
            raise ValueError(f"Unknown vision_kind {self.cfg.vision_kind}")
        self.text = TextTransformer(
            vocab_size=self.cfg.vocab_size,
            context_length=self.cfg.context_length,
            width=self.cfg.text_width,
            heads=self.cfg.text_heads,
            layers=self.cfg.text_layers,
            mlp_hidden=self.cfg.text_mlp_hidden,
            embed_dim=self.cfg.embed_dim,
            dtype=self.dtype,
            act=act,
            remat=self.remat,
            remat_policy=self.remat_policy,
            ln_fp32=self.ln_fp32,
            fused_ln_qkv=self.fused_ln_qkv,
            onehot_embed=self.onehot_embed,
            scan_layers=self.scan_layers,
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
            pipeline_mesh=self.pipeline_mesh,
        )

    def encode_image(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.cfg.vision_kind == "resnet":
            return self.visual(images, train=train)
        return self.visual(images)

    def encode_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.text(tokens)

    def __call__(
        self, images: jnp.ndarray, tokens: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.encode_image(images, train=train), self.encode_text(tokens)


def create_model(
    name: str,
    dtype: Any = jnp.float32,
    rng: Optional[jax.Array] = None,
    image_size: Optional[int] = None,
    remat: bool = False,
    remat_policy: Any = None,
    stem_s2d: bool = False,
    ln_fp32: bool = True,
    fused_ln_qkv: bool = False,
    onehot_embed: bool = False,
    scan_layers: bool = False,
    pipeline_stages: int = 1,
    pipeline_microbatches: Optional[int] = None,
    pipeline_mesh: Any = None,
):
    """Build a CLIP model + freshly-initialized variables.

    Returns ``(model, variables)`` where ``variables`` holds ``params``
    (fp32) and, for ResNet towers, ``batch_stats``.  Equivalent surface
    to the reference's from-scratch model build (sparsify_clip.py:685-699).
    """
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model {name!r}. Known: {sorted(MODEL_REGISTRY)}")
    cfg = MODEL_REGISTRY[name]
    if image_size is not None:
        cfg = dataclasses.replace(cfg, image_size=image_size)
    model = CLIP(cfg=cfg, dtype=dtype, remat=remat, remat_policy=remat_policy,
                 stem_s2d=stem_s2d, ln_fp32=ln_fp32, fused_ln_qkv=fused_ln_qkv,
                 onehot_embed=onehot_embed, scan_layers=scan_layers,
                 pipeline_stages=pipeline_stages,
                 pipeline_microbatches=pipeline_microbatches,
                 pipeline_mesh=pipeline_mesh)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    dummy_images = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    dummy_tokens = jnp.zeros((2, cfg.context_length), jnp.int32)
    variables = model.init(rng, dummy_images, dummy_tokens, train=False)
    return model, variables
