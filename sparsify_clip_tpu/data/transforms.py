"""Host-side image transforms.

Reference pipeline (sparsify_clip.py:1003-1018):
* train: RandomResizedCrop((224,224)) → RandomHorizontalFlip →
  ToTensor → Normalize(CLIP mean/std)
* test: Resize((224,224)) (aspect-squashing, NOT center-crop) →
  ToTensor → Normalize

Crop/flip sampling follows torchvision's RandomResizedCrop semantics
(area scale U(0.08, 1), log-uniform aspect in (3/4, 4/3), 10 attempts,
center-crop fallback) with an explicit numpy Generator instead of
global torch RNG — bit-exact data-order replay of the reference is
impossible anyway (SURVEY.md §7 "RNG discipline"), so determinism is
per-seed within this framework.

Output layout is NHWC fp32 (TPU-native).  The device-side fused
resize+normalize path lives in :mod:`sparsify_clip_tpu.ops.image`.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
from PIL import Image

# CLIP pixel statistics (sparsify_clip.py:1003-1004).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _to_float_chw_free(img: Image.Image) -> np.ndarray:
    """PIL → (H, W, 3) float32 in [0, 1]."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def normalize(arr: np.ndarray) -> np.ndarray:
    return (arr - CLIP_MEAN) / CLIP_STD


def sample_resized_crop_params(
    height: int,
    width: int,
    rng: np.random.Generator,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """(top, left, h, w) with torchvision RandomResizedCrop semantics."""
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # fallback: center crop at the closest valid aspect
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def train_transform(
    img: Image.Image, rng: np.random.Generator, size: int = 224
) -> np.ndarray:
    """RandomResizedCrop + RandomHorizontalFlip + normalize → (S, S, 3)."""
    top, left, h, w = sample_resized_crop_params(img.height, img.width, rng)
    img = img.crop((left, top, left + w, top + h)).resize(
        (size, size), Image.BILINEAR
    )
    arr = _to_float_chw_free(img)
    if rng.random() < 0.5:
        arr = arr[:, ::-1, :]
    return normalize(arr)


def test_transform(img: Image.Image, size: int = 224) -> np.ndarray:
    """Aspect-squashing resize + normalize (the reference's eval path
    uses plain Resize((224,224)), sparsify_clip.py:1014-1018)."""
    img = img.resize((size, size), Image.BILINEAR)
    return normalize(_to_float_chw_free(img))
