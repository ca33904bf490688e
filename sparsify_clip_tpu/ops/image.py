"""Device-side image pipeline: fused random-resized-crop + flip +
normalize, fully jittable.

The reference does all image work on host workers with torchvision
(sparsify_clip.py:1007-1018).  On TPU the decode stays on host (JPEG),
but everything after it can ride the accelerator: the loader ships
fixed-size uint8 arrays (4× smaller host→device transfers than fp32)
and this module applies, **on device, inside the train step's jit**:

* torchvision-semantics RandomResizedCrop (area scale U(0.08,1),
  log-uniform aspect 3/4..4/3, 10 vectorized attempts with
  first-valid selection + center fallback) expressed as a per-sample
  ``jax.image.scale_and_translate`` — variable crop boxes with static
  output shapes, so XLA compiles one kernel for the whole batch;
* random horizontal flip;
* CLIP mean/std normalization (sparsify_clip.py:1003-1004).

All randomness comes from explicit JAX PRNG keys (one per sample),
making augmentation reproducible and mesh-shardable: each device
augments only its local shard.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.data.transforms import CLIP_MEAN, CLIP_STD

import math

SCALE_RANGE = (0.08, 1.0)
# plain python floats: module-level jnp ops would capture tracers if
# this module is first imported inside a traced function
LOG_RATIO_RANGE = (math.log(3.0 / 4.0), math.log(4.0 / 3.0))
N_ATTEMPTS = 10


def sample_crop_box(
    key: jax.Array, height: int, width: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(top, left, h, w) floats with torchvision RandomResizedCrop
    semantics, vectorized over the 10 attempts."""
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    area = height * width
    target_area = area * jax.random.uniform(
        k_area, (N_ATTEMPTS,), minval=SCALE_RANGE[0], maxval=SCALE_RANGE[1]
    )
    aspect = jnp.exp(
        jax.random.uniform(
            k_ratio, (N_ATTEMPTS,), minval=LOG_RATIO_RANGE[0], maxval=LOG_RATIO_RANGE[1]
        )
    )
    w = jnp.round(jnp.sqrt(target_area * aspect))
    h = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (w > 0) & (w <= width) & (h > 0) & (h <= height)

    # uniform integer offsets via shared unit draws (valid per attempt)
    u_top = jax.random.uniform(k_top, (N_ATTEMPTS,))
    u_left = jax.random.uniform(k_left, (N_ATTEMPTS,))
    top = jnp.floor(u_top * (height - h + 1))
    left = jnp.floor(u_left * (width - w + 1))

    # first valid attempt, else center fallback at the clamped aspect
    any_valid = jnp.any(valid)
    first = jnp.argmax(valid)  # index of first True (0 if none)

    in_ratio = width / height
    fb_w = jnp.where(
        in_ratio < 3.0 / 4.0, width,
        jnp.where(in_ratio > 4.0 / 3.0, jnp.round(height * 4.0 / 3.0), width),
    )
    fb_h = jnp.where(
        in_ratio < 3.0 / 4.0, jnp.round(width / (3.0 / 4.0)),
        jnp.where(in_ratio > 4.0 / 3.0, height, height),
    )
    fb_top = jnp.round((height - fb_h) / 2.0)
    fb_left = jnp.round((width - fb_w) / 2.0)

    h_out = jnp.where(any_valid, h[first], fb_h)
    w_out = jnp.where(any_valid, w[first], fb_w)
    top_out = jnp.where(any_valid, top[first], fb_top)
    left_out = jnp.where(any_valid, left[first], fb_left)
    return top_out, left_out, h_out, w_out


def _crop_resize_one(
    image: jnp.ndarray, key: jax.Array, size: int
) -> jnp.ndarray:
    """Crop box → bilinear resize to (size, size) via scale_and_translate."""
    h_in, w_in = image.shape[0], image.shape[1]
    k_box, k_flip = jax.random.split(key)
    top, left, h, w = sample_crop_box(k_box, h_in, w_in)
    scale_y = size / h
    scale_x = size / w
    translation = jnp.stack([-top * scale_y, -left * scale_x])
    out = jax.image.scale_and_translate(
        image.astype(jnp.float32),
        shape=(size, size, image.shape[2]),
        spatial_dims=(0, 1),
        scale=jnp.stack([scale_y, scale_x]),
        translation=translation,
        method="linear",
        antialias=False,  # PIL BILINEAR upsampling convention
    )
    flip = jax.random.bernoulli(k_flip)
    return jax.lax.cond(flip, lambda o: o[:, ::-1, :], lambda o: o, out)


def augment_batch_core(
    images_u8: jnp.ndarray, key: jax.Array, size: int = 224
) -> jnp.ndarray:
    """Traceable core of :func:`augment_batch` — call this from inside
    an enclosing jit (e.g. the train step with ``device_augment``)."""
    b = images_u8.shape[0]
    images = images_u8.astype(jnp.float32) / 255.0
    keys = jax.random.split(key, b)
    out = jax.vmap(lambda im, k: _crop_resize_one(im, k, size))(images, keys)
    return normalize_batch(out)


@functools.partial(jax.jit, static_argnames=("size",))
def augment_batch(
    images_u8: jnp.ndarray, key: jax.Array, size: int = 224
) -> jnp.ndarray:
    """uint8 (B, H, W, 3) → augmented, normalized fp32 (B, size, size, 3).

    The train-side device twin of
    :func:`sparsify_clip_tpu.data.transforms.train_transform`.
    """
    return augment_batch_core(images_u8, key, size)


@functools.partial(jax.jit, static_argnames=("size",))
def eval_resize_batch(images_u8: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """uint8 (B, H, W, 3) → squash-resized, normalized fp32 — the eval
    path's aspect-squashing Resize (sparsify_clip.py:1014-1018)."""
    images = images_u8.astype(jnp.float32) / 255.0
    out = jax.image.resize(
        images, (images.shape[0], size, size, images.shape[3]), method="linear"
    )
    return normalize_batch(out)


def normalize_batch(images: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std
