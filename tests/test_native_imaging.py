"""Native (C++) image pipeline vs the PIL golden transforms.

Both backends decode the SAME JPEG bytes with libjpeg, so the only
arithmetic difference is the resize: Pillow's fixed-point triangle
filter vs the native double-precision implementation of the same
algorithm (≤ ~2/255 per channel).  Crop, flip and normalization are
exact.
"""

import io

import numpy as np
import pytest
from PIL import Image

from sparsify_clip_tpu.data import transforms
from sparsify_clip_tpu.data.native_imaging import ensure_built, get_pipeline

pytestmark = pytest.mark.skipif(
    ensure_built() is None, reason="native imaging library unavailable"
)

# normalized units: 2/255 pixel tolerance through the CLIP stds
ATOL = (2.0 / 255.0) / transforms.CLIP_STD.min()


def _jpeg(w=97, h=64, seed=0, quality=92):
    rng = np.random.default_rng(seed)
    # smooth-ish image so JPEG round-trip noise stays small
    base = rng.random((8, 8, 3))
    img = np.kron(base, np.ones((16, 16, 1)))[:h, :w]
    pil = Image.fromarray((img * 255).astype(np.uint8))
    buf = io.BytesIO()
    pil.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _decoded(jpeg):
    return Image.open(io.BytesIO(jpeg)).convert("RGB")


def test_dims_from_header():
    jpeg = _jpeg(w=123, h=77)
    assert get_pipeline().dims(jpeg) == (77, 123)


def test_squash_resize_matches_pil_eval_transform():
    jpeg = _jpeg()
    want = transforms.test_transform(_decoded(jpeg), size=64)
    got = get_pipeline().transform(jpeg, size=64)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_crop_resize_flip_matches_pil_train_path():
    jpeg = _jpeg(w=120, h=90, seed=3)
    pil = _decoded(jpeg)
    top, left, ch, cw = 10, 25, 60, 70
    ref = pil.crop((left, top, left + cw, top + ch)).resize(
        (48, 48), Image.BILINEAR
    )
    want = transforms.normalize(
        np.asarray(ref, dtype=np.float32) / 255.0
    )[:, ::-1, :]  # flipped
    got = get_pipeline().transform(
        jpeg, size=48, crop=(top, left, ch, cw), flip=True
    )
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_upsampling_path():
    jpeg = _jpeg(w=20, h=15, seed=5)
    want = transforms.test_transform(_decoded(jpeg), size=64)
    got = get_pipeline().transform(jpeg, size=64)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_uint8_staging_output():
    jpeg = _jpeg(seed=7)
    ref = _decoded(jpeg).resize((32, 32), Image.BILINEAR)
    got = get_pipeline().transform(jpeg, size=32, uint8=True)
    assert got.dtype == np.uint8
    diff = np.abs(got.astype(int) - np.asarray(ref, dtype=int))
    assert diff.max() <= 2, diff.max()


def test_bad_input_raises():
    with pytest.raises(ValueError):
        get_pipeline().transform(b"not a jpeg", size=32)
    with pytest.raises(ValueError):
        get_pipeline().transform(_jpeg(w=30, h=30), size=32,
                                 crop=(0, 0, 64, 64))


# ------------------------------------------------------ loader integration
def _loaders(tmp_path, backend, train):
    from sparsify_clip_tpu.data.coco import CocoCaptions, Subset
    from sparsify_clip_tpu.data.loader import DataLoader
    from sparsify_clip_tpu.data.synthetic import write_coco_fixture
    from sparsify_clip_tpu.text import get_tokenizer

    root = write_coco_fixture(str(tmp_path / "coco"), num_train=8, num_val=8)
    import os

    ds = CocoCaptions(
        os.path.join(root, "images", "train2017"),
        os.path.join(root, "annotations", "captions_train2017.json"),
    )
    ds = Subset(ds, range(6))
    tok = get_tokenizer("RN50")
    return DataLoader(
        ds, 6, tok, train=train, shuffle=train, seed=0, image_size=32,
        num_threads=1, image_backend=backend,
    )


@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
def test_loader_native_backend_matches_pil(tmp_path, train):
    """Same data order, same captions, near-identical pixels across
    backends: crop/flip/caption RNG streams are backend-invariant."""
    pil = list(_loaders(tmp_path / "a", "pil", train).epoch(0))
    native = list(_loaders(tmp_path / "b", "native", train).epoch(0))
    assert len(pil) == len(native) == 1
    assert pil[0]["captions"] == native[0]["captions"]
    np.testing.assert_array_equal(pil[0]["tokens"], native[0]["tokens"])
    np.testing.assert_allclose(
        native[0]["images"], pil[0]["images"], atol=ATOL
    )


def test_loader_native_uint8_staging(tmp_path):
    loader = _loaders(tmp_path, "native", train=True)
    loader.raw_uint8 = True
    batch = list(loader.epoch(0))[0]
    assert batch["images"].dtype == np.uint8
    assert batch["images"].shape == (6, 32, 32, 3)
