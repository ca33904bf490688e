"""Inference API: encoders, retrieval index, zero-shot classifier."""

import numpy as np
import pytest

from sparsify_clip_tpu.inference import (
    CLIPEncoder,
    RetrievalIndex,
    build_zero_shot_classifier,
    zero_shot_classify,
)
from sparsify_clip_tpu.models import CLIP
from sparsify_clip_tpu.models.clip import CLIPConfig
from sparsify_clip_tpu.text import get_tokenizer

import jax
import jax.numpy as jnp

TINY = CLIPConfig(
    name="inf-tiny", embed_dim=16, vision_kind="vit", image_size=32,
    vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
    vocab_size=49408, context_length=77, text_width=16, text_heads=2,
    text_layers=2,
)

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def encoder():
    model = CLIP(cfg=TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 77), jnp.int32), train=False,
    )
    return CLIPEncoder(model, variables, get_tokenizer("RN50"))


def test_encoders_produce_unit_vectors(encoder):
    img = encoder.encode_images(RNG.standard_normal((4, 32, 32, 3)).astype(np.float32))
    txt = encoder.encode_texts(["a cat", "a dog", "a pizza"])
    assert img.shape == (4, 16) and txt.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img), axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(txt), axis=1), 1.0, atol=1e-5)


def test_retrieval_index_topk(encoder):
    bank = encoder.encode_texts([f"item {i}" for i in range(10)])
    index = RetrievalIndex(bank)
    # query with the bank itself: top-1 must be self
    scores, idx = index.search(bank, k=3)
    np.testing.assert_array_equal(idx[:, 0], np.arange(10))
    assert (scores[:, 0] >= scores[:, 1]).all()


def test_zero_shot_classifier_shapes(encoder):
    classifier = build_zero_shot_classifier(encoder, ["cat", "dog", "car"])
    assert classifier.shape == (3, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(classifier), axis=1), 1.0, atol=1e-5
    )
    out = zero_shot_classify(
        encoder, RNG.standard_normal((5, 32, 32, 3)).astype(np.float32), classifier
    )
    assert out["probs"].shape == (5, 3)
    np.testing.assert_allclose(out["probs"].sum(axis=1), 1.0, atol=1e-5)
    assert out["predictions"].shape == (5,)
    assert set(out["predictions"]) <= {0, 1, 2}


def test_package_public_api():
    import sparsify_clip_tpu as pkg

    assert callable(pkg.make_loss_fn)
    assert callable(pkg.create_model)
    assert callable(pkg.create_train_setup)  # lazy attr
    assert callable(pkg.evaluate_model)      # lazy attr
    assert "RN50" in pkg.MODEL_REGISTRY
    assert "anchor" in pkg.KNOWN_LOSS_TYPES
    tok = pkg.get_tokenizer("RN50")
    assert tok("hello").shape == (1, 77)
