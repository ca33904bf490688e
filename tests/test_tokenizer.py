"""CLIP BPE tokenizer: machinery invariants + (when the real vocab file
is present) exact-id parity hooks."""

import numpy as np
import pytest

from sparsify_clip_tpu.text.tokenizer import (
    CLIPTokenizer,
    CONTEXT_LENGTH,
    VOCAB_SIZE,
    bytes_to_unicode,
    get_tokenizer,
)


@pytest.fixture(scope="module")
def tok():
    return CLIPTokenizer()


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_shapes_and_dtype(tok):
    out = tok(["a photo of a cat", "a dog"])
    assert out.shape == (2, CONTEXT_LENGTH)
    assert out.dtype == np.int32


def test_sot_eot_placement(tok):
    out = tok("hello world")[0]
    assert out[0] == tok.sot_id
    eot_pos = int(np.argmax(out))
    assert out[eot_pos] == tok.eot_id
    # zero padding after eot
    assert (out[eot_pos + 1 :] == 0).all()


def test_eot_is_max_id(tok):
    # The text tower pools features at argmax(token ids); eot must be
    # the largest id ever emitted.
    out = tok(["some caption with words!", "another one"])
    assert tok.eot_id == VOCAB_SIZE - 1
    assert out.max() == tok.eot_id


def test_truncation_keeps_eot(tok):
    long_text = "word " * 500
    out = tok(long_text)[0]
    assert out[-1] == tok.eot_id
    assert (out != 0).all()


def test_lowercase_and_whitespace(tok):
    a = tok("A  Photo\tOf a CAT")[0]
    b = tok("a photo of a cat")[0]
    np.testing.assert_array_equal(a, b)


def test_roundtrip_ascii(tok):
    text = "a photo of a cat"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == text


def test_unicode_input(tok):
    out = tok("café ☕ naïve")
    assert out.shape == (1, CONTEXT_LENGTH)
    # decodes back to valid text
    assert "caf" in tok.decode([i for i in out[0] if i > 0])


def test_deterministic(tok):
    a = tok("determinism check")
    b = tok("determinism check")
    np.testing.assert_array_equal(a, b)


def test_get_tokenizer_parity_interface():
    # Mirrors the reference's hardcoded get_tokenizer('RN50') in eval
    # (sparsify_clip.py:560) — any CLIP-family name returns the same BPE.
    t1 = get_tokenizer("RN50")
    t2 = get_tokenizer("ViT-B-32")
    np.testing.assert_array_equal(t1("same text"), t2("same text"))


def test_batch_of_one_string(tok):
    out = tok("single")
    assert out.shape == (1, CONTEXT_LENGTH)


def test_empty_string(tok):
    out = tok("")[0]
    assert out[0] == tok.sot_id
    assert out[1] == tok.eot_id
