"""Native (C++) tokenizer vs the Python golden on ASCII corpora."""

import numpy as np
import pytest

from sparsify_clip_tpu.data.synthetic import make_caption
from sparsify_clip_tpu.text.native import NativeCLIPTokenizer, ensure_built
from sparsify_clip_tpu.text.tokenizer import CLIPTokenizer

pytestmark = pytest.mark.skipif(
    ensure_built() is None, reason="no C++ toolchain / build failed"
)


@pytest.fixture(scope="module")
def toks():
    return NativeCLIPTokenizer(), CLIPTokenizer()


CASES = [
    "a photo of a cat",
    "two dogs playing in the snow!",
    "it's a man's surfboard, isn't it?",
    "room 101 has 3 chairs and 12 lamps",
    "hello,world...  spaced   out\ttabs",
    "UPPER Case MiXeD",
    "punctuation!!! ??? ;;; ((()))",
    "don't won't can't we'll they're i'm you've she'd",
    "",
    "a" * 300,
    "word " * 100,
]


def test_parity_on_cases(toks):
    native, python = toks
    for text in CASES:
        np.testing.assert_array_equal(
            native(text), python(text), err_msg=f"mismatch on {text!r}"
        )


def test_parity_on_synthetic_corpus(toks):
    native, python = toks
    rng = np.random.default_rng(0)
    captions = [make_caption(rng) for _ in range(200)]
    np.testing.assert_array_equal(native(captions), python(captions))


def test_batch_shape_and_specials(toks):
    native, _ = toks
    out = native(["a cat", "a dog"], context_length=16)
    assert out.shape == (2, 16)
    assert (out[:, 0] == native.sot_id).all()
    assert out.max() == native.eot_id


def test_throughput_sanity(toks):
    """Native should not be slower than Python (usually much faster)."""
    import time

    native, python = toks
    rng = np.random.default_rng(1)
    captions = [make_caption(rng) for _ in range(256)] * 4
    # warm caches
    native(captions[:8]); python(captions[:8])
    t0 = time.perf_counter(); native(captions); t_native = time.perf_counter() - t0
    t0 = time.perf_counter(); python(captions); t_python = time.perf_counter() - t0
    assert t_native <= t_python * 1.5, (t_native, t_python)
