"""The committed deterministic subset BPE vocab: id-level goldens,
default resolution, and end-to-end wiring through the data pipeline.

The real open_clip vocab is a data file absent here; the committed
subset vocab (scripts/build_bpe_vocab.py) exercises the SAME non-trivial
merge machinery the real vocab does (reference tokenizer entry:
sparsify_clip.py:692,560), so the merge-active code path is covered in
CI rather than only the byte-level fallback.
"""

import gzip
import hashlib
import os

import numpy as np

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.text.tokenizer import (
    CLIPTokenizer,
    SUBSET_VOCAB_PATH,
    get_tokenizer,
)

# Pinned id-level goldens under the committed vocab.  If these change,
# the vocab artifact changed — regenerate deliberately and update.
GOLDENS = {
    "a man riding a horse on the beach":
        [320, 520, 622, 320, 666, 524, 523, 710],
    "two dogs playing with a frisbee in the park":
        [578, 1056, 695, 556, 320, 996, 531, 523, 777],
    "a group of people standing next to a red bus":
        [320, 704, 567, 562, 598, 662, 572, 320, 636, 672],
}

SHA256 = "30ef8d0f8e9473f6fec38ee0b7b877b933e314dc08484f23236b4f3fa43503fb"


def test_artifact_is_byte_pinned():
    with open(SUBSET_VOCAB_PATH, "rb") as fh:
        assert hashlib.sha256(fh.read()).hexdigest() == SHA256


def test_regeneration_is_deterministic():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "build_bpe_vocab",
        os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "build_bpe_vocab.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    tokens = mod.CORPUS.split()
    counts = {tokens[i]: int(tokens[i + 1]) for i in range(0, len(tokens), 2)}
    merges = mod.learn_merges(counts)
    with gzip.open(SUBSET_VOCAB_PATH, "rt", encoding="utf-8") as fh:
        lines = [l for l in fh.read().split("\n")[1:] if l]
    assert [tuple(l.split()) for l in lines] == merges


def test_default_tokenizer_uses_subset_vocab():
    tok = CLIPTokenizer()
    assert tok.vocab_kind in ("subset", "openai")  # openai if user dropped it in
    assert not tok.hermetic


def test_id_level_goldens():
    tok = CLIPTokenizer(bpe_path=SUBSET_VOCAB_PATH)
    for text, ids in GOLDENS.items():
        assert tok.encode(text) == ids, text
        assert tok.decode(ids).strip() == text


def test_common_caption_words_are_single_tokens():
    tok = CLIPTokenizer(bpe_path=SUBSET_VOCAB_PATH)
    for word in ("elephant", "skateboard", "kitchen", "standing"):
        assert len(tok.encode(word)) == 1, word
    # unknown words decompose into learned subwords, not single bytes
    ids = tok.encode("snowboarder")
    assert 1 < len(ids) < len("snowboarder")


def test_pipeline_wires_bpe_vocab_path():
    from sparsify_clip_tpu.data.pipeline import _select_tokenizer

    cfg = ExperimentConfig.from_dict({
        "model": "RN50", "batch_size": 4, "epochs": 1,
        "learning_rate": 1e-4, "loss_type": "anchor",
        "bpe_vocab_path": SUBSET_VOCAB_PATH,
    })
    tok = _select_tokenizer(cfg)
    out = tok(["a man riding a horse on the beach"])
    want = [49406] + GOLDENS["a man riding a horse on the beach"] + [49407]
    np.testing.assert_array_equal(out[0][: len(want)], want)
