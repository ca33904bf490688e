"""BPE merge-loop behavior with a real (synthetic) merges file, for both
the Python golden and the C++ core — hermetic mode exercises only the
no-merge path, so this pins the actual BPE algorithm."""

import gzip

import numpy as np
import pytest

from sparsify_clip_tpu.text.native import ensure_built
from sparsify_clip_tpu.text.tokenizer import CLIPTokenizer

# Rank order matters: lower line = earlier merge.  With these merges,
# "the" tokenizes as: t+h -> "th", then "th"+"e</w>" -> "the</w>".
MERGES = """#version: synthetic test vocab
t h
th e</w>
c a
ca t</w>
i n
in g</w>
"""


@pytest.fixture(scope="module")
def merges_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("bpe") / "merges.txt"
    path.write_text(MERGES)
    return str(path)


@pytest.fixture(scope="module")
def gz_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("bpe") / "merges.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        fh.write(MERGES)
    return str(path)


def test_merge_loop_produces_merged_tokens(merges_path):
    tok = CLIPTokenizer(bpe_path=merges_path)
    assert not tok.hermetic
    # "the" -> single merged token "the</w>" (2 merges applied in rank order)
    ids = tok.encode("the")
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "the</w>"
    # "cat" -> "ca" + "t</w>"? rank: "c a" (2) then "ca t</w>" (3) -> "cat</w>"
    ids = tok.encode("cat")
    assert [tok.decoder[i] for i in ids] == ["cat</w>"]
    # "thing": t+h -> "th"; i+n -> "in"; in+g</w> -> "ing</w>" -> th,ing</w>
    ids = tok.encode("thing")
    assert [tok.decoder[i] for i in ids] == ["th", "ing</w>"]
    # unmerged text falls back to byte-level
    ids = tok.encode("zq")
    assert len(ids) == 2


def test_merged_vocab_ids_above_byte_range(merges_path):
    tok = CLIPTokenizer(bpe_path=merges_path)
    ids = tok.encode("the")
    assert ids[0] >= 512  # merged tokens start after 2x256 byte tokens


def test_gzip_merges_load(gz_path):
    tok = CLIPTokenizer(bpe_path=gz_path)
    assert not tok.hermetic
    assert [tok.decoder[i] for i in tok.encode("the")] == ["the</w>"]


@pytest.mark.skipif(ensure_built() is None, reason="no C++ toolchain")
def test_native_matches_python_with_merges(merges_path):
    from sparsify_clip_tpu.text.native import NativeCLIPTokenizer

    python = CLIPTokenizer(bpe_path=merges_path)
    native = NativeCLIPTokenizer(merges_path=merges_path)
    for text in ["the cat", "thinking things through", "cat in the hat",
                 "a thing", "zq the ca t"]:
        np.testing.assert_array_equal(
            native(text), python(text), err_msg=f"mismatch on {text!r}"
        )


@pytest.mark.skipif(ensure_built() is None, reason="no C++ toolchain")
def test_native_loads_gzip_merges(gz_path):
    from sparsify_clip_tpu.text.native import NativeCLIPTokenizer

    python = CLIPTokenizer(bpe_path=gz_path)
    native = NativeCLIPTokenizer(merges_path=gz_path)
    np.testing.assert_array_equal(native("the cat"), python("the cat"))
