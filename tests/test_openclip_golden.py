"""Gated open_clip token-id parity goldens.

The reference tokenizes with open_clip's packaged BPE vocab
(``bpe_simple_vocab_16e6.txt.gz``, consumed at
/root/reference/sparsify_clip.py:692,560).  That vocab is a data file
not present in this environment, so these tests are SKIPPED until it
resolves (drop it at ``text/data/bpe_simple_vocab_16e6.txt.gz`` or
point ``$CLIP_BPE_PATH`` at it) — the moment it lands, id parity is
verified automatically against known open_clip outputs.

One-command version: ``python scripts/verify_vocab.py [path]``.
"""

import numpy as np
import pytest

from sparsify_clip_tpu.text.openclip_goldens import OPENCLIP_GOLDENS
from sparsify_clip_tpu.text.tokenizer import CLIPTokenizer, default_bpe_path


def _real_vocab_available() -> bool:
    path = default_bpe_path()
    if path is None:
        return False
    tok = CLIPTokenizer(bpe_path=path)
    return tok.vocab_kind == "openai"


requires_real_vocab = pytest.mark.skipif(
    not _real_vocab_available(),
    reason="real open_clip BPE vocab not present (drop "
    "bpe_simple_vocab_16e6.txt.gz into text/data/ or set $CLIP_BPE_PATH)",
)


@requires_real_vocab
def test_openclip_token_id_parity():
    tok = CLIPTokenizer()
    for text, want in OPENCLIP_GOLDENS.items():
        row = tok([text])[0]
        got = row[: len(want)].tolist()
        assert got == want, f"{text!r}: got {got}, want {want}"
        assert (row[len(want):] == 0).all(), f"{text!r}: padding not zero"


@requires_real_vocab
def test_openclip_specials_and_shape():
    tok = CLIPTokenizer()
    out = tok(["", "a photo of a cat"])
    assert out.shape == (2, 77) and out.dtype == np.int32
    assert out[0, 0] == 49406 and out[0, 1] == 49407  # empty: [sot, eot]
    assert (out[0, 2:] == 0).all()
    # overflow truncates with eot pinned at the last position
    long = tok(["cat " * 200])[0]
    assert long[0] == 49406 and long[-1] == 49407


@requires_real_vocab
def test_native_tokenizer_matches_goldens_on_real_vocab():
    """The C++ BPE core must produce the same open_clip ids."""
    native = pytest.importorskip("sparsify_clip_tpu.text.native")
    if not native.available():
        pytest.skip("native tokenizer core not built")
    ntok = native.NativeCLIPTokenizer()
    for text, want in OPENCLIP_GOLDENS.items():
        got = ntok([text])[0][: len(want)].tolist()
        assert got == want, f"{text!r}: native got {got}, want {want}"
