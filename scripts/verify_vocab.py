#!/usr/bin/env python
"""One-command open_clip token-id parity verifier.

The real CLIP BPE vocab (``bpe_simple_vocab_16e6.txt.gz``) is a data
file absent from this environment; the moment it is available, run

    python scripts/verify_vocab.py [/path/to/bpe_simple_vocab_16e6.txt.gz]

(or set ``$CLIP_BPE_PATH`` / drop the file into
``sparsify_clip_tpu/text/data/``) and this script checks the tokenizer
produces exactly open_clip's token ids (reference consumption:
/root/reference/sparsify_clip.py:692,560).  Exit 0 = parity verified.
The same goldens run automatically in tests/test_openclip_golden.py.
"""

from __future__ import annotations

import sys

import _bench  # noqa: F401  (repo root on sys.path)

from sparsify_clip_tpu.text.openclip_goldens import OPENCLIP_GOLDENS
from sparsify_clip_tpu.text.tokenizer import CLIPTokenizer, default_bpe_path


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else default_bpe_path()
    tok = CLIPTokenizer(bpe_path=path)
    print(f"vocab: {path}  kind={tok.vocab_kind}")
    if tok.vocab_kind != "openai":
        print(
            "FAIL: resolved vocab is not the real open_clip file "
            "(kind should be 'openai'). Pass its path explicitly or set "
            "$CLIP_BPE_PATH."
        )
        return 2
    failures = 0
    for text, want in OPENCLIP_GOLDENS.items():
        row = tok([text])[0]
        got = row[: len(want)].tolist()
        ok = got == want and (row[len(want):] == 0).all()
        print(f"  {'PASS' if ok else 'FAIL'}  {text!r}: {got}")
        if not ok:
            print(f"        want {want}")
            failures += 1
    if failures:
        print(f"FAIL: {failures}/{len(OPENCLIP_GOLDENS)} goldens mismatched")
        return 1
    print("PASS: token ids match open_clip")
    return 0


if __name__ == "__main__":
    sys.exit(main())
