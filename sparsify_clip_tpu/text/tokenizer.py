"""CLIP BPE tokenizer (vocab 49408, context 77).

The reference delegates tokenization to ``open_clip.get_tokenizer``
(sparsify_clip.py:692,560), a lower-cased byte-pair encoding over a
49,152-entry merged vocab plus ``<|startoftext|>``/``<|endoftext|>``
specials, padded/truncated to a 77-token context.  This module
implements the same machinery from scratch:

* GPT-2-style byte↔unicode mapping so BPE operates on visible chars;
* the CLIP pre-tokenization regex (contractions, letter runs, digits,
  punctuation) with lowercasing and whitespace collapsing;
* greedy lowest-rank merge loop with an end-of-word ``</w>`` marker;
* context assembly: ``[sot] + bpe(text) + [eot]``, truncated so the
  last token is always ``eot``, zero-padded to ``context_length``.

Vocab provenance (resolution order, see :func:`default_bpe_path`):

1. an explicit ``bpe_path`` argument or ``$CLIP_BPE_PATH`` — point it
   at the real ``bpe_simple_vocab_16e6.txt.gz`` (a data file, not code)
   and token ids match open_clip exactly;
2. the real vocab dropped into ``text/data/bpe_simple_vocab_16e6.txt.gz``;
3. the committed deterministic subset vocab
   ``text/data/coco_en_merges.txt.gz`` (built by
   ``scripts/build_bpe_vocab.py`` from a COCO-caption frequency corpus)
   — realistic word/subword granularity for caption English, but ids
   are NOT open_clip ids;
4. a pure byte-level fallback (no merges): 256 byte tokens + 256
   ``</w>``-suffixed byte tokens.

In every mode the special tokens keep their canonical ids 49406 (sot) /
49407 (eot) so that "EOT = argmax(token ids)" — the property the text
tower relies on to locate the end-of-text embedding — always holds.
Models are trained from scratch in this repo (``pretrained=None`` in
the reference, sparsify_clip.py:685-689), so a non-open_clip vocab
changes tokenization granularity but not capability.

A C++ implementation of the same algorithm (for host-side throughput)
lives in ``native/tokenizer``; this Python version is the behavioral
golden the native one is tested against.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np
import regex as re

VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77
SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"

_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte → printable-unicode-char map (GPT-2 convention):
    keeps visible ASCII/latin-1 as-is and relocates control bytes to
    256+ so BPE strings never contain raw whitespace/control chars."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word: Tuple[str, ...]) -> set:
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    # The reference stack runs ftfy.fix_text first; ftfy is optional here.
    try:
        import ftfy  # type: ignore

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
REAL_VOCAB_PATH = os.path.join(_DATA_DIR, "bpe_simple_vocab_16e6.txt.gz")
SUBSET_VOCAB_PATH = os.path.join(_DATA_DIR, "coco_en_merges.txt.gz")


def default_bpe_path() -> Optional[str]:
    """Default merges file: ``$CLIP_BPE_PATH`` → the real open_clip
    vocab in ``text/data/`` → the committed subset vocab → ``None``
    (byte-level fallback)."""
    env = os.environ.get("CLIP_BPE_PATH")
    if env and os.path.exists(env):
        return env
    for path in (REAL_VOCAB_PATH, SUBSET_VOCAB_PATH):
        if os.path.exists(path):
            return path
    return None


def _load_merges(bpe_path: str) -> List[Tuple[str, str]]:
    opener = gzip.open if bpe_path.endswith(".gz") else open
    with opener(bpe_path, "rt", encoding="utf-8") as fh:
        lines = fh.read().split("\n")
    # CLIP convention: skip the header line, keep exactly enough merges
    # to fill a 49,152-entry merged vocab (512 byte-level + merges).
    merges = lines[1 : 49152 - 256 - 2 + 1]
    return [tuple(m.split()) for m in merges if m]


class CLIPTokenizer:
    """CLIP byte-pair encoder.

    Args:
        bpe_path: path to ``bpe_simple_vocab_16e6.txt.gz`` (or an
            uncompressed merges file).  ``None`` → the
            :func:`default_bpe_path` resolution chain (env var → real
            vocab → committed subset vocab → byte-level fallback).
        context_length: tokens per sequence (reference: 77).
    """

    def __init__(self, bpe_path: Optional[str] = None, context_length: int = CONTEXT_LENGTH):
        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        bpe_path = bpe_path or default_bpe_path()
        if bpe_path and os.path.exists(bpe_path):
            merges = _load_merges(bpe_path)
            self.hermetic = False
            self.vocab_kind = (
                "subset" if os.path.abspath(bpe_path) == SUBSET_VOCAB_PATH
                else "openai"
            )
        else:
            merges = []
            self.hermetic = True
            self.vocab_kind = "byte-fallback"

        base = list(self.byte_encoder.values())
        vocab: List[str] = base + [v + "</w>" for v in base]
        vocab.extend("".join(m) for m in merges)

        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        # Specials pinned at the canonical CLIP ids so eot == max id in
        # both real-vocab and fallback modes (the text tower pools the
        # embedding at argmax(token ids)).
        self.sot_id = VOCAB_SIZE - 2
        self.eot_id = VOCAB_SIZE - 1
        self.encoder[SOT_TOKEN] = self.sot_id
        self.encoder[EOT_TOKEN] = self.eot_id
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self.cache: Dict[str, str] = {
            SOT_TOKEN: SOT_TOKEN,
            EOT_TOKEN: EOT_TOKEN,
        }
        self.vocab_size = VOCAB_SIZE

    # ------------------------------------------------------------------
    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word: Tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)

        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        """Text → BPE ids (no specials, no padding)."""
        ids: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(_PAT, text):
            token_bytes = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token_bytes).split(" "))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(
            self.decoder[i]
            for i in ids
            if i in self.decoder and i not in (self.sot_id, self.eot_id)
        )
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(
        self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None
    ) -> np.ndarray:
        """Tokenize a batch: (B, context_length) int32, zero-padded,
        truncated so position ``context_length-1`` holds ``eot`` when a
        caption overflows (open_clip's truncation convention)."""
        if isinstance(texts, str):
            texts = [texts]
        ctx = context_length or self.context_length
        out = np.zeros((len(texts), ctx), dtype=np.int32)
        for row, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text) + [self.eot_id]
            if len(ids) > ctx:
                ids = ids[:ctx]
                ids[-1] = self.eot_id
            out[row, : len(ids)] = ids
        return out


@functools.lru_cache(maxsize=4)
def get_tokenizer(model_name: str = "RN50", bpe_path: Optional[str] = None) -> CLIPTokenizer:
    """Parity with ``open_clip.get_tokenizer`` (sparsify_clip.py:692,560):
    all CLIP-family model names share one BPE, so ``model_name`` only
    exists to mirror the reference call sites (including eval's
    hardcoded ``get_tokenizer('RN50')``)."""
    del model_name
    return CLIPTokenizer(bpe_path=bpe_path)
