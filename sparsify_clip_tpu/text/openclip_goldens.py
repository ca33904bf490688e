"""Known open_clip / OpenAI CLIP SimpleTokenizer outputs.

Used by tests/test_openclip_golden.py (skipif-gated on the real vocab
file) and scripts/verify_vocab.py to prove token-id parity with the
reference's tokenizer (/root/reference/sparsify_clip.py:692,560) the
moment the ``bpe_simple_vocab_16e6.txt.gz`` data file is available.

Ids are widely documented for these canonical phrases
(sot=49406, eot=49407).
"""

OPENCLIP_GOLDENS = {
    "a photo of a cat": [49406, 320, 1125, 539, 320, 2368, 49407],
    "a photo of a dog": [49406, 320, 1125, 539, 320, 1929, 49407],
}
