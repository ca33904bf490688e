from sparsify_clip_tpu.text.tokenizer import CLIPTokenizer, get_tokenizer  # noqa: F401
