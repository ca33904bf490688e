"""Batch embedding export — the serving entry point.

The reference has no deployment surface at all (its only inference is
the eval loop, sparsify_clip.py:534-676); this CLI turns a trained
checkpoint into embeddings usable by downstream retrieval/serving:

    python -m sparsify_clip_tpu.encode \
        --model RN50 --weights models/run.npz \
        --images data/coco/images/val2017 --texts captions.txt \
        --out embeddings.npz

Writes an ``.npz`` with ``image_embeddings`` (N, D) / ``image_files``
and/or ``text_embeddings`` (M, D) / ``texts`` — all L2-normalized, fp32
— plus a retrieval smoke: when both modalities are given, prints the
top-1 text for the first few images.

Weights: a ``save_weights`` .npz (this framework's export, also what
the reference-parity periodic checkpoints write) or a torch CLIP
``state_dict`` converted offline via ``load_torch_clip_state_dict``.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Sequence

import numpy as np


IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _list_images(path: str) -> List[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith(IMAGE_EXTS)
    )


def _load_image_batch(paths: Sequence[str], image_size: int) -> np.ndarray:
    """Eval-protocol pixels: squash-resize + CLIP-normalize, preferring
    the native pipeline for JPEGs."""
    from sparsify_clip_tpu.data.native_imaging import get_pipeline
    from sparsify_clip_tpu.data.transforms import test_transform

    native = get_pipeline()
    out = np.empty((len(paths), image_size, image_size, 3), np.float32)
    for i, p in enumerate(paths):
        if native is not None and p.lower().endswith((".jpg", ".jpeg")):
            with open(p, "rb") as fh:
                try:
                    out[i] = native.transform(fh.read(), image_size)
                    continue
                except ValueError:
                    pass
        from PIL import Image

        out[i] = test_transform(Image.open(p), size=image_size)
    return out


def main(argv: Optional[Sequence[str]] = None) -> str:
    ap = argparse.ArgumentParser(
        description="Export L2-normalized CLIP embeddings to .npz"
    )
    ap.add_argument("--model", default="RN50")
    ap.add_argument("--weights", required=True,
                    help=".npz from save_weights / the periodic checkpoints")
    ap.add_argument("--images", default=None,
                    help="image file or directory (jpg/png/...)")
    ap.add_argument("--texts", default=None,
                    help="text file, one caption per line")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--bpe-vocab", default=None)
    args = ap.parse_args(argv)
    if not args.images and not args.texts:
        ap.error("need --images and/or --texts")

    import jax.numpy as jnp

    from sparsify_clip_tpu.checkpoints import load_weights
    from sparsify_clip_tpu.inference import CLIPEncoder, RetrievalIndex
    from sparsify_clip_tpu.models import create_model
    from sparsify_clip_tpu.text import get_tokenizer

    model, variables = create_model(
        args.model, dtype=jnp.bfloat16, image_size=args.image_size
    )
    params = load_weights(variables["params"], args.weights)
    enc_vars = {"params": params}
    if "batch_stats" in variables:
        enc_vars["batch_stats"] = variables["batch_stats"]
    tokenizer = get_tokenizer(args.model, bpe_path=args.bpe_vocab)
    encoder = CLIPEncoder(model, enc_vars, tokenizer)
    image_size = args.image_size or model.cfg.image_size

    payload = {}
    if args.images:
        files = _list_images(args.images)
        chunks = []
        for i in range(0, len(files), args.batch_size):
            batch = _load_image_batch(files[i : i + args.batch_size], image_size)
            chunks.append(np.asarray(encoder.encode_images(batch), np.float32))
        payload["image_embeddings"] = np.concatenate(chunks, axis=0)
        payload["image_files"] = np.asarray(files)
        print(f"encoded {len(files)} images -> {payload['image_embeddings'].shape}")
    if args.texts:
        with open(args.texts) as fh:
            texts = [line.rstrip("\n") for line in fh if line.strip()]
        chunks = []
        for i in range(0, len(texts), args.batch_size):
            chunk = encoder.encode_texts(texts[i : i + args.batch_size])
            chunks.append(np.asarray(chunk, np.float32))
        payload["text_embeddings"] = np.concatenate(chunks, axis=0)
        payload["texts"] = np.asarray(texts)
        print(f"encoded {len(texts)} texts -> {payload['text_embeddings'].shape}")

    if "image_embeddings" in payload and "text_embeddings" in payload:
        index = RetrievalIndex(payload["text_embeddings"])
        scores, idx = index.search(payload["image_embeddings"][:3], k=1)
        for i in range(idx.shape[0]):
            print(
                f"image {os.path.basename(str(payload['image_files'][i]))!r} -> "
                f"text {str(payload['texts'][idx[i, 0]])!r} ({scores[i, 0]:.3f})"
            )

    np.savez(args.out, **payload)
    print(f"wrote {args.out}")
    return args.out


if __name__ == "__main__":
    main()
