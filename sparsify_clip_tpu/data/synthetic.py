"""Synthetic image-caption dataset + on-disk COCO fixture generator.

Two hermetic data paths (the reference has none — it hard-requires a
downloaded COCO tree, sparsify_clip.py:995-1000):

* :class:`SyntheticCaptions` — in-memory procedurally generated
  (image, captions) pairs with real caption *strings* so the full
  tokenizer path is exercised;
* :func:`write_coco_fixture` — writes a tiny but schema-faithful COCO
  directory (JPEGs + ``captions_*.json``) for end-to-end pipeline
  tests against the real COCO loading code.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np
from PIL import Image

_OBJECTS = [
    "cat", "dog", "surfboard", "pizza", "bicycle", "giraffe", "kite",
    "train", "umbrella", "sandwich", "bench", "clock",
]
_VERBS = ["sitting on", "riding", "holding", "next to", "jumping over", "eating"]
_PLACES = ["a beach", "the street", "a table", "the park", "a field", "snow"]


def make_caption(rng: np.random.Generator) -> str:
    return (
        f"a {_OBJECTS[rng.integers(len(_OBJECTS))]} "
        f"{_VERBS[rng.integers(len(_VERBS))]} "
        f"{_PLACES[rng.integers(len(_PLACES))]}"
    )


def make_image(rng: np.random.Generator, size: int = 64) -> Image.Image:
    """Structured noise (colored gradient + blobs) so crops differ."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.stack(
        [
            0.5 + 0.5 * np.sin(2 * np.pi * (x * rng.uniform(1, 3) + rng.random())),
            0.5 + 0.5 * np.cos(2 * np.pi * (y * rng.uniform(1, 3) + rng.random())),
            rng.random() * np.ones_like(x),
        ],
        axis=-1,
    )
    noise = rng.random((size, size, 3)).astype(np.float32) * 0.3
    arr = np.clip(base * 0.7 + noise, 0, 1)
    return Image.fromarray((arr * 255).astype(np.uint8))


class SyntheticCaptions:
    """In-memory dataset with the CocoCaptions item interface."""

    def __init__(self, num_samples: int = 256, seed: int = 0, image_size: int = 64,
                 captions_per_image: int = 5):
        self.num_samples = num_samples
        self.seed = seed
        self.image_size = image_size
        self.captions_per_image = captions_per_image

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, i: int) -> Tuple[Image.Image, List[str]]:
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, i]))
        img = make_image(rng, self.image_size)
        captions = [make_caption(rng) for _ in range(self.captions_per_image)]
        return img, captions


def write_coco_fixture(
    root: str,
    num_train: int = 8,
    num_val: int = 8,
    image_size: int = 64,
    seed: int = 0,
) -> str:
    """Create ``root/{images/{train2017,val2017}, annotations}`` in the
    COCO layout the reference hardcodes (sparsify_clip.py:995-1000).
    Returns ``root``.
    """
    rng = np.random.default_rng(seed)
    for split, count in (("train2017", num_train), ("val2017", num_val)):
        img_dir = os.path.join(root, "images", split)
        os.makedirs(img_dir, exist_ok=True)
        images, annotations = [], []
        ann_id = 1
        for i in range(count):
            img_id = 1000 + i if split == "train2017" else 2000 + i
            file_name = f"{img_id:012d}.jpg"
            make_image(rng, image_size).save(os.path.join(img_dir, file_name))
            images.append(
                {"id": img_id, "file_name": file_name,
                 "height": image_size, "width": image_size}
            )
            for _ in range(5):
                annotations.append(
                    {"id": ann_id, "image_id": img_id, "caption": make_caption(rng)}
                )
                ann_id += 1
        ann_dir = os.path.join(root, "annotations")
        os.makedirs(ann_dir, exist_ok=True)
        year_split = f"captions_{split}.json"
        with open(os.path.join(ann_dir, year_split), "w") as fh:
            json.dump(
                {"images": images, "annotations": annotations,
                 "info": {"description": "synthetic fixture"}},
                fh,
            )
    return root
