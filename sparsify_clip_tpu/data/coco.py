"""COCO captions dataset — pure-Python JSON index, no pycocotools.

The reference loads COCO through torchvision ``CocoCaptions`` +
pycocotools (sparsify_clip.py:1021-1032).  Captions-only training
needs none of the mask machinery: the annotation file is plain JSON
(``images: [{id, file_name}]``, ``annotations: [{image_id, caption}]``),
so a dict index replaces the C extension.

Ordering parity: torchvision's CocoDetection iterates
``sorted(coco.imgs.keys())`` — items here are ordered by ascending
image id, so ``num_{train,test}_samples`` head-subsets
(sparsify_clip.py:1034-1046) select the same images.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from PIL import Image


class CocoCaptionIndex:
    """image-id-ordered index of (file_name, [captions])."""

    def __init__(self, annotation_file: str):
        with open(annotation_file, "r") as fh:
            raw = json.load(fh)
        files: Dict[int, str] = {
            img["id"]: img["file_name"] for img in raw.get("images", [])
        }
        captions: Dict[int, List[str]] = {img_id: [] for img_id in files}
        for ann in raw.get("annotations", []):
            img_id = ann["image_id"]
            if img_id in captions:
                captions[img_id].append(ann["caption"])
        self.ids: List[int] = sorted(files)
        self.file_names: List[str] = [files[i] for i in self.ids]
        self.captions: List[List[str]] = [captions[i] for i in self.ids]

    def __len__(self) -> int:
        return len(self.ids)


class CocoCaptions:
    """(image, captions) dataset over a COCO image dir + caption JSON.

    ``transform(img: PIL.Image) -> np.ndarray`` runs per item (the
    loader passes per-item RNG-seeded train transforms through a
    closure).  Surface parity with torchvision CocoCaptions as consumed
    at sparsify_clip.py:1021-1032.
    """

    def __init__(
        self,
        root: str,
        annotation_file: str,
        transform: Optional[Callable] = None,
    ):
        self.root = root
        self.index = CocoCaptionIndex(annotation_file)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.index)

    def image_path(self, i: int) -> str:
        return os.path.join(self.root, self.index.file_names[i])

    def __getitem__(self, i: int) -> Tuple[object, List[str]]:
        img = Image.open(self.image_path(i))
        if self.transform is not None:
            img = self.transform(img)
        return img, self.index.captions[i]

    def raw_bytes(self, i: int) -> Optional[bytes]:
        """Undecoded JPEG bytes for the native image pipeline (None for
        non-JPEG files — the loader falls back to PIL per item)."""
        path = self.image_path(i)
        if not path.lower().endswith((".jpg", ".jpeg")):
            return None
        with open(path, "rb") as fh:
            return fh.read()


class Subset:
    """Head-subset wrapper (torch.utils.data.Subset equivalent as used
    at sparsify_clip.py:1034-1046)."""

    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]

    def raw_bytes(self, i: int) -> Optional[bytes]:
        inner = getattr(self.dataset, "raw_bytes", None)
        return inner(self.indices[i]) if inner is not None else None
