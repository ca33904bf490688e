"""Optional grain-backed data loader (production IO).

`grain` gives deterministic, checkpointable, multi-worker input
pipelines — the production-grade replacement for both the reference's
torch DataLoader processes (sparsify_clip.py:1060-1063) and this
repo's thread loader.  This backend wraps any dataset exposing the
``CocoCaptions`` item interface (``ds[i] -> (PIL image, [captions])``)
as a grain ``RandomAccessDataSource`` with the same transform +
caption-choice + tokenize semantics and the same batch schema as
:class:`sparsify_clip_tpu.data.loader.DataLoader`.

Select with ``loader_backend: "grain"`` in the config (the thread
loader remains the default — on single-core hosts grain's
multiprocessing adds overhead without parallelism).
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

try:  # pragma: no cover - availability probe
    import grain.python as grain

    GRAIN_AVAILABLE = True
except ImportError:  # pragma: no cover
    GRAIN_AVAILABLE = False

from sparsify_clip_tpu.data.transforms import test_transform, train_transform


class _DecodeTransform:
    """grain MapWithIndexTransform-style callable: record → batchable dict."""

    def __init__(self, tokenizer, train: bool, seed: int, image_size: int):
        self.tokenizer = tokenizer
        self.train = train
        self.seed = seed
        self.image_size = image_size

    def __call__(self, record):
        index, img, captions = record
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, index, int(self.train)])
        )
        if self.train:
            arr = train_transform(img, rng, self.image_size)
        else:
            arr = test_transform(img, self.image_size)
        caption = captions[int(rng.integers(0, len(captions)))] if captions else ""
        tokens = self.tokenizer([caption])[0]
        return {"images": arr.astype(np.float32), "tokens": tokens}


class _Source:
    """RandomAccessDataSource over a CocoCaptions-style dataset.

    Records carry their index so the map transform can derive a
    deterministic per-sample RNG stream (grain's MapWithIndexTransform
    alias is not dispatch-compatible in this grain version)."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, i):
        img, captions = self._dataset[int(i)]
        return int(i), img, captions


class GrainDataLoader:
    """Interface-compatible twin of the thread DataLoader.

    Note: grain's epoch seed is baked into the sampler, so each
    ``epoch(n)`` builds a fresh sampler seeded with (seed, n) —
    shuffling and augmentation remain deterministic per (seed, epoch).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        tokenizer,
        train: bool,
        seed: int = 42,
        shuffle=None,
        drop_last: bool = True,
        num_workers: int = 0,
        image_size: int = 224,
    ):
        if not GRAIN_AVAILABLE:  # pragma: no cover
            raise RuntimeError("grain is not installed")
        self.dataset = dataset
        self.batch_size = batch_size
        self.tokenizer = tokenizer
        self.train = train
        self.seed = seed
        self.shuffle = train if shuffle is None else shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.image_size = image_size

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        sampler = grain.IndexSampler(
            num_records=len(self.dataset),
            shuffle=self.shuffle,
            seed=int(np.random.SeedSequence([self.seed, epoch]).generate_state(1)[0]),
            num_epochs=1,
            shard_options=grain.NoSharding(),
        )
        operations = [
            _DecodeMap(self.tokenizer, self.train, self.seed + epoch, self.image_size),
            grain.Batch(batch_size=self.batch_size, drop_remainder=self.drop_last),
        ]
        loader = grain.DataLoader(
            data_source=_Source(self.dataset),
            sampler=sampler,
            operations=operations,
            worker_count=self.num_workers,
        )
        for batch in loader:
            batch["captions"] = [""] * batch["images"].shape[0]
            yield batch

    def __iter__(self):
        return self.epoch(0)


if GRAIN_AVAILABLE:

    class _DecodeMap(grain.MapTransform):
        def __init__(self, tokenizer, train, seed, image_size):
            self._fn = _DecodeTransform(tokenizer, train, seed, image_size)

        def map(self, record):
            return self._fn(record)
