"""Threaded prefetching batch loader.

The reference uses torch DataLoader worker *processes* with pinned
memory (sparsify_clip.py:1060-1063) and tokenizes per step on the main
process (sparsify_clip.py:762) — a host-side serialization point.
Here decode + transform + caption choice + tokenization all happen in
worker threads, and batches are prefetched so host work overlaps the
device step (the TPU equivalent of pinned-memory prefetch; the heavy
lifting is PIL/numpy which release the GIL).

Batch schema: ``{"images": (B,S,S,3) f32, "tokens": (B,77) i32,
"captions": list[str]}``.

Determinism: per-(seed, epoch, index) RNG streams — shuffling, caption
choice and crop/flip draws are all reproducible and independent of
thread scheduling.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from sparsify_clip_tpu.data.transforms import test_transform, train_transform


class DataLoader:
    """Iterable over prefetched batches for one dataset split."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        tokenizer,
        train: bool,
        seed: int = 42,
        shuffle: Optional[bool] = None,
        drop_last: bool = True,
        num_threads: int = 4,
        prefetch: int = 2,
        image_size: int = 224,
        raw_uint8: bool = False,
        image_backend: str = "pil",
        process_index: int = 0,
        process_count: int = 1,
    ):
        """``raw_uint8``: skip host augmentation — squash-resize decoded
        images to ``image_size`` and ship uint8 (the device-augment
        path; crop/flip/normalize then run on-device via ops/image.py).

        ``image_backend``: "pil" (golden), "native" (C++ libjpeg decode
        + fused crop/resize/flip/normalize, native/imaging/), or "auto"
        (native when it builds).  Crop/flip/caption draws use the same
        RNG streams either way, so the backend never changes data order
        — only the resize arithmetic (~1/255; tests pin the parity).
        Items the native path can't handle (non-JPEG files) fall back
        to PIL individually.

        ``process_count > 1`` (multi-host training): this process loads
        only its contiguous ``batch_size // process_count`` slice of
        every global batch.  The epoch order and all per-item draws are
        keyed by (seed, epoch, GLOBAL index), so the union of the
        processes' slices is bit-identical to a single-process epoch —
        no coordination needed (parallel/multihost.py assembles the
        slices into global jax.Arrays)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.tokenizer = tokenizer
        self.train = train
        self.seed = seed
        self.shuffle = train if shuffle is None else shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.image_size = image_size
        self.raw_uint8 = raw_uint8
        if process_count > 1 and batch_size % process_count:
            raise ValueError(
                f"batch_size {batch_size} not divisible by "
                f"{process_count} processes (ragged per-host batches "
                "would deadlock collectives)"
            )
        if not 0 <= process_index < process_count:
            raise ValueError(
                f"process_index {process_index} out of range for "
                f"process_count {process_count}"
            )
        if process_count > 1 and not drop_last:
            raise ValueError(
                "process_count > 1 requires drop_last=True (a ragged "
                "final batch cannot split evenly across processes)"
            )
        self.process_index = process_index
        self.process_count = process_count
        self._native = None
        if image_backend in ("native", "auto"):
            from sparsify_clip_tpu.data.native_imaging import get_pipeline

            self._native = get_pipeline()
            if self._native is None and image_backend == "native":
                raise RuntimeError(
                    "image_backend='native' but the imaging library is unavailable"
                )
        if self.num_threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=self.num_threads)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # ------------------------------------------------------------------
    def _load_item(self, index: int, epoch: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, index, int(self.train)])
        )
        if self._native is not None:
            item = self._load_item_native(index, rng)
            if item is not None:
                return item
            # fresh stream: a failed native attempt may have consumed
            # draws; the PIL fallback must see the canonical sequence
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, index, int(self.train)])
            )
        img, captions = self.dataset[index]
        if self.raw_uint8:
            import numpy as _np
            from PIL import Image as _Image

            resized = img.convert("RGB").resize(
                (self.image_size, self.image_size), _Image.BILINEAR
            )
            arr = _np.asarray(resized, dtype=_np.uint8)
        elif self.train:
            arr = train_transform(img, rng, self.image_size)
        else:
            arr = test_transform(img, self.image_size)
        # one random caption out of the ≤5 (sparsify_clip.py:1050-1057)
        caption = captions[int(rng.integers(0, len(captions)))] if captions else ""
        return arr, caption

    def _load_item_native(self, index: int, rng: np.random.Generator):
        """C++ decode+transform path.  Consumes rng in exactly the PIL
        path's draw order (crop params → flip → caption) so switching
        backends never changes the data order.  Returns None to fall
        back to PIL (dataset without raw bytes / undecodable file)."""
        raw = getattr(self.dataset, "raw_bytes", None)
        if raw is None:
            return None
        jpeg = raw(index)
        if jpeg is None:
            return None
        from sparsify_clip_tpu.data.transforms import sample_resized_crop_params

        try:
            if self.raw_uint8:
                arr = self._native.transform(jpeg, self.image_size, uint8=True)
            elif self.train:
                h, w = self._native.dims(jpeg)
                top, left, ch, cw = sample_resized_crop_params(h, w, rng)
                flip = rng.random() < 0.5
                arr = self._native.transform(
                    jpeg, self.image_size, crop=(top, left, ch, cw), flip=flip
                )
            else:
                arr = self._native.transform(jpeg, self.image_size)
        except ValueError:
            return None
        captions = self._captions_of(index)
        caption = captions[int(rng.integers(0, len(captions)))] if captions else ""
        return arr, caption

    def _captions_of(self, index: int):
        """Caption list without decoding the image (native path)."""
        ds = self.dataset
        indices = []
        while hasattr(ds, "indices"):  # Subset chain
            indices.append(ds.indices)
            ds = ds.dataset
        for idx_map in indices:
            index = idx_map[index]
        if hasattr(ds, "index"):  # CocoCaptions
            return ds.index.captions[index]
        return ds[index][1]

    def _make_batch(self, indices: np.ndarray, epoch: int) -> Dict[str, np.ndarray]:
        if self.num_threads > 1 and len(indices) > 1:
            # PIL decode/resize and numpy transforms release the GIL —
            # per-item fan-out actually parallelizes on multi-core hosts
            items = list(
                self._pool.map(lambda i: self._load_item(int(i), epoch), indices)
            )
        else:
            items = [self._load_item(int(i), epoch) for i in indices]
        dtype = np.uint8 if self.raw_uint8 else np.float32
        images = np.stack([it[0] for it in items]).astype(dtype)
        captions = [it[1] for it in items]
        tokens = self.tokenizer(captions)
        return {"images": images, "tokens": tokens, "captions": captions}

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            ).permutation(n)
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]
        if self.process_count > 1:
            # this process's contiguous slice of every global batch —
            # the layout jax.make_array_from_process_local_data expects
            # for a leading-axis data sharding (process p owns devices
            # p*ldc..(p+1)*ldc-1, hence rows p*local..(p+1)*local)
            local = self.batch_size // self.process_count
            lo = self.process_index * local
            batches = [idx[lo : lo + local] for idx in batches]
        if not batches:
            return

        out: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error: list = []  # producer exception, re-raised in the consumer

        def _put(item) -> bool:
            # bounded put that stays responsive to abandonment
            while not stop.is_set():
                try:
                    out.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx_block in batches:
                    if stop.is_set():
                        return
                    if not _put(self._make_batch(idx_block, epoch)):
                        return
            except Exception as exc:  # decode/tokenize failures must
                error.append(exc)     # surface, not truncate the epoch
            finally:
                # sentinel; skipped when the consumer already stopped
                _put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out.get()
                if batch is None:
                    break
                yield batch
            if error:
                raise RuntimeError(
                    f"data loader worker failed at epoch {epoch}"
                ) from error[0]
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=5)

    def __iter__(self):
        return self.epoch(0)
