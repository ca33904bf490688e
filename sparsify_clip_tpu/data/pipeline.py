"""dataset_loader: config → (train_loader, test_loader).

Mirrors the reference's ``dataset_loader`` (sparsify_clip.py:992-1065):
COCO train2017/val2017 under ``config.data_root`` (the reference
hardcodes ``./data/coco``), head-subsets via
``num_{train,test}_samples``, train shuffle + drop_last, eval ordered +
drop_last (so ``num_test_samples: 512`` at batch 256 yields exactly 2
batches — the reference protocol).

``config.dataset == "synthetic"`` swaps in the procedural dataset so
the pipeline runs hermetically (no reference equivalent; gated
extension).
"""

from __future__ import annotations

import os
from typing import Tuple

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.data.coco import CocoCaptions, Subset
from sparsify_clip_tpu.data.loader import DataLoader
from sparsify_clip_tpu.data.synthetic import SyntheticCaptions
from sparsify_clip_tpu.text import get_tokenizer


def _select_tokenizer(config: ExperimentConfig):
    if config.tokenizer in ("native", "auto"):
        try:
            from sparsify_clip_tpu.text.native import NativeCLIPTokenizer

            return NativeCLIPTokenizer(merges_path=config.bpe_vocab_path)
        except (RuntimeError, OSError):
            if config.tokenizer == "native":
                raise
    return get_tokenizer(config.model, bpe_path=config.bpe_vocab_path)


def dataset_loader(
    config: ExperimentConfig, image_size: int = 224, num_threads: int = 4
) -> Tuple[DataLoader, DataLoader]:
    tokenizer = _select_tokenizer(config)

    # Multi-host: each process loads only its slice of every global
    # batch (config.multihost; jax.distributed is initialized by the
    # CLI before data loading).  Single-process these are (0, 1) and
    # the loaders behave exactly as before.
    process_index, process_count = 0, 1
    if config.multihost:
        import jax

        process_index, process_count = jax.process_index(), jax.process_count()

    if config.dataset == "synthetic":
        n_train = 2048 if config.num_train_samples == -1 else config.num_train_samples
        n_test = 512 if config.num_test_samples == -1 else config.num_test_samples
        train_ds = SyntheticCaptions(n_train, seed=config.seed)
        test_ds = SyntheticCaptions(n_test, seed=config.seed + 1)
    else:
        root = config.data_root
        train_ds = CocoCaptions(
            os.path.join(root, "images", "train2017"),
            os.path.join(root, "annotations", "captions_train2017.json"),
        )
        test_ds = CocoCaptions(
            os.path.join(root, "images", "val2017"),
            os.path.join(root, "annotations", "captions_val2017.json"),
        )
        if config.num_train_samples != -1:
            train_ds = Subset(train_ds, range(config.num_train_samples))
        if config.num_test_samples != -1:
            test_ds = Subset(test_ds, range(config.num_test_samples))

    if config.loader_backend == "grain":
        from sparsify_clip_tpu.data.grain_loader import GrainDataLoader

        train_loader = GrainDataLoader(
            train_ds, config.batch_size, tokenizer, train=True, seed=config.seed,
            shuffle=True, drop_last=True, image_size=image_size,
        )
        test_loader = GrainDataLoader(
            test_ds, config.batch_size, tokenizer, train=False, seed=config.seed,
            shuffle=False, drop_last=True, image_size=image_size,
        )
        return train_loader, test_loader

    if config.device_augment:
        # ship uint8 staging images; crop/flip/normalize happen on
        # device inside the train step (ops/image.py)
        train_loader = DataLoader(
            train_ds, config.batch_size, tokenizer, train=True, seed=config.seed,
            shuffle=True, drop_last=True, num_threads=num_threads,
            image_size=config.device_augment_staging, raw_uint8=True,
            image_backend=config.image_backend,
            process_index=process_index, process_count=process_count,
        )
    else:
        train_loader = DataLoader(
            train_ds, config.batch_size, tokenizer, train=True, seed=config.seed,
            shuffle=True, drop_last=True, num_threads=num_threads,
            image_size=image_size, image_backend=config.image_backend,
            process_index=process_index, process_count=process_count,
        )
    test_loader = DataLoader(
        test_ds, config.batch_size, tokenizer, train=False, seed=config.seed,
        shuffle=False, drop_last=True, num_threads=num_threads,
        image_size=image_size, image_backend=config.image_backend,
        process_index=process_index, process_count=process_count,
    )
    return train_loader, test_loader
