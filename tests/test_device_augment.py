"""device_augment path: uint8 staging batches, on-device crop/flip/
normalize inside the train step, advancing PRNG per step."""

import numpy as np
import pytest

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.data import dataset_loader
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.train import create_train_setup

MODEL_REGISTRY.setdefault(
    "aug-tiny",
    CLIPConfig(
        name="aug-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=49408, context_length=77, text_width=16, text_heads=2,
        text_layers=2,
    ),
)


@pytest.fixture()  # function-scoped: train_step donates setup.state
def setup_and_loader():
    cfg = ExperimentConfig.from_dict({
        "model": "aug-tiny", "batch_size": 8, "epochs": 1,
        "learning_rate": 1e-3, "loss_type": "anchor", "fp16": False,
        "dataset": "synthetic", "num_train_samples": 16, "num_test_samples": 8,
        "device_augment": True, "device_augment_staging": 48,
    })
    train_loader, _ = dataset_loader(cfg, image_size=32)
    mesh = create_mesh(data=1, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=2, mesh=mesh, image_size=32)
    return setup, train_loader, mesh


def test_loader_ships_uint8_staging(setup_and_loader):
    _, loader, _ = setup_and_loader
    batch = next(iter(loader))
    assert batch["images"].dtype == np.uint8
    assert batch["images"].shape == (8, 48, 48, 3)  # staging, not model size


def test_step_trains_on_uint8_and_advances_rng(setup_and_loader):
    setup, loader, mesh = setup_and_loader
    state = setup.state
    rng0 = np.asarray(state.rng).copy()
    losses = []
    for batch in loader.epoch(0):
        dev = shard_batch({"images": batch["images"], "tokens": batch["tokens"]}, mesh)
        state, metrics = setup.train_step(state, dev)
        losses.append(float(metrics["train_loss"]))
    assert np.isfinite(losses).all()
    # augmentation PRNG advanced
    assert np.abs(np.asarray(state.rng) - rng0).max() > 0


def test_augmentation_varies_across_steps(setup_and_loader):
    """Same uint8 batch twice → different crops (rng advanced) →
    different losses."""
    setup, loader, mesh = setup_and_loader
    state = setup.state
    batch = next(iter(loader))
    dev = shard_batch({"images": batch["images"], "tokens": batch["tokens"]}, mesh)
    state, m1 = setup.train_step(state, dev)
    dev = shard_batch({"images": batch["images"], "tokens": batch["tokens"]}, mesh)
    state, m2 = setup.train_step(state, dev)
    # losses differ by more than the weight-update effect alone would
    # explain at lr 1e-3?  Can't separate cleanly; just require they
    # are not bit-identical (same batch + same crops would be a bug
    # given weight updates are tiny)
    assert float(m1["train_loss"]) != float(m2["train_loss"])
