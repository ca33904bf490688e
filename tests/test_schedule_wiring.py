"""The train step's logged LR/β/α must trace the reference schedules:
LR at the 0-based optimizer step, β/α at the 1-based batch index
(SURVEY.md §2.7 conventions)."""

import numpy as np
import pytest

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.schedules import cosine_lr_factor, get_alpha, get_beta
from sparsify_clip_tpu.train import create_train_setup

MODEL_REGISTRY.setdefault(
    "wire-tiny",
    CLIPConfig(
        name="wire-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(1,), vision_heads=2, patch_size=16,
        vocab_size=256, context_length=8, text_width=16, text_heads=2,
        text_layers=1,
    ),
)

RNG = np.random.default_rng(0)


def _batch(b=8):
    tokens = RNG.integers(1, 250, size=(b, 8)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    return {
        "images": RNG.standard_normal((b, 32, 32, 3)).astype(np.float32),
        "tokens": tokens,
    }


def test_lr_beta_alpha_trace_reference_schedules():
    steps_per_epoch, epochs = 5, 4
    total = steps_per_epoch * epochs
    cfg = ExperimentConfig.from_dict({
        "model": "wire-tiny", "batch_size": 8, "epochs": epochs,
        "learning_rate": 1e-3,
        "loss_type": "only_lunif_n_then_anchor+ALPHA*lalign+BETA*(lunif(text)+lunif(img))",
        "only_lunif_epochs": 0,
        "beta_warmup_epoch": 20, "beta_decay_epoch": 50,
        "alpha_warmup_epoch": 50, "alpha_increment_epoch": 50,
        "fp16": False,
    })
    mesh = create_mesh(data=1, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=steps_per_epoch, mesh=mesh)
    warmup = int(0.20 * total)

    state = setup.state
    batch = shard_batch(_batch(), mesh)
    for step in range(total):
        state, metrics = setup.train_step(state, batch)
        # LR logged for the step just taken: factor(step), 0-based
        want_lr = 1e-3 * cosine_lr_factor(step, warmup, total, 0)
        assert float(metrics["learning_rate"]) == pytest.approx(want_lr, rel=1e-4)
        # β/α at the 1-based batch counter (reference increments first,
        # sparsify_clip.py:755)
        want_beta = get_beta(step + 1, total, 20, 50)
        want_alpha = get_alpha(step + 1, total, 50, 50)
        assert float(metrics["beta"]) == pytest.approx(want_beta, abs=1e-5)
        assert float(metrics["alpha"]) == pytest.approx(want_alpha, abs=1e-5)


def test_lr_hold_with_sparsify_phase():
    steps_per_epoch, epochs = 5, 2
    total = steps_per_epoch * epochs
    cfg = ExperimentConfig.from_dict({
        "model": "wire-tiny", "batch_size": 8, "epochs": epochs,
        "learning_rate": 1e-3,
        "loss_type": "only_lunif_n_then_anchor+lalign+lunif(centroids)",
        "only_lunif_epochs": 1, "fp16": False,
    })
    mesh = create_mesh(data=1, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=steps_per_epoch, mesh=mesh)
    state = setup.state
    batch = shard_batch(_batch(), mesh)
    for step in range(total):
        state, metrics = setup.train_step(state, batch)
        # all steps < 462 hold the LR factor at 1.0 (reference
        # steps_sparsify default, sparsify_clip.py:100-101)
        assert float(metrics["learning_rate"]) == pytest.approx(1e-3, rel=1e-5)
