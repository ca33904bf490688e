"""Auto-resume: crash-recovery from the latest full orbax checkpoint."""

import pytest
import json

import yaml

from sparsify_clip_tpu.cli import main
from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY

MODEL_REGISTRY.setdefault(
    "resume-tiny",
    CLIPConfig(
        name="resume-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=49408, context_length=77, text_width=16, text_heads=2,
        text_layers=2,
    ),
)


@pytest.mark.slow
def test_auto_resume_continues_from_full_state(tmp_path):
    base = {
        "project_name": "t", "run_name": "auto_resume",
        "seed": 42, "learning_rate": "1e-3", "batch_size": 8,
        "model": "resume-tiny", "num_train_samples": 16, "num_test_samples": 8,
        "epochs": 2, "loss_type": "anchor", "only_lunif_epochs": 0,
        "anchor_temperature": 0.1, "anchor_temperature_learnable": False,
        "save_checkpoint_every_n_epochs": 2,  # checkpoint at epoch 2 (step 4)
        "resume_checkpoint": False, "fp16": False, "dataset": "synthetic",
        "log_dir": str(tmp_path / "logs"),
        "checkpoint_dir": str(tmp_path / "models"),
        "log_backend": "jsonl",
    }
    main(ExperimentConfig.from_dict(dict(base)), image_size=32)
    assert (tmp_path / "models" / "auto_resume").is_dir()

    # "crash" and resume: full state restores step/optimizer.  Auto
    # resume COMPLETES the configured schedule (run_training end_epoch
    # semantics), so extending a finished 2-epoch run means raising
    # epochs — here to 3, which trains exactly one more epoch.
    resumed = dict(base)
    resumed.update({
        "resume_checkpoint": "auto", "epochs": 3,
        # checkpoint the final epoch too, so the completed run's full
        # state is on disk for the idempotency re-run below
        "save_checkpoint_every_n_epochs": 1,
    })
    main(ExperimentConfig.from_dict(resumed), image_size=32)

    records = [json.loads(l) for l in open(tmp_path / "logs" / "auto_resume.jsonl")]
    steps = [r for r in records if "train_loss" in r]
    # 2 epochs x 2 steps first run + 1 more epoch x 2 steps resumed
    assert len(steps) == 6
    # LR continuity: the resumed run's first LR continues the schedule
    # (not a from-scratch warmup restart)
    lrs = [r["learning_rate"] for r in steps]
    assert lrs[4] > 0  # step 5 of the cosine schedule, not warmup step 0

    # resuming an already-complete run trains zero additional steps
    # (final eval still runs; the run stays resumable/idempotent)
    done = dict(base)
    done.update({"resume_checkpoint": "auto", "epochs": 3})
    main(ExperimentConfig.from_dict(done), image_size=32)
    records = [json.loads(l) for l in open(tmp_path / "logs" / "auto_resume.jsonl")]
    assert len([r for r in records if "train_loss" in r]) == 6


def test_mid_epoch_resume_is_data_order_exact():
    """A run stopped mid-epoch and resumed with skip_steps sees exactly
    the batches the stopped run never trained: final params are
    bit-equal to the uninterrupted run's (same programs, same inputs,
    deterministic CPU backend)."""
    import numpy as np
    import jax

    from sparsify_clip_tpu.train import create_train_setup, run_training

    cfg = ExperimentConfig.from_dict({
        "project_name": "t", "run_name": "midresume", "seed": 0,
        "learning_rate": "1e-3", "batch_size": 8, "model": "resume-tiny",
        "epochs": 2, "loss_type": "anchor", "only_lunif_epochs": 0,
        "anchor_temperature": 0.1, "anchor_temperature_learnable": False,
        "save_checkpoint_every_n_epochs": 1000, "fp16": False,
    })
    spe = 3

    def batches(epoch):
        rng = np.random.default_rng(100 + epoch)  # per-epoch stream
        for _ in range(spe):
            tokens = rng.integers(1, 49000, size=(8, 77)).astype(np.int32)
            tokens[:, 0], tokens[:, -1] = 49406, 49407
            yield {
                "images": rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
                "tokens": tokens,
            }

    def make():
        return create_train_setup(cfg, steps_per_epoch=spe, image_size=32)

    full = run_training(make(), batches)
    assert int(full.step) == 2 * spe

    # stop after 2 of epoch 0's 3 steps (mid-epoch preemption)
    calls = {"n": 0}

    def stop_after_two():
        calls["n"] += 1
        return calls["n"] >= 2

    partial_setup = make()
    partial = run_training(partial_setup, batches, stop_fn=stop_after_two)
    assert partial_setup.stopped_early and int(partial.step) == 2

    # resume exactly where it stopped: epoch 0, skipping 2 batches,
    # completing the ORIGINAL 2-epoch schedule
    resume_setup = make()
    resume_setup.state = partial
    resumed = run_training(
        resume_setup, batches,
        start_epoch=int(partial.step) // spe,
        skip_steps=int(partial.step) % spe,
        end_epoch=cfg.epochs,
    )
    assert int(resumed.step) == 2 * spe
    for a, b in zip(
        jax.tree_util.tree_leaves(full.params),
        jax.tree_util.tree_leaves(resumed.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
