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

    # "crash" and resume: full state restores step/optimizer; one more epoch
    resumed = dict(base)
    resumed.update({"resume_checkpoint": "auto", "epochs": 1})
    main(ExperimentConfig.from_dict(resumed), image_size=32)

    records = [json.loads(l) for l in open(tmp_path / "logs" / "auto_resume.jsonl")]
    steps = [r for r in records if "train_loss" in r]
    # 2 epochs x 2 steps first run + 1 epoch x 2 steps resumed
    assert len(steps) == 6
    # LR continuity: the resumed run's first LR continues the schedule
    # (not a from-scratch warmup restart)
    lrs = [r["learning_rate"] for r in steps]
    assert lrs[4] > 0  # step 5 of the cosine schedule, not warmup step 0
