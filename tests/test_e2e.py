"""End-to-end: the full CLI experiment on a tiny model + synthetic data
(the reference's experiment_2 flow, shrunk; SURVEY.md §4e)."""

import json
import os

import numpy as np
import pytest
import yaml

from sparsify_clip_tpu.cli import main
from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY

MODEL_REGISTRY.setdefault(
    "e2e-tiny",
    CLIPConfig(
        name="e2e-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=49408, context_length=77, text_width=16, text_heads=2,
        text_layers=2,
    ),
)


@pytest.fixture()
def tiny_config(tmp_path):
    return ExperimentConfig.from_dict({
        "project_name": "test", "run_name": "e2e_exp2_tiny",
        "seed": 42, "learning_rate": "1e-3", "batch_size": 8,
        "model": "e2e-tiny", "num_train_samples": 16, "num_test_samples": 8,
        "epochs": 2, "loss_type": "anchor", "only_lunif_epochs": 0,
        "anchor_temperature": 0.1, "anchor_temperature_learnable": False,
        "save_checkpoint_every_n_epochs": 2, "resume_checkpoint": False,
        "fp16": False, "dataset": "synthetic",
        "log_dir": str(tmp_path / "logs"),
        "checkpoint_dir": str(tmp_path / "models"),
        "log_backend": "jsonl",
    })


@pytest.mark.slow
def test_full_experiment_runs(tiny_config, tmp_path):
    final = main(tiny_config, image_size=32)
    # 13-metric schema (reference final_log, sparsify_clip.py:659-667)
    assert len(final) == 13
    assert "backward_r1" in final and "uniformity" in final

    # JSONL log exists with train steps + eval records
    log_path = tmp_path / "logs" / "e2e_exp2_tiny.jsonl"
    records = [json.loads(l) for l in open(log_path)]
    train_steps = [r for r in records if "train_loss" in r]
    assert len(train_steps) == 2 * (16 // 8)  # epochs * steps_per_epoch
    assert all(np.isfinite(r["train_loss"]) for r in train_steps)
    evals = [r for r in records if "backward_r1" in r]
    # pre-train + per-epoch (2) + final
    assert len(evals) == 4

    # checkpoints: weights npz (reference naming) + final + orbax dir
    assert (tmp_path / "models" / "e2e_exp2_tiny_epoch_2.npz").exists()
    assert (tmp_path / "models" / "e2e_exp2_tiny.npz").exists()
    assert (tmp_path / "models" / "e2e_exp2_tiny").is_dir()


@pytest.mark.slow
def test_cli_file_mode(tmp_path):
    cfg_path = tmp_path / "exp.yaml"
    cfg = {
        "project_name": "test", "run_name": "cli_file_mode",
        "seed": 42, "learning_rate": "1e-3", "batch_size": 8,
        "model": "e2e-tiny", "num_train_samples": 8, "num_test_samples": 8,
        "epochs": 1, "loss_type": "anchor", "only_lunif_epochs": 0,
        "anchor_temperature": 0.1, "anchor_temperature_learnable": False,
        "save_checkpoint_every_n_epochs": 5, "resume_checkpoint": False,
        "fp16": False, "dataset": "synthetic",
        "log_dir": str(tmp_path / "logs"),
        "checkpoint_dir": str(tmp_path / "models"),
        "log_backend": "jsonl",
    }
    cfg_path.write_text(yaml.safe_dump(cfg))
    from sparsify_clip_tpu.cli import cli

    cli(["--config", str(cfg_path), "--device", "0", "--image-size", "32"])
    assert (tmp_path / "logs" / "cli_file_mode.jsonl").exists()


@pytest.mark.slow
def test_resume_weights_only(tiny_config, tmp_path):
    main(tiny_config, image_size=32)
    resumed = ExperimentConfig.from_dict({
        **tiny_config.to_dict(),
        "run_name": "e2e_resumed",
        "resume_checkpoint": str(tmp_path / "models" / "e2e_exp2_tiny.npz"),
        "resume_epoch": 2,
        "epochs": 1,
    })
    final = main(resumed, image_size=32)
    assert len(final) == 13
