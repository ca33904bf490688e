"""CLI directory-sweep mode (reference: sparsify_clip.py:1146-1156) +
auto-resume from the latest full checkpoint."""

import os

import pytest
import yaml

from sparsify_clip_tpu.cli import cli
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY

MODEL_REGISTRY.setdefault(
    "sweep-tiny",
    CLIPConfig(
        name="sweep-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=49408, context_length=77, text_width=16, text_heads=2,
        text_layers=2,
    ),
)


def _cfg(tmp_path, run_name, loss_type, **kw):
    cfg = {
        "project_name": "sweep_test", "run_name": run_name,
        "seed": 42, "learning_rate": "1e-3", "batch_size": 8,
        "model": "sweep-tiny", "num_train_samples": 8, "num_test_samples": 8,
        "epochs": 1, "loss_type": loss_type, "only_lunif_epochs": 0,
        "anchor_temperature": 0.1, "anchor_temperature_learnable": False,
        "save_checkpoint_every_n_epochs": 5, "resume_checkpoint": False,
        "fp16": False, "dataset": "synthetic",
        "log_dir": str(tmp_path / "logs"),
        "checkpoint_dir": str(tmp_path / "models"),
        "log_backend": "jsonl",
    }
    cfg.update(kw)
    return cfg


@pytest.mark.slow
def test_dir_sweep_runs_all_and_skips_empty(tmp_path, capsys):
    sweep = tmp_path / "sweep"
    sweep.mkdir()
    (sweep / "a_exp1.yaml").write_text(
        yaml.safe_dump(_cfg(tmp_path, "sweep_exp1", "anchor"))
    )
    (sweep / "b_exp2.yaml").write_text(
        yaml.safe_dump(
            _cfg(tmp_path, "sweep_exp2", "ANCHOR(IMAGE,TEXT)+LALIGN(IMAGE,TEXT)")
        )
    )
    # the reference's all_experiments.yaml is an empty TODO — must be
    # skipped, not crash the sweep
    (sweep / "all_experiments.yaml").write_text("# TODO\n")
    (sweep / "not_a_config.txt").write_text("ignored")

    cli(["--config", str(sweep), "--device", "0", "--image-size", "32"])

    assert (tmp_path / "logs" / "sweep_exp1.jsonl").exists()
    assert (tmp_path / "logs" / "sweep_exp2.jsonl").exists()
    out = capsys.readouterr().out
    assert "skipping empty config" in out


def test_missing_config_path_errors(tmp_path):
    with pytest.raises(SystemExit):
        cli(["--config", str(tmp_path / "nope.yaml"), "--device", "0"])
