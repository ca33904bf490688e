"""--smoke CLI mode: any experiment YAML runs end-to-end hermetically."""

import pytest
import yaml

from sparsify_clip_tpu.cli import apply_smoke_overrides, cli
from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY

MODEL_REGISTRY.setdefault(
    "smoke-tiny",
    CLIPConfig(
        name="smoke-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=49408, context_length=77, text_width=16, text_heads=2,
        text_layers=2,
    ),
)


def test_overrides_preserve_experiment_identity():
    cfg = ExperimentConfig.from_dict({
        "learning_rate": 1e-4, "run_name": "exp6",
        "loss_type": "only_lunif_n_then_anchor+lalign+lunif(centroids)",
        "only_lunif_epochs": 1, "batch_size": 256,
    })
    smoke = apply_smoke_overrides(cfg)
    # the experiment's defining knobs are untouched
    assert smoke.loss_type == cfg.loss_type
    assert smoke.only_lunif_epochs == 1
    assert smoke.anchor_temperature == cfg.anchor_temperature
    assert smoke.model == cfg.model
    # but it becomes a 1-epoch synthetic run
    assert smoke.dataset == "synthetic"
    assert smoke.epochs == 1
    assert smoke.num_train_samples == 512
    assert smoke.run_name == "exp6-smoke"


@pytest.mark.slow
def test_smoke_flag_end_to_end(tmp_path):
    cfg_path = tmp_path / "exp.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "project_name": "t", "run_name": "smoke_e2e",
        "seed": 42, "learning_rate": "1e-3", "batch_size": 8,
        "model": "smoke-tiny",
        "num_train_samples": -1, "num_test_samples": 512,  # overridden
        "epochs": 100,                                      # overridden
        "loss_type": "only_lunif_n_then_anchor+lalign+lunif(centroids)",
        "only_lunif_epochs": 1,
        "anchor_temperature": 0.1, "anchor_temperature_learnable": False,
        "save_checkpoint_every_n_epochs": 20, "resume_checkpoint": False,
        "fp16": False,
        "log_dir": str(tmp_path / "logs"),
        "checkpoint_dir": str(tmp_path / "models"),
        "log_backend": "jsonl",
    }))
    cli(["--config", str(cfg_path), "--smoke", "--image-size", "32"])
    assert (tmp_path / "logs" / "smoke_e2e-smoke.jsonl").exists()
