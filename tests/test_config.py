"""Config layer: the 13 reference YAMLs must parse unchanged."""

import os

import pytest

from sparsify_clip_tpu.config import ExperimentConfig, load_config, load_config_dir

from conftest import REFERENCE_ROOT, reference_available

EXP_DIR = os.path.join(REFERENCE_ROOT, "experiments_configs")
ABL_DIR = os.path.join(REFERENCE_ROOT, "ablatation_configs")

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


@needs_reference
def test_all_reference_experiment_yamls_parse():
    cfgs = load_config_dir(EXP_DIR, device_id=0)
    # 11 files; all_experiments.yaml is an empty TODO and is skipped.
    assert len(cfgs) == 10
    for cfg in cfgs:
        assert cfg.model == "RN50"
        assert cfg.batch_size == 256
        assert cfg.epochs == 100
        assert cfg.seed == 42
        assert isinstance(cfg.learning_rate, float)
        assert cfg.learning_rate == pytest.approx(1e-4)


@needs_reference
def test_all_reference_ablation_yamls_parse():
    cfgs = load_config_dir(ABL_DIR, device_id=3)
    assert len(cfgs) == 3
    for cfg in cfgs:
        assert cfg.device_id == 3
        assert cfg.loss_type.startswith("ANCHOR(")


@needs_reference
def test_experiment_2_values():
    cfg = load_config(os.path.join(EXP_DIR, "experiment_2-BASELINE_TEMP_FIXED.yaml"))
    assert cfg.loss_type == "anchor"
    assert cfg.anchor_temperature == pytest.approx(0.1)
    assert cfg.anchor_temperature_learnable is False
    assert cfg.only_lunif_epochs == 0
    assert cfg.num_test_samples == 512
    assert cfg.num_train_samples == -1
    assert cfg.fp16 is True
    assert cfg.save_checkpoint_every_n_epochs == 20
    assert cfg.resume_checkpoint is False


@needs_reference
def test_experiment_6_sparsification_phase():
    cfg = load_config(
        os.path.join(
            EXP_DIR, "experiment_6-SPARSIFICATION(1E)+ANCHOR+LALIGN+LUNIF(CENTROIDS).yaml"
        )
    )
    assert cfg.loss_type == "only_lunif_n_then_anchor+lalign+lunif(centroids)"
    assert cfg.only_lunif_epochs == 1


@needs_reference
def test_experiment_9_beta_alpha_keys():
    cfg = load_config(
        os.path.join(
            EXP_DIR,
            "experiment_9-ANCHOR+ALPHA*LALIGN+BETA*LUNIF(TEXT)+BETA*LUNIF(IMG).yaml",
        )
    )
    assert cfg.beta_warmup_epoch == 20
    assert cfg.beta_decay_epoch == 50
    assert cfg.alpha_warmup_epoch == 50
    assert cfg.alpha_increment_epoch == 50


def test_learning_rate_string_coercion():
    cfg = ExperimentConfig.from_dict({"learning_rate": "1e-4"})
    assert isinstance(cfg.learning_rate, float)
    assert cfg.learning_rate == pytest.approx(1e-4)


def test_extra_keys_roundtrip():
    cfg = ExperimentConfig.from_dict({"learning_rate": 1e-4, "my_future_knob": 7})
    assert cfg.extra["my_future_knob"] == 7
    assert cfg.to_dict()["my_future_knob"] == 7


def test_empty_config_raises():
    with pytest.raises(ValueError):
        ExperimentConfig.from_dict(None)


def test_validation():
    with pytest.raises(ValueError):
        ExperimentConfig.from_dict({"batch_size": 0})
