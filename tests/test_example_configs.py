"""Every shipped example config (configs/*.yaml) must parse and name
real registry entries — they are the documented entry points for the
TPU knobs (configs/README.md)."""

import pathlib

import pytest

from sparsify_clip_tpu import load_config
from sparsify_clip_tpu.losses import KNOWN_LOSS_TYPES
from sparsify_clip_tpu.models.clip import MODEL_REGISTRY

CONFIGS = sorted(
    (pathlib.Path(__file__).parent.parent / "configs").glob("*.yaml")
)


def test_examples_exist():
    assert len(CONFIGS) >= 6


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.stem)
def test_example_config_parses(path):
    cfg = load_config(str(path))
    assert cfg.model in MODEL_REGISTRY or cfg.model == "tiny-test"
    assert cfg.loss_type in KNOWN_LOSS_TYPES
    assert cfg.batch_size > 0
    # pod examples must keep the constraint pairs the validator enforces
    if cfg.pipeline:
        assert cfg.scan_layers and cfg.mesh_model > 1
    if cfg.loss_type == "siglip":
        assert not cfg.anchor_temperature_learnable
