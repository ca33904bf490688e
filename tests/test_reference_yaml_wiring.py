"""Every shipped reference YAML drives a real train step.

Parsing all 13 YAMLs is covered in test_config; this goes further —
each experiment's parsed config (loss_type, schedules, temperature
mode, only_lunif_epochs) builds a train setup on the 8-device mesh and
executes one step, with only the size knobs (model/batch/epochs)
shrunk.  Catches dispatch/schedule/config wiring breaks for every
experiment the reference ships, not just the flagship.
"""

import dataclasses
import glob
import os

import numpy as np
import pytest

from sparsify_clip_tpu.config import ExperimentConfig, load_config
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.train import create_train_setup

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)

MODEL_REGISTRY.setdefault(
    "wiring-tiny",
    CLIPConfig(
        name="wiring-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=256, context_length=12, text_width=16, text_heads=2,
        text_layers=2,
    ),
)


def _yaml_paths():
    paths = sorted(
        glob.glob(os.path.join(REFERENCE_ROOT, "experiments_configs", "*.yaml"))
        + glob.glob(os.path.join(REFERENCE_ROOT, "ablatation_configs", "*.yaml"))
    )
    # all_experiments.yaml is an empty TODO in the reference
    return [p for p in paths if os.path.getsize(p) > 16]


YAMLS = _yaml_paths()


@pytest.mark.slow
@pytest.mark.parametrize(
    "path", YAMLS, ids=[os.path.basename(p)[:40] for p in YAMLS]
)
def test_reference_yaml_train_step(path):
    cfg = load_config(path)
    cfg = dataclasses.replace(
        cfg, model="wiring-tiny", batch_size=16, epochs=2, fp16=False
    )
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 250, size=(16, 12)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    batch = shard_batch(
        {
            "images": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
            "tokens": tokens,
        },
        mesh,
    )
    state, metrics = setup.train_step(setup.state, batch)
    assert np.isfinite(float(metrics["train_loss"])), path
    assert int(state.step) == 1
    # learnable-temperature experiments must carry it in the trainables
    if cfg.anchor_temperature_learnable:
        assert float(state.temperature) != 0.0


def test_thirteen_reference_yamls_found():
    assert len(YAMLS) == 13, [os.path.basename(p) for p in YAMLS]
