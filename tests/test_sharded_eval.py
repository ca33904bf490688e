"""Sharded eval over the 8-device mesh equals single-device eval, and
every reference YAML's loss_type is dispatchable."""

import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.eval import evaluate_model
from sparsify_clip_tpu.losses import KNOWN_LOSS_TYPES
from sparsify_clip_tpu.models import CLIP
from sparsify_clip_tpu.models.clip import CLIPConfig
from sparsify_clip_tpu.parallel.mesh import create_mesh

from conftest import REFERENCE_ROOT, reference_available

TINY = CLIPConfig(
    name="ev-tiny", embed_dim=16, vision_kind="vit", image_size=32,
    vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
    vocab_size=256, context_length=12, text_width=16, text_heads=2,
    text_layers=2,
)

RNG = np.random.default_rng(4)


def _batches(n_batches=2, b=16):
    out = []
    for _ in range(n_batches):
        tokens = RNG.integers(1, 250, size=(b, 12)).astype(np.int32)
        tokens[:, 0], tokens[:, -1] = 254, 255
        out.append({
            "images": RNG.standard_normal((b, 32, 32, 3)).astype(np.float32),
            "tokens": tokens,
        })
    return out


def test_sharded_eval_matches_unsharded():
    model = CLIP(cfg=TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 12), jnp.int32), train=False,
    )
    batches = _batches()
    plain = evaluate_model(model, variables, batches)
    mesh = create_mesh(data=8, model=1)
    sharded = evaluate_model(model, variables, batches, mesh=mesh)
    for key in plain:
        assert sharded[key] == pytest.approx(plain[key], abs=1e-3), key


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_every_reference_yaml_loss_type_dispatches():
    found = 0
    for sub in ("experiments_configs", "ablatation_configs"):
        directory = os.path.join(REFERENCE_ROOT, sub)
        for name in os.listdir(directory):
            if not name.endswith(".yaml"):
                continue
            raw = yaml.safe_load(open(os.path.join(directory, name)))
            if raw is None:
                continue  # the empty all_experiments.yaml TODO
            assert raw["loss_type"] in KNOWN_LOSS_TYPES, name
            found += 1
    assert found == 13  # 10 experiments + 3 ablations
