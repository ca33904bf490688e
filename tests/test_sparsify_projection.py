"""Sparse embedding projections (north-star capability, gated)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.ops.sparsify import l1_shrink, make_projection, topk_project
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.train import create_train_setup

RNG = np.random.default_rng(0)

MODEL_REGISTRY.setdefault(
    "sp-tiny",
    CLIPConfig(
        name="sp-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(1,), vision_heads=2, patch_size=16,
        vocab_size=256, context_length=8, text_width=16, text_heads=2,
        text_layers=1,
    ),
)


def _unit(n=16, d=32):
    x = RNG.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))


def test_topk_sparsity_and_norm():
    x = _unit()
    out = np.asarray(topk_project(x, k=8))
    assert ((np.abs(out) > 0).sum(axis=1) <= 8).all()
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    # kept components keep their sign and relative order
    row = np.asarray(x[0])
    kept = np.nonzero(out[0])[0]
    assert set(kept) == set(np.argsort(-np.abs(row))[:len(kept)])


def test_l1_shrink_sparsifies_and_norms():
    x = _unit()
    out = np.asarray(l1_shrink(x, lam=0.1))
    assert (np.abs(out) > 0).sum() < np.asarray(x).size  # some zeros
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_projection_gradients_flow():
    x = _unit()
    g = jax.grad(lambda v: jnp.sum(jnp.square(topk_project(v, 8))))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_make_projection_dispatch():
    assert make_projection("none") is None
    assert make_projection("topk", topk=4) is not None
    assert make_projection("l1", l1=0.05) is not None
    with pytest.raises(ValueError):
        make_projection("magic")


def test_train_step_applies_projection_after_epoch():
    cfg = ExperimentConfig.from_dict({
        "model": "sp-tiny", "batch_size": 8, "epochs": 2, "learning_rate": 1e-3,
        "loss_type": "anchor", "fp16": False,
        "sparse_projection": "topk", "sparse_topk": 4, "sparse_after_epoch": 1,
    })
    mesh = create_mesh(data=1, model=1)
    steps_per_epoch = 2
    setup = create_train_setup(cfg, steps_per_epoch=steps_per_epoch, mesh=mesh)
    tokens = RNG.integers(1, 250, size=(8, 8)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    batch = shard_batch(
        {"images": RNG.standard_normal((8, 32, 32, 3)).astype(np.float32),
         "tokens": tokens},
        mesh,
    )
    state = setup.state
    losses = []
    for _ in range(2 * steps_per_epoch):
        state, metrics = setup.train_step(state, batch)
        losses.append(float(metrics["train_loss"]))
    assert np.isfinite(losses).all()
    # the projection activating at epoch 1 visibly changes the loss
    # landscape on the same batch (4-of-16 components is a big cut)
    assert abs(losses[2] - losses[1]) > 1e-4
