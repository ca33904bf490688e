"""Checkpointing: orbax full-state roundtrip, weights-only export,
torch state_dict conversion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from sparsify_clip_tpu.checkpoints import (
    latest_step,
    load_torch_clip_state_dict,
    load_weights,
    restore_full,
    save_full,
    save_weights,
)
from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.train import create_train_setup

MODEL_REGISTRY.setdefault(
    "ckpt-tiny",
    CLIPConfig(
        name="ckpt-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=256, context_length=12, text_width=16, text_heads=2,
        text_layers=2,
    ),
)


def _setup(**kw):
    raw = {
        "model": "ckpt-tiny", "batch_size": 8, "epochs": 1,
        "learning_rate": 1e-3, "loss_type": "anchor", "fp16": False,
    }
    raw.update(kw)
    cfg = ExperimentConfig.from_dict(raw)
    mesh = create_mesh(data=1, model=1)
    return create_train_setup(cfg, steps_per_epoch=2, mesh=mesh), mesh


def _batch(mesh, b=8):
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 250, size=(b, 12)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    return shard_batch(
        {"images": rng.standard_normal((b, 32, 32, 3)).astype(np.float32),
         "tokens": tokens},
        mesh,
    )


def test_full_state_roundtrip(tmp_path):
    setup, mesh = _setup()
    state, _ = setup.train_step(setup.state, _batch(mesh))
    state, _ = setup.train_step(state, _batch(mesh))
    path = save_full(state, str(tmp_path / "ckpt"))
    assert latest_step(str(tmp_path / "ckpt")) == 2

    fresh_setup, _ = _setup()
    restored = restore_full(path, jax.tree_util.tree_map(np.asarray, fresh_setup.state))
    assert int(restored.step) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too (exact resume, beyond reference)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_state_roundtrip_bf16_mu(tmp_path):
    """bf16 Adam first moments (adam_mu_dtype="bfloat16", the big-zoo
    optimizer-memory knob) survive the orbax full-state round trip
    bit-exactly and with dtype intact — exact resume holds for the
    memory configuration too."""
    setup, mesh = _setup(adam_mu_dtype="bfloat16")
    state, _ = setup.train_step(setup.state, _batch(mesh))
    path = save_full(state, str(tmp_path / "ckpt"))

    fresh_setup, _ = _setup(adam_mu_dtype="bfloat16")
    restored = restore_full(
        path, jax.tree_util.tree_map(np.asarray, fresh_setup.state)
    )
    saw_bf16 = False
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        saw_bf16 = saw_bf16 or np.asarray(a).dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert saw_bf16, "expected bf16 mu leaves in the optimizer state"


def test_weights_only_roundtrip(tmp_path):
    setup, mesh = _setup()
    state, _ = setup.train_step(setup.state, _batch(mesh))
    path = save_weights(state.params, str(tmp_path / "w.npz"))
    fresh, _ = _setup()
    loaded = load_weights(fresh.state.params, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weights_shape_mismatch_raises(tmp_path):
    setup, _ = _setup()
    path = save_weights(setup.state.params, str(tmp_path / "w.npz"))
    bad_template = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape + (2,), x.dtype), setup.state.params
    )
    with pytest.raises((ValueError, KeyError)):
        load_weights(bad_template, path)


def test_torch_state_dict_mapping():
    # a miniature open_clip-style text tower state_dict
    sd = {
        "module.token_embedding.weight": torch.zeros(16, 8),
        "module.positional_embedding": torch.zeros(4, 8),
        "module.text_projection": torch.zeros(8, 8),
        "module.ln_final.weight": torch.ones(8),
        "module.ln_final.bias": torch.zeros(8),
        "module.transformer.resblocks.0.attn.in_proj_weight": torch.zeros(24, 8),
        "module.transformer.resblocks.0.attn.in_proj_bias": torch.zeros(24),
        "module.transformer.resblocks.0.attn.out_proj.weight": torch.zeros(8, 8),
        "module.transformer.resblocks.0.mlp.c_fc.weight": torch.zeros(32, 8),
        "module.transformer.resblocks.0.ln_1.weight": torch.ones(8),
        "module.visual.conv1.weight": torch.zeros(6, 3, 2, 2),
        "module.visual.class_embedding": torch.zeros(6),
        "module.logit_scale": torch.tensor(2.6593),
    }
    flat = load_torch_clip_state_dict(sd)
    assert flat["text/token_embedding"].shape == (16, 8)
    # dense kernels transposed (out,in) -> (in,out)
    assert flat["text/transformer/resblock_0/attn/in_proj/kernel"].shape == (8, 24)
    assert flat["text/transformer/resblock_0/mlp/c_fc/kernel"].shape == (8, 32)
    # conv OIHW -> HWIO
    assert flat["visual/conv1/kernel"].shape == (2, 2, 3, 6)
    assert flat["text/ln_final/ln/scale"].shape == (8,)
    assert not any(k.startswith("_unmapped") for k in flat if "ln_1" not in k and "_unmapped" not in k.split("/", 1)[0])


def test_async_save_roundtrip(tmp_path):
    from sparsify_clip_tpu.checkpoints import save_full_async, wait_for_async_saves

    setup, mesh = _setup()
    state, _ = setup.train_step(setup.state, _batch(mesh))
    path = save_full_async(state, str(tmp_path / "ckpt"))
    wait_for_async_saves()
    assert latest_step(str(tmp_path / "ckpt")) == 1
    restored = restore_full(path, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
