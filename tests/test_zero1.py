"""ZeRO-1 optimizer-state sharding (``shard_opt_state: true``).

The moments of AdamW shard over the DATA mesh axis (params and grads
stay replicated), so optimizer-state HBM scales 1/dp — the lever that
fits the billion-param towers under pure data parallelism.  Because
the moment EMAs are elementwise and grads are identical on every
device, the trajectory must match the replicated optimizer exactly;
that equality is the core assertion here (parallel/mesh.py
::zero1_opt_shardings, train.py::create_train_setup).
"""

import numpy as np
import jax
import pytest

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, create_mesh, shard_batch
from sparsify_clip_tpu.train import create_train_setup

TINY = CLIPConfig(
    name="zero1-tiny", embed_dim=16, vision_kind="vit", image_size=32,
    vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
    vocab_size=256, context_length=12, text_width=16, text_heads=2, text_layers=2,
)
MODEL_REGISTRY.setdefault("zero1-tiny", TINY)

RNG = np.random.default_rng(7)


def _batch(b=16):
    tokens = RNG.integers(1, 250, size=(b, TINY.context_length)).astype(np.int32)
    tokens[:, 0] = TINY.vocab_size - 2
    tokens[:, -1] = TINY.vocab_size - 1
    return {
        "images": RNG.standard_normal((b, 32, 32, 3)).astype(np.float32),
        "tokens": tokens,
    }


def _config(**kw):
    base = dict(
        model="zero1-tiny", batch_size=16, epochs=2, learning_rate=1e-3,
        loss_type="anchor", fp16=False, seed=0,
    )
    base.update(kw)
    return ExperimentConfig.from_dict(base)


def _adam_state(opt_state):
    for part in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: hasattr(x, "mu")
    ):
        if hasattr(part, "mu"):
            return part
    raise AssertionError("no ScaleByAdamState found")


def _axes(leaf):
    spec = leaf.sharding.spec
    return {a for axes in spec if axes for a in (
        axes if isinstance(axes, tuple) else (axes,)
    )}


def test_moments_shard_over_data_axis_params_stay_replicated():
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(
        _config(shard_opt_state=True), steps_per_epoch=4, mesh=mesh
    )
    adam = _adam_state(setup.state.opt_state)
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(adam.mu) + jax.tree_util.tree_leaves(adam.nu):
        if leaf.ndim and any(d % 8 == 0 for d in leaf.shape):
            assert DATA_AXIS in _axes(leaf), (leaf.shape, leaf.sharding)
            sharded += 1
    assert sharded > 0
    # params remain fully replicated under pure dp
    for leaf in jax.tree_util.tree_leaves(setup.state.params):
        assert _axes(leaf) == set(), leaf.sharding
    # Adam's count is a scalar — must stay replicated, not crash the rule
    assert _axes(adam.count) == set()


def test_trajectory_identical_to_replicated_optimizer():
    """ZeRO-1 is layout, not math: the loss trajectory matches the
    replicated optimizer to fp32 ulp level (sharding changes XLA
    fusion boundaries, so bit-exactness is not guaranteed — observed
    loss deltas ~1e-7 relative).  Params are bounded, not bit-compared:
    Adam's step-1 update is ~lr·sign(g), so coordinates whose gradient
    is numerically ~0 flip direction on single-ulp grad noise — but the
    update magnitude is capped near lr, so every coordinate stays
    within steps·2lr while all loss-relevant ones track tightly."""
    mesh = create_mesh(data=8, model=1)
    batch = shard_batch(_batch(), mesh)

    results = {}
    for flag in (False, True):
        setup = create_train_setup(
            _config(shard_opt_state=flag), steps_per_epoch=4, mesh=mesh
        )
        state, losses = setup.state, []
        for _ in range(6):
            state, metrics = setup.train_step(state, batch)
            # device→host read also serializes multi-device dispatches
            # (CLAUDE.md: one in-flight program on the fake CPU mesh)
            losses.append(float(metrics["train_loss"]))
        results[flag] = (losses, jax.tree_util.tree_map(np.asarray, state.params))

    np.testing.assert_allclose(
        results[True][0], results[False][0], rtol=1e-5, atol=0
    )
    lr, steps = 1e-3, 6
    for a, b in zip(
        jax.tree_util.tree_leaves(results[True][1]),
        jax.tree_util.tree_leaves(results[False][1]),
    ):
        assert np.max(np.abs(a - b)) <= 2 * lr * steps, np.max(np.abs(a - b))
        # the overwhelming majority of coordinates agree tightly; only
        # the ~zero-gradient ones may take the sign-flip path
        frac_tight = np.mean(np.abs(a - b) <= 1e-5)
        assert frac_tight >= 0.5, frac_tight


def test_composes_with_tensor_parallel():
    """dp4×tp2: TP-sharded moment kernels gain the data axis on their
    unsharded dim (2-D sharded moments), step executes and is finite."""
    mesh = create_mesh(data=4, model=2)
    setup = create_train_setup(
        _config(shard_opt_state=True, mesh_data=4, mesh_model=2),
        steps_per_epoch=4, mesh=mesh,
    )
    adam = _adam_state(setup.state.opt_state)
    both = [
        leaf for leaf in jax.tree_util.tree_leaves(adam.mu)
        if {DATA_AXIS, MODEL_AXIS} <= _axes(leaf)
    ]
    assert both, "expected at least one moment sharded over BOTH axes"
    state, metrics = setup.train_step(setup.state, shard_batch(_batch(), mesh))
    assert np.isfinite(float(metrics["train_loss"]))


def test_checkpoint_roundtrip_with_sharded_opt_state(tmp_path):
    """orbax full-state save/restore is exact for ZeRO-1-sharded moments
    (save gathers; restore re-places by the abstract state's layout)."""
    from sparsify_clip_tpu.checkpoints import restore_full, save_full

    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(
        _config(shard_opt_state=True), steps_per_epoch=4, mesh=mesh
    )
    state, _ = setup.train_step(setup.state, shard_batch(_batch(), mesh))
    path = save_full(state, str(tmp_path / "ckpt"))

    fresh = create_train_setup(
        _config(shard_opt_state=True), steps_per_epoch=4, mesh=mesh
    )
    restored = restore_full(
        path, jax.tree_util.tree_map(np.asarray, fresh.state)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
