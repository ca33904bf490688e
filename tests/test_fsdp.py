"""FSDP parameter sharding (``fsdp: true``).

Params AND AdamW moments shard over the DATA mesh axis (ZeRO-3-style
fully-sharded data parallelism): each device stores 1/dp of every
weight, and XLA's SPMD partitioner inserts the per-layer all-gathers
(forward/backward) and gradient reduce-scatters over ICI — the
scaling-book recipe expressed purely as sharding annotations
(parallel/mesh.py::shard_over_data, train.py::create_train_setup).

Unlike ZeRO-1 (tests/test_zero1.py), the gradient reduction becomes a
reduce-scatter, so trajectories match replicated DP to numerics, not
bit-for-bit — the trajectory test asserts a tight numeric band.
"""

import numpy as np
import jax
import pytest

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    shard_batch,
)
from sparsify_clip_tpu.train import create_train_setup

TINY = CLIPConfig(
    name="fsdp-tiny", embed_dim=16, vision_kind="vit", image_size=32,
    vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
    vocab_size=256, context_length=12, text_width=16, text_heads=2, text_layers=2,
)
MODEL_REGISTRY.setdefault("fsdp-tiny", TINY)

RNG = np.random.default_rng(11)


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
        model="fsdp-tiny", batch_size=16, epochs=2, learning_rate=1e-3,
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


def test_params_and_moments_shard_over_data_axis():
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(_config(fsdp=True), steps_per_epoch=4, mesh=mesh)
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(setup.state.params):
        if leaf.ndim and any(d % 8 == 0 for d in leaf.shape):
            assert DATA_AXIS in _axes(leaf), (leaf.shape, leaf.sharding)
            sharded += 1
    assert sharded > 0
    adam = _adam_state(setup.state.opt_state)
    for leaf in jax.tree_util.tree_leaves(adam.mu):
        if leaf.ndim and any(d % 8 == 0 for d in leaf.shape):
            assert DATA_AXIS in _axes(leaf), (leaf.shape, leaf.sharding)
    # scalars stay replicated: Adam count, temperature, step
    assert _axes(adam.count) == set()
    assert _axes(setup.state.temperature) == set()


def test_state_bytes_actually_shrink_per_device():
    """The point of FSDP: addressable train-state bytes per device are
    ~1/dp of the replicated footprint."""
    mesh = create_mesh(data=8, model=1)

    def local_bytes(setup):
        total = 0
        for leaf in jax.tree_util.tree_leaves(
            (setup.state.params, setup.state.opt_state)
        ):
            if hasattr(leaf, "addressable_shards"):
                total += sum(
                    s.data.size * s.data.dtype.itemsize
                    for s in leaf.addressable_shards
                ) // len(leaf.addressable_shards) * 1  # mean shard bytes
        return total

    plain = create_train_setup(_config(), steps_per_epoch=4, mesh=mesh)
    fsdp = create_train_setup(_config(fsdp=True), steps_per_epoch=4, mesh=mesh)
    # per-device = mean shard size; replicated leaves count full size
    assert local_bytes(fsdp) < 0.25 * local_bytes(plain), (
        local_bytes(fsdp), local_bytes(plain),
    )


def test_trajectory_matches_replicated_dp():
    """FSDP changes the grad exchange (all-reduce → reduce-scatter) and
    the layer input path (all-gathered params), so equality is numeric,
    not bitwise: losses track replicated DP tightly over 6 steps."""
    mesh = create_mesh(data=8, model=1)
    batch = shard_batch(_batch(), mesh)

    results = {}
    for flag in (False, True):
        setup = create_train_setup(
            _config(fsdp=flag), steps_per_epoch=4, mesh=mesh
        )
        state, losses = setup.state, []
        for _ in range(6):
            state, metrics = setup.train_step(state, batch)
            # device→host read serializes multi-device dispatches
            # (CLAUDE.md: one in-flight program on the fake CPU mesh)
            losses.append(float(metrics["train_loss"]))
        results[flag] = (losses, jax.tree_util.tree_map(np.asarray, state.params))

    np.testing.assert_allclose(
        results[True][0], results[False][0], rtol=1e-4, atol=0
    )
    lr, steps = 1e-3, 6
    for a, b in zip(
        jax.tree_util.tree_leaves(results[True][1]),
        jax.tree_util.tree_leaves(results[False][1]),
    ):
        # Adam sign-flip bound on ~zero-grad coords (see test_zero1.py)
        assert np.max(np.abs(a - b)) <= 2 * lr * steps, np.max(np.abs(a - b))
        frac_tight = np.mean(np.abs(a - b) <= 1e-4)
        assert frac_tight >= 0.5, frac_tight


def test_composes_with_tensor_parallel():
    """dp4×tp2: TP-sharded kernels gain the data axis on a free dim
    (2-D sharded params), the step executes and is finite."""
    mesh = create_mesh(data=4, model=2)
    setup = create_train_setup(
        _config(fsdp=True, mesh_data=4, mesh_model=2),
        steps_per_epoch=4, mesh=mesh,
    )
    both = [
        leaf for leaf in jax.tree_util.tree_leaves(setup.state.params)
        if {DATA_AXIS, MODEL_AXIS} <= _axes(leaf)
    ]
    assert both, "expected at least one param sharded over BOTH axes"
    state, metrics = setup.train_step(setup.state, shard_batch(_batch(), mesh))
    assert np.isfinite(float(metrics["train_loss"]))


def test_checkpoint_roundtrip_with_fsdp_state(tmp_path):
    """orbax full-state save/restore is exact for FSDP-sharded params
    and moments (save gathers; restore re-places by layout)."""
    from sparsify_clip_tpu.checkpoints import restore_full, save_full

    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(_config(fsdp=True), steps_per_epoch=4, mesh=mesh)
    state, _ = setup.train_step(setup.state, shard_batch(_batch(), mesh))
    path = save_full(state, str(tmp_path / "ckpt"))

    fresh = create_train_setup(_config(fsdp=True), steps_per_epoch=4, mesh=mesh)
    restored = restore_full(
        path, jax.tree_util.tree_map(np.asarray, fresh.state)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves((state.params, state.opt_state)),
        jax.tree_util.tree_leaves((restored.params, restored.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_composes_with_grad_accum():
    """GradCache two-pass accumulation under FSDP params: the
    accumulation microbatches activations, the layout shards weights —
    orthogonal levers that must stack (big tower + big batch on a small
    slice).  One step's loss matches the FSDP one-shot step."""
    mesh = create_mesh(data=8, model=1)
    setup1 = create_train_setup(_config(fsdp=True), steps_per_epoch=4, mesh=mesh)
    setup2 = create_train_setup(
        _config(fsdp=True, grad_accum_steps=2), steps_per_epoch=4, mesh=mesh
    )
    host = _batch()
    _, m1 = setup1.train_step(setup1.state, shard_batch(host, mesh))
    f1 = float(m1["train_loss"])  # fence: serialize multi-device dispatches
    _, m2 = setup2.train_step(setup2.state, shard_batch(host, mesh))
    f2 = float(m2["train_loss"])
    assert f1 == pytest.approx(f2, rel=2e-5)


def test_composes_with_scan_layers_by_lowering():
    """FSDP + scan_layers (the big-tower deployment shape: stacked
    block params sharded over data, gathered per scan iteration).
    Lowering-only on the fake CPU mesh — collectives inside lax.scan
    deadlock XLA's CPU rendezvous (see tests/test_scan_layers.py and
    CLAUDE.md); on TPU this is the standard scanned-FSDP pattern."""
    import jax.numpy as jnp  # noqa: F401

    SCAN_TINY = CLIPConfig(
        name="fsdp-scan-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(3,), vision_heads=2, patch_size=16,
        vocab_size=256, context_length=12, text_width=16, text_heads=2,
        text_layers=3,
    )
    MODEL_REGISTRY.setdefault("fsdp-scan-tiny", SCAN_TINY)
    cfg = _config(model="fsdp-scan-tiny", fsdp=True, scan_layers=True)
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    # stacked block kernels carry a leading (layers, ...) axis and must
    # still have picked up the data axis on a weight dim
    stacked_sharded = [
        leaf for leaf in jax.tree_util.tree_leaves(setup.state.params)
        if leaf.ndim >= 3 and DATA_AXIS in _axes(leaf)
    ]
    assert stacked_sharded, "no stacked FSDP-sharded block params found"
    jitted = getattr(setup.train_step, "_jitted", None)
    assert jitted is not None
    with jax.sharding.set_mesh(mesh):
        lowered = jitted.lower(setup.state, _batch())
    text = lowered.as_text()
    assert "scan" in text or "while" in text
