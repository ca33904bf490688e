"""Train step integration on the 8-fake-device CPU mesh: loss descent,
warm-phase crossing without recompile, learnable temperature, sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.train import create_train_setup

TINY = CLIPConfig(
    name="test-tiny", embed_dim=16, vision_kind="vit", image_size=32,
    vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
    vocab_size=256, context_length=12, text_width=16, text_heads=2, text_layers=2,
)
MODEL_REGISTRY.setdefault("test-tiny", TINY)

RNG = np.random.default_rng(0)


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
        model="test-tiny", batch_size=16, epochs=2, learning_rate=1e-3,
        loss_type="anchor", fp16=False, seed=0,
    )
    base.update(kw)
    return ExperimentConfig.from_dict(base)


def test_loss_decreases_on_fixed_batch():
    cfg = _config()
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    batch = shard_batch(_batch(), mesh)
    state = setup.state
    losses = []
    for _ in range(10):
        state, metrics = setup.train_step(state, batch)
        losses.append(float(metrics["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_metrics_schema_and_lr():
    cfg = _config()
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    state, metrics = setup.train_step(setup.state, shard_batch(_batch(), mesh))
    for key in ("train_loss", "learning_rate", "beta", "alpha", "temperature",
                "anchor", "lalign", "lunif"):
        assert key in metrics
    # step 0 of a no-hold run: linear warmup from 0 → lr == 0
    assert float(metrics["learning_rate"]) == 0.0
    state, metrics = setup.train_step(state, shard_batch(_batch(), mesh))
    assert float(metrics["learning_rate"]) > 0.0
    assert int(state.step) == 2


def test_learnable_temperature_updates():
    cfg = _config(anchor_temperature_learnable=True)
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    state = setup.state
    t0 = float(state.temperature)
    batch = shard_batch(_batch(), mesh)
    for _ in range(3):
        state, metrics = setup.train_step(state, batch)
    assert float(state.temperature) != t0
    assert float(metrics["temperature"]) == pytest.approx(float(state.temperature))


def test_fixed_temperature_stays():
    cfg = _config(anchor_temperature_learnable=False)
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    state = setup.state
    batch = shard_batch(_batch(), mesh)
    for _ in range(2):
        state, _ = setup.train_step(state, batch)
    assert float(state.temperature) == pytest.approx(0.1)


def test_log_every_n_steps_same_records_as_per_step():
    """log_every_n_steps batches the device→host metric READS only: the
    logged stream (count, order, keys, values) must be identical to the
    reference-parity per-step cadence (VERDICT r4 #4)."""
    from sparsify_clip_tpu.train import run_training

    def batches(epoch):
        rng = np.random.default_rng(50 + epoch)
        for _ in range(5):
            tokens = rng.integers(1, 250, size=(16, TINY.context_length)).astype(np.int32)
            tokens[:, 0] = TINY.vocab_size - 2
            tokens[:, -1] = TINY.vocab_size - 1
            yield {
                "images": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
                "tokens": tokens,
            }

    def run(n):
        cfg = _config(epochs=1, log_every_n_steps=n)
        setup = create_train_setup(cfg, steps_per_epoch=5, image_size=32)
        records = []
        run_training(setup, batches, log_fn=records.append)
        return [r for r in records if "train_loss" in r]

    per_step = run(1)
    buffered = run(3)  # 5 steps: one flush at 3, remainder at epoch end
    assert len(per_step) == len(buffered) == 5
    for a, b in zip(per_step, buffered):
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=1e-6), k


def test_log_every_n_steps_validation():
    with pytest.raises(ValueError, match="log_every_n_steps"):
        _config(log_every_n_steps=0)


def test_warm_phase_crossing_no_recompile():
    """exp-6 style: epoch 0 is lunif-only; the switch into the full loss
    happens inside one compiled step (lax.cond on the traced epoch)."""
    cfg = _config(
        loss_type="only_lunif_n_then_anchor+lalign+lunif(centroids)",
        only_lunif_epochs=1,
    )
    mesh = create_mesh(data=8, model=1)
    steps_per_epoch = 3
    setup = create_train_setup(cfg, steps_per_epoch=steps_per_epoch, mesh=mesh)
    state = setup.state
    batch = shard_batch(_batch(), mesh)
    phases = []
    for _ in range(2 * steps_per_epoch):
        state, metrics = setup.train_step(state, batch)
        phases.append(float(metrics["anchor"]))
    # warm phase: anchor component zero; main phase: nonzero.
    assert all(a == 0.0 for a in phases[:steps_per_epoch])
    assert all(a > 0.0 for a in phases[steps_per_epoch:])
    # one compiled executable did both phases
    assert setup.train_step._cache_size() == 1


def test_lr_hold_during_sparsify_phase():
    cfg = _config(
        loss_type="only_lunif_n_then_anchor+lalign+lunif(centroids)",
        only_lunif_epochs=1,
    )
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    # steps < 462 hold the factor at 1.0 (reference sparsify hold)
    _, metrics = setup.train_step(setup.state, shard_batch(_batch(), mesh))
    assert float(metrics["learning_rate"]) == pytest.approx(cfg.learning_rate)


def test_batch_actually_sharded():
    mesh = create_mesh(data=8, model=1)
    batch = shard_batch(_batch(16), mesh)
    shards = batch["images"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == 2  # 16 / 8


@pytest.mark.slow
def test_resnet_tower_trains():
    tiny_rn = CLIPConfig(
        name="test-tiny-rn", embed_dim=16, vision_kind="resnet", image_size=32,
        vision_width=8, vision_layers=(1, 1, 1, 1), vision_heads=4,
        vocab_size=256, context_length=12, text_width=16, text_heads=2, text_layers=2,
    )
    MODEL_REGISTRY.setdefault("test-tiny-rn", tiny_rn)
    cfg = _config(model="test-tiny-rn")
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    state = setup.state
    # materialize before the step — donation invalidates the old buffers
    old_bn = [np.asarray(l) for l in jax.tree_util.tree_leaves(state.batch_stats)]
    batch = shard_batch(_batch(), mesh)
    state, metrics = setup.train_step(state, batch)
    assert np.isfinite(float(metrics["train_loss"]))
    new_bn = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(
        np.abs(a - np.asarray(b)).max() > 0 for a, b in zip(old_bn, new_bn)
    )


def test_tensor_parallel_mesh_runs():
    """2-way TP × 4-way DP: the same global-view step, different mesh."""
    cfg = _config(mesh_model=2)
    mesh = create_mesh(data=4, model=2)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        ),
        _batch(16),
    )
    state, metrics = setup.train_step(setup.state, batch)
    assert np.isfinite(float(metrics["train_loss"]))


def test_anchor_roberta_train_step():
    """'anchor-roberta' is dispatchable end-to-end: host-supplied (B, B)
    soft targets ride the batch dict (the reference's surface at
    sparsify_clip.py:711-713 whose loss branch is commented out there)."""
    cfg = _config(loss_type="anchor-roberta")
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    batch = _batch()
    st = RNG.random((16, 16)).astype(np.float32)
    batch["soft_targets"] = st / st.sum(axis=1, keepdims=True)
    batch = shard_batch(batch, mesh)
    state, metrics = setup.train_step(setup.state, batch)
    assert np.isfinite(float(metrics["train_loss"]))
    assert int(state.step) == 1


def test_anchor_roberta_e2e_with_provider():
    """VERDICT r4 #6: loss_type 'anchor-roberta' runs END TO END when a
    soft_targets_provider is configured — the stub sentence encoder
    (tests/_stub_roberta.py) computes the (B, B) row-stochastic matrix
    on host per batch, run_training ships it with the device batch, and
    the loss consumes it (reference sparsify_clip.py:711-713, 135-157)."""
    from sparsify_clip_tpu.train import run_training

    cfg = _config(
        loss_type="anchor-roberta", epochs=1,
        soft_targets_provider="_stub_roberta:soft_targets",
    )
    setup = create_train_setup(cfg, steps_per_epoch=3, image_size=32)

    def batches(epoch):
        rng = np.random.default_rng(9)
        for i in range(3):
            tokens = rng.integers(1, 250, size=(16, TINY.context_length)).astype(np.int32)
            tokens[:, 0] = TINY.vocab_size - 2
            tokens[:, -1] = TINY.vocab_size - 1
            yield {
                "images": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
                "tokens": tokens,
                "captions": [f"caption {i}-{j}" for j in range(16)],
            }

    records = []
    state = run_training(setup, batches, log_fn=records.append)
    assert int(state.step) == 3
    losses = [r["train_loss"] for r in records if "train_loss" in r]
    assert len(losses) == 3 and np.isfinite(losses).all()


def test_soft_targets_provider_resolution_and_validation():
    from sparsify_clip_tpu.train import (
        _apply_soft_targets,
        resolve_soft_targets_provider,
    )

    fn = resolve_soft_targets_provider("_stub_roberta:soft_targets")
    st = fn(["a", "b"])
    assert st.shape == (2, 2)
    np.testing.assert_allclose(st.sum(axis=1), 1.0, rtol=1e-6)
    # dotted form resolves too
    assert resolve_soft_targets_provider("_stub_roberta.soft_targets") is fn
    assert resolve_soft_targets_provider("") is None
    with pytest.raises(ValueError, match="import spec"):
        resolve_soft_targets_provider("justamodule")
    with pytest.raises(ValueError, match="expected \\(2, 2\\)"):
        _apply_soft_targets(
            {"captions": ["a", "b"]}, {},
            resolve_soft_targets_provider("_stub_roberta:bad_shape"),
        )
    with pytest.raises(ValueError, match="no 'captions'"):
        _apply_soft_targets({}, {}, fn)


def test_grad_accum_matches_full_batch():
    """GradCache accumulation (grad_accum_steps=2) must produce the SAME
    loss and the same post-step params as the one-shot full batch — the
    B×B contrastive loss still couples every pair across microbatches
    (naive microbatch accumulation would not satisfy this)."""
    cfg1 = _config(loss_type="only_lunif_n_then_anchor+lalign+lunif(centroids)",
                   only_lunif_epochs=1)
    cfg2 = _config(loss_type="only_lunif_n_then_anchor+lalign+lunif(centroids)",
                   only_lunif_epochs=1, grad_accum_steps=2)
    mesh = create_mesh(data=8, model=1)
    setup1 = create_train_setup(cfg1, steps_per_epoch=2, mesh=mesh)
    setup2 = create_train_setup(cfg2, steps_per_epoch=2, mesh=mesh)
    host = _batch()
    s1, s2 = setup1.state, setup2.state
    # 3 steps crosses the warm-phase boundary (steps_per_epoch=2)
    for _ in range(3):
        s1, m1 = setup1.train_step(s1, shard_batch(host, mesh))
        s2, m2 = setup2.train_step(s2, shard_batch(host, mesh))
        assert float(m1["train_loss"]) == pytest.approx(
            float(m2["train_loss"]), rel=2e-5
        )
    # Functional equality of the trained params (raw trees are not
    # compared: the attention k-bias gradient is analytically zero, so
    # AdamW turns its ~1e-10 numeric-noise grads — which differ between
    # the fused and two-pass backward — into lr-scale updates on those
    # functionally-dead parameters; same caveat as the dp-vs-tp test).
    model = setup1.model
    held = _batch()

    def embed(state):
        img, txt = model.apply(
            {"params": state.params},
            jnp.asarray(held["images"]), jnp.asarray(held["tokens"]),
            train=False,
        )
        return np.asarray(img), np.asarray(txt)

    i1, t1 = embed(s1)
    i2, t2 = embed(s2)
    np.testing.assert_allclose(i1, i2, rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(t1, t2, rtol=2e-3, atol=5e-5)


def test_grad_accum_learnable_temperature_and_rn():
    """Accumulation also covers the learnable raw temperature (grad via
    the loss block) and runs on a BN tower (per-microbatch statistics)."""
    # microbatch 4 < dp 8: the gather layout must be explicitly allowed
    cfg = _config(anchor_temperature_learnable=True, grad_accum_steps=4,
                  allow_accum_gather=True)
    mesh = create_mesh(data=8, model=1)
    with pytest.warns(UserWarning, match="all-gathers"):
        setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    state, metrics = setup.train_step(setup.state, shard_batch(_batch(), mesh))
    assert np.isfinite(float(metrics["train_loss"]))
    assert float(state.temperature) != 0.1  # temperature got a gradient

    from sparsify_clip_tpu.models.clip import CLIPConfig as CC
    MODEL_REGISTRY.setdefault(
        "test-tiny-rn",
        CC(name="test-tiny-rn", embed_dim=16, vision_kind="resnet",
           image_size=32, vision_width=8, vision_layers=(1, 1, 1, 1),
           vision_heads=4, vocab_size=256, context_length=12,
           text_width=16, text_heads=2, text_layers=2),
    )
    cfg_rn = _config(model="test-tiny-rn", grad_accum_steps=2)
    setup_rn = create_train_setup(cfg_rn, steps_per_epoch=4, mesh=mesh)
    # snapshot BEFORE the step — the input state is donated
    var0 = np.asarray(jax.tree_util.tree_leaves(setup_rn.state.batch_stats)[0])
    state_rn, m_rn = setup_rn.train_step(
        setup_rn.state, shard_batch(_batch(), mesh)
    )
    assert np.isfinite(float(m_rn["train_loss"]))
    # running stats advanced (per-microbatch semantics)
    var1 = np.asarray(jax.tree_util.tree_leaves(state_rn.batch_stats)[0])
    assert not np.allclose(var0, var1)


def test_grad_accum_gather_layout_is_loud():
    """Microbatch not divisible by the data-mesh size forces the dp=1
    contiguous layout (XLA all-gathers the full image batch onto every
    device).  That must never happen silently: error by default,
    explicit warning under allow_accum_gather (train.py build check)."""
    mesh = create_mesh(data=8, model=1)
    # batch 16 / accum 4 -> microbatch 4, not divisible by dp=8
    cfg_bad = _config(grad_accum_steps=4)
    with pytest.raises(ValueError, match="all-gathers the FULL"):
        create_train_setup(cfg_bad, steps_per_epoch=4, mesh=mesh)

    cfg_allowed = _config(grad_accum_steps=4, allow_accum_gather=True)
    with pytest.warns(UserWarning, match="all-gathers"):
        create_train_setup(cfg_allowed, steps_per_epoch=4, mesh=mesh)

    # the divisible case builds silently and takes the shard-aligned path
    import warnings as _warnings

    cfg_ok = _config(grad_accum_steps=2)  # microbatch 8 == dp 8
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        setup = create_train_setup(cfg_ok, steps_per_epoch=4, mesh=mesh)
    state, metrics = setup.train_step(setup.state, shard_batch(_batch(), mesh))
    assert np.isfinite(float(metrics["train_loss"]))


def test_folded_bn_mean_var_cotangents_rejected():
    """The BN-fold custom VJP structurally discards the (mean, var)
    cotangents; differentiating through them must be a loud trace-time
    error, not silently wrong gradients (models/resnet.py)."""
    from sparsify_clip_tpu.models.resnet import _folded_train

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 3, 3, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 16)) * 0.1, jnp.float32)
    scale, bias = jnp.ones((16,)), jnp.zeros((16,))

    def through_mean(x):
        _y, mean, _var = _folded_train(1e-5, x, w, scale, bias)
        return jnp.sum(mean)

    with pytest.raises(ValueError, match="running-statistics"):
        jax.grad(through_mean)(x)

    # the sanctioned pattern (stats stopped, grads through y) still works
    def through_y(x):
        y, mean, var = _folded_train(1e-5, x, w, scale, bias)
        del mean, var
        return jnp.sum(jnp.tanh(y))

    g = jax.grad(through_y)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_train_step_aot_lower_and_cost_analysis():
    """The step exposes an AOT surface (train.py's ``_jitted`` hook):
    ``lower`` + ``cost_analysis`` must keep working — it powers
    ``scripts/flops_audit.py``'s speed-of-light table (BASELINE.md)."""
    cfg = _config()
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    jitted = setup.train_step._jitted
    with jax.sharding.set_mesh(mesh):
        lowered = jitted.lower(setup.state, shard_batch(_batch(), mesh))
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    assert float(cost["flops"]) > 0


def test_train_step_hlo_has_no_conditional_collectives():
    """Deadlock regression guard (the full-suite SIGABRT of round 4).

    ``jnp.diagonal`` in the CE loss traced a cond+gather whose SPMD
    partitioning produced a ``conditional`` HLO holding all-gathers,
    *independent* of the program's other collectives; XLA's CPU thunk
    executor may start independent blocking collectives in different
    orders on different device threads, deadlocking the in-process
    rendezvous (1 thread at op_id=5, 7 at op_id=88 → SIGABRT).  The
    loss now uses utils.numerics.masked_diagonal; assert the compiled
    dp8 step stays conditional-free so the hazard cannot re-enter.
    """
    cfg = _config()
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    jitted = setup.train_step._jitted
    with jax.sharding.set_mesh(mesh):
        compiled = jitted.lower(setup.state, shard_batch(_batch(), mesh)).compile()
    hlo = compiled.as_text()
    assert " conditional(" not in hlo, (
        "train step HLO regained a conditional — if it contains "
        "collectives this deadlocks the 8-fake-device CPU mesh "
        "(see utils.numerics.masked_diagonal)"
    )


def test_adam_mu_dtype_bf16():
    """adam_mu_dtype="bfloat16" stores Adam's first moment in bf16 and
    leaves the second moment fp32 (config.py rationale: nu's 1e-3 EMA
    increments underflow bf16), and the loss trajectory tracks the fp32
    optimizer closely over 20 steps."""
    import optax

    def moments(state):
        for part in jax.tree_util.tree_leaves(
            state.opt_state, is_leaf=lambda x: hasattr(x, "mu")
        ):
            if hasattr(part, "mu"):
                return part.mu, part.nu
        raise AssertionError("no ScaleByAdamState found")

    mesh = create_mesh(data=8, model=1)
    batch = shard_batch(_batch(), mesh)

    trajectories = {}
    for dtype in ("float32", "bfloat16"):
        setup = create_train_setup(
            _config(adam_mu_dtype=dtype), steps_per_epoch=4, mesh=mesh
        )
        mu, nu = moments(setup.state)
        expect_mu = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        for leaf in jax.tree_util.tree_leaves(mu):
            assert leaf.dtype == expect_mu, (dtype, leaf.dtype)
        for leaf in jax.tree_util.tree_leaves(nu):
            assert leaf.dtype == jnp.float32, (dtype, leaf.dtype)
        state, losses = setup.state, []
        for _ in range(20):
            state, metrics = setup.train_step(state, batch)
            losses.append(float(metrics["train_loss"]))
        trajectories[dtype] = losses

    f32, bf16 = trajectories["float32"], trajectories["bfloat16"]
    assert np.isfinite(f32).all() and np.isfinite(bf16).all()
    assert bf16[-1] < bf16[0]  # still optimizes
    np.testing.assert_allclose(bf16, f32, rtol=0.05)
    del optax


def test_adam_mu_dtype_validation():
    with pytest.raises(ValueError, match="adam_mu_dtype"):
        _config(adam_mu_dtype="float16")
