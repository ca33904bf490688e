"""SigLIP sigmoid contrastive loss (framework extension): torch golden,
ring-chunked distributed twin, train-step integration, config gates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.losses.sigmoid import siglip_loss
from sparsify_clip_tpu.parallel.dist_losses import ring_siglip_loss
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.train import create_train_setup

RNG = np.random.default_rng(11)
N, D = 64, 32


def _pair(n=N, d=D):
    img = RNG.standard_normal((n, d)).astype(np.float32)
    txt = RNG.standard_normal((n, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    return img, txt


def _torch_siglip(img, txt, scale, bias):
    """Independent fp32 golden: -mean_i sum_j logsigmoid(z * logits)."""
    import torch
    import torch.nn.functional as F

    im = torch.from_numpy(img)
    tx = torch.from_numpy(txt)
    logits = im @ tx.T * scale + bias
    z = 2.0 * torch.eye(im.shape[0]) - 1.0
    return float(-F.logsigmoid(z * logits).sum() / im.shape[0])


def test_siglip_matches_torch_golden():
    img, txt = _pair()
    want = _torch_siglip(img, txt, 10.0, -10.0)
    got = float(siglip_loss(jnp.asarray(img), jnp.asarray(txt), 10.0, -10.0))
    assert got == pytest.approx(want, rel=2e-5)
    # a second (scale, bias) point so the affine wiring is pinned too
    want2 = _torch_siglip(img, txt, 3.5, -1.25)
    got2 = float(siglip_loss(jnp.asarray(img), jnp.asarray(txt), 3.5, -1.25))
    assert got2 == pytest.approx(want2, rel=2e-5)


def test_siglip_perfect_alignment_is_low():
    img, _ = _pair()
    x = jnp.asarray(img)
    aligned = float(siglip_loss(x, x, 10.0, -10.0))
    shuffled = float(siglip_loss(x, jnp.asarray(np.roll(img, 1, axis=0)), 10.0, -10.0))
    assert aligned < shuffled


def test_ring_siglip_matches_global():
    mesh = create_mesh(data=8, model=1)
    img, txt = _pair()
    want = float(siglip_loss(jnp.asarray(img), jnp.asarray(txt), 7.0, -4.0))
    fn = jax.jit(
        shard_map(
            lambda i, t: ring_siglip_loss(i, t, 7.0, -4.0),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
        )
    )
    got = float(fn(jnp.asarray(img), jnp.asarray(txt)))
    # summation order differs (per-block partial sums around the ring)
    assert got == pytest.approx(want, rel=1e-5)


def test_ring_siglip_grads_match_global():
    """The ring twin must be differentiable with the same cotangents —
    it is the distributed TRAINING form, not just an eval twin."""
    mesh = create_mesh(data=8, model=1)
    img, txt = _pair(32, 16)
    ji, jt = jnp.asarray(img), jnp.asarray(txt)

    def g_global(i, t, s, b):
        return siglip_loss(i, t, jnp.exp(s), b)

    def g_ring(i, t, s, b):
        fn = shard_map(
            lambda ii, tt, ss, bb: ring_siglip_loss(ii, tt, jnp.exp(ss), bb),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P(), P()),
            out_specs=P(),
        )
        return fn(i, t, s, b)

    args = (ji, jt, jnp.float32(np.log(10.0)), jnp.float32(-10.0))
    want = jax.grad(g_global, argnums=(0, 2, 3))(*args)
    got = jax.jit(jax.grad(g_ring, argnums=(0, 2, 3)))(*args)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-6)


def _config(**kw):
    base = dict(
        model="test-tiny", batch_size=16, epochs=2, learning_rate=1e-3,
        loss_type="siglip", fp16=False, seed=0,
    )
    base.update(kw)
    return ExperimentConfig.from_dict(base)


def _batch(cfg_model, b=16):
    from sparsify_clip_tpu.models.clip import MODEL_REGISTRY

    tiny = MODEL_REGISTRY[cfg_model]
    tokens = RNG.integers(1, 250, size=(b, tiny.context_length)).astype(np.int32)
    tokens[:, 0] = tiny.vocab_size - 2
    tokens[:, -1] = tiny.vocab_size - 1
    return {
        "images": RNG.standard_normal(
            (b, tiny.image_size, tiny.image_size, 3)
        ).astype(np.float32),
        "tokens": tokens,
    }


@pytest.fixture(scope="module")
def tiny_registered():
    # reuse test_train's tiny registry entry
    import tests.test_train  # noqa: F401

    return "test-tiny"


def test_siglip_train_step_learns_scalars(tiny_registered):
    cfg = _config()
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    assert setup.state.loss_scalars is not None
    s0 = float(setup.state.loss_scalars["logit_scale"])
    b0 = float(setup.state.loss_scalars["logit_bias"])
    assert np.exp(s0) == pytest.approx(10.0, rel=1e-6)
    assert b0 == pytest.approx(-10.0)

    batch = shard_batch(_batch(tiny_registered), mesh)
    state = setup.state
    losses = []
    for _ in range(8):
        state, metrics = setup.train_step(state, batch)
        losses.append(float(metrics["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # both scalars are trainable and actually moved
    assert float(state.loss_scalars["logit_scale"]) != s0
    assert float(state.loss_scalars["logit_bias"]) != b0
    # metrics expose the positive scale, not the log param
    assert float(metrics["siglip_scale"]) == pytest.approx(
        float(jnp.exp(state.loss_scalars["logit_scale"])), rel=1e-6
    )
    assert "siglip_bias" in metrics


def test_siglip_grad_accum_matches_full_batch(tiny_registered):
    """GradCache threads the scalar grads: accumulated microbatches must
    reproduce the full-batch trajectory (ViT tower: no BN stats delta)."""
    cfg1 = _config()
    cfg2 = _config(grad_accum_steps=2)
    mesh = create_mesh(data=8, model=1)
    setup1 = create_train_setup(cfg1, steps_per_epoch=2, mesh=mesh)
    setup2 = create_train_setup(cfg2, steps_per_epoch=2, mesh=mesh)
    batch = shard_batch(_batch(tiny_registered), mesh)
    s1, s2 = setup1.state, setup2.state
    for _ in range(3):
        s1, m1 = setup1.train_step(s1, batch)
        s2, m2 = setup2.train_step(s2, batch)
        assert float(m1["train_loss"]) == pytest.approx(
            float(m2["train_loss"]), rel=2e-5
        )
    np.testing.assert_allclose(
        float(s2.loss_scalars["logit_scale"]),
        float(s1.loss_scalars["logit_scale"]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(s2.loss_scalars["logit_bias"]),
        float(s1.loss_scalars["logit_bias"]), rtol=1e-5,
    )


def test_siglip_config_gates():
    with pytest.raises(ValueError, match="learnable"):
        _config(anchor_temperature_learnable=True)
    with pytest.raises(ValueError, match="positive"):
        _config(siglip_logit_scale_init=0.0)
    # direct make_loss_fn misuse is loud
    from sparsify_clip_tpu.losses import LossContext, make_loss_fn

    fn = make_loss_fn("siglip")
    img, txt = _pair(8, 4)
    ctx = LossContext(
        temperature=jnp.float32(0.1), beta=jnp.float32(0.0),
        alpha=jnp.float32(0.0), warm=jnp.bool_(False),
    )
    with pytest.raises(ValueError, match="logit_scale"):
        fn(jnp.asarray(img), jnp.asarray(txt), ctx)


def test_siglip_state_checkpoint_roundtrip(tiny_registered, tmp_path):
    """loss_scalars ride the orbax full-state path."""
    from sparsify_clip_tpu import checkpoints

    cfg = _config()
    mesh = create_mesh(data=8, model=1)
    setup = create_train_setup(cfg, steps_per_epoch=4, mesh=mesh)
    state, _ = setup.train_step(setup.state, shard_batch(_batch(tiny_registered), mesh))
    path = checkpoints.save_full(state, str(tmp_path / "ck"))
    restored = checkpoints.restore_full(
        path, jax.tree_util.tree_map(np.asarray, state)
    )
    np.testing.assert_allclose(
        np.asarray(restored.loss_scalars["logit_scale"]),
        np.asarray(state.loss_scalars["logit_scale"]),
    )
    np.testing.assert_allclose(
        np.asarray(restored.loss_scalars["logit_bias"]),
        np.asarray(state.loss_scalars["logit_bias"]),
    )
