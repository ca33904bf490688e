"""Tensor-parallel correctness: a dp=4×tp=2 mesh must train identically
to dp=8×tp=1 (same seed, same batch) — TP is a layout choice, not a
numerics choice.  Also exercises the Pallas attention kernel (interpret
mode) under the combined dp×tp mesh with a model-axis-sharded qkv, the
layout the Megatron TP rules produce for the in_proj output.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas.tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.train import create_train_setup

MODEL_REGISTRY.setdefault(
    "tp-tiny",
    CLIPConfig(
        name="tp-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=256, context_length=12, text_width=16, text_heads=2,
        text_layers=2,
        # non-4x MLPs (the ViT-g/bigG shape): the c_fc/c_proj TP rules
        # must shard arbitrary hidden widths, not just width*4
        vision_mlp_hidden=48, text_mlp_hidden=24,
    ),
)


def _make(dp: int, tp: int):
    cfg = ExperimentConfig.from_dict({
        "model": "tp-tiny", "batch_size": 16, "epochs": 2,
        "learning_rate": 1e-3, "seed": 0, "fp16": False,
        # flagship (experiment-6) stack incl. the warm-phase lax.cond
        "loss_type": "only_lunif_n_then_anchor+lalign+lunif(centroids)",
        "only_lunif_epochs": 1,
        "mesh_data": dp, "mesh_model": tp,
    })
    mesh = create_mesh(data=dp, model=tp)
    return create_train_setup(cfg, steps_per_epoch=4, mesh=mesh), mesh


def _batch():
    rng = np.random.default_rng(3)
    tokens = rng.integers(1, 250, size=(16, 12)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    return {
        "images": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
        "tokens": tokens,
    }


def test_dp_vs_tp_train_step_equality():
    setup_dp, mesh_dp = _make(8, 1)
    setup_tp, mesh_tp = _make(4, 2)

    # identical init: the mesh must not affect parameter values
    for a, b in zip(
        jax.tree_util.tree_leaves(setup_dp.state.params),
        jax.tree_util.tree_leaves(setup_tp.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    host_batch = _batch()
    state_dp, state_tp = setup_dp.state, setup_tp.state
    # The loss at step k depends on the params produced by steps 1..k-1,
    # so per-step loss equality asserts the whole functional trajectory.
    # (Raw param trees are NOT compared: the attention k-bias has an
    # analytically zero gradient — a constant k-shift adds a per-row
    # constant to the scores, which softmax ignores — and AdamW
    # normalizes its ~1e-10 numeric-noise grads into mesh-dependent
    # lr-scale updates on those functionally-dead parameters.)
    for _ in range(3):
        state_dp, m_dp = setup_dp.train_step(
            state_dp, shard_batch(host_batch, mesh_dp)
        )
        state_tp, m_tp = setup_tp.train_step(
            state_tp, shard_batch(host_batch, mesh_tp)
        )
        assert float(m_dp["train_loss"]) == pytest.approx(
            float(m_tp["train_loss"]), rel=1e-4
        )

    # Functional equality of the trained models: both final states must
    # embed a held-out batch identically.
    model = setup_dp.model
    held_out = _batch()

    def embed(state):
        img, txt = model.apply(
            {"params": state.params},
            jnp.asarray(held_out["images"]),
            jnp.asarray(held_out["tokens"]),
            train=False,
        )
        return np.asarray(img), np.asarray(txt)

    # fp32 reduction order differs between the two meshes; after 3 Adam
    # steps the accumulated drift is ~1e-3 relative on a few elements.
    img_dp, txt_dp = embed(state_dp)
    img_tp, txt_tp = embed(state_tp)
    np.testing.assert_allclose(img_dp, img_tp, rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(txt_dp, txt_tp, rtol=2e-3, atol=5e-5)


MODEL_REGISTRY.setdefault(
    "rn-tiny",
    CLIPConfig(
        name="rn-tiny", embed_dim=16, vision_kind="resnet", image_size=32,
        vision_width=8, vision_layers=(1, 1, 1, 1), vision_heads=4,
        vocab_size=256, context_length=12, text_width=16, text_heads=2,
        text_layers=2,
    ),
)


def _make_rn(dp: int, tp: int = 1):
    cfg = ExperimentConfig.from_dict({
        "model": "rn-tiny", "batch_size": 16, "epochs": 2,
        "learning_rate": 1e-3, "seed": 0, "fp16": False,
        "loss_type": "only_lunif_n_then_anchor+lalign+lunif(centroids)",
        "only_lunif_epochs": 1,
        "mesh_data": dp, "mesh_model": tp,
    })
    mesh = create_mesh(data=dp, model=tp, devices=jax.devices()[: dp * tp])
    return create_train_setup(cfg, steps_per_epoch=4, mesh=mesh), mesh


@pytest.mark.slow
def test_rn_folded_bn_global_stats_dp8_vs_dp1():
    """BatchNorm in the RN tower — including the folded conv+BN path,
    whose statistics come from a dot_general over the batch axis — must
    compute GLOBAL batch statistics when the batch is sharded dp=8;
    XLA's partitioner psums the moment reductions.  Pins the per-step
    loss trajectory AND the running batch_stats tree across meshes
    (replaces the reference's single-device BatchNorm semantics,
    sparsify_clip.py:703 + SURVEY.md §2.4)."""
    setup8, mesh8 = _make_rn(8)
    setup1, mesh1 = _make_rn(1)

    host_batch = _batch()
    state8, state1 = setup8.state, setup1.state
    for _ in range(2):
        state8, m8 = setup8.train_step(state8, shard_batch(host_batch, mesh8))
        state1, m1 = setup1.train_step(state1, shard_batch(host_batch, mesh1))
        assert float(m8["train_loss"]) == pytest.approx(
            float(m1["train_loss"]), rel=1e-4
        )

    # fp32 reduction order differs between the meshes and the step-1
    # param drift compounds into step-2's statistics — same ~1e-3 band
    # as the dp-vs-tp embedding check above.
    jax.tree_util.tree_map_with_path(
        lambda k, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5, err_msg=str(k)
        ),
        state8.batch_stats, state1.batch_stats,
    )


@pytest.mark.slow
def test_rn_dp_vs_tp_train_step_equality():
    """RN tower under dp=4×tp=2 == dp=8: the TP rules row-shard the
    attnpool's ``c_proj`` and the text tower's matmuls while the conv
    kernels replicate — a layout change only.  Pins the reference's
    default model family (RN50, sparsify_clip.py:686) under the
    combined mesh, not just the ViT towers."""
    setup_dp, mesh_dp = _make_rn(8, 1)
    setup_tp, mesh_tp = _make_rn(4, 2)

    host_batch = _batch()
    state_dp, state_tp = setup_dp.state, setup_tp.state
    for _ in range(2):
        state_dp, m_dp = setup_dp.train_step(
            state_dp, shard_batch(host_batch, mesh_dp)
        )
        state_tp, m_tp = setup_tp.train_step(
            state_tp, shard_batch(host_batch, mesh_tp)
        )
        assert float(m_dp["train_loss"]) == pytest.approx(
            float(m_tp["train_loss"]), rel=1e-4
        )

    # Functional equality of the trained models on a held-out batch —
    # the scalar loss alone could mask a TP mis-sharding that perturbs
    # gradients within tolerance (same check as the ViT test above).
    model = setup_dp.model
    held_out = _batch()

    def embed(state):
        img, txt = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(held_out["images"]),
            jnp.asarray(held_out["tokens"]),
            train=False,
        )
        return np.asarray(img), np.asarray(txt)

    img_dp, txt_dp = embed(state_dp)
    img_tp, txt_tp = embed(state_tp)
    np.testing.assert_allclose(img_dp, img_tp, rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(txt_dp, txt_tp, rtol=2e-3, atol=5e-5)


def _einsum_ref(qkv, heads, causal):
    from sparsify_clip_tpu.ops.pallas_attention import attention_core

    return attention_core(qkv, heads, causal=causal, use_pallas=False)


def test_pallas_attention_model_sharded_qkv_on_dp_tp_mesh():
    """mha_pallas_sharded fed a qkv sharded (data, -, model) — the
    column-parallel in_proj output layout under tp>1 — matches the
    global einsum path, values and grads."""
    from sparsify_clip_tpu.ops.pallas_attention import mha_pallas_sharded

    mesh = create_mesh(data=4, model=2)
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((16, 20, 96)).astype(np.float32))
    want = np.asarray(_einsum_ref(qkv, 4, True))
    want_grad = np.asarray(
        jax.grad(lambda v: jnp.sum(jnp.square(_einsum_ref(v, 4, True))))(qkv)
    )

    with jax.sharding.set_mesh(mesh):
        x = jax.device_put(qkv, NamedSharding(mesh, P("data", None, "model")))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                jax.jit(lambda v: mha_pallas_sharded(v, 4, True))(x)
            )
            got_grad = np.asarray(
                jax.jit(
                    jax.grad(
                        lambda v: jnp.sum(jnp.square(mha_pallas_sharded(v, 4, True)))
                    )
                )(x)
            )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(got_grad, want_grad, rtol=1e-4, atol=1e-5)
