"""GPipe pipeline-parallel correctness on the 8-fake-device CPU mesh.

The stage split is a layout choice, not a numerics choice: a dp=2 ×
stages=4 pipelined run must match plain scan/unrolled execution — core
trunk values and grads exactly, and the full train step's loss
trajectory vs a dp=8 run (same seed, same batch).  The schedule's
collectives (ppermute handoffs, the output psum) live in a statically
unrolled loop, never inside lax.scan, so executing them on the fake
mesh is safe (CLAUDE.md scan-collectives gotcha; the per-stage layer
loop is a collective-free lax.scan).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.models.layers import Transformer
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.train import create_train_setup

MODEL_REGISTRY.setdefault(
    "pp-tiny",
    CLIPConfig(
        name="pp-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(4,), vision_heads=2, patch_size=16,
        vocab_size=256, context_length=12, text_width=16, text_heads=2,
        text_layers=4,
    ),
)


def _trunk_setup():
    mesh = create_mesh(data=2, model=4)
    plain = Transformer(width=16, layers=4, heads=2, scan_layers=True)
    variables = plain.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 5, 16), jnp.float32)
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((16, 5, 16)).astype(np.float32))
    return mesh, plain, variables, x


def _pp_trunk(mesh, n_micro=None):
    return Transformer(
        width=16, layers=4, heads=2, scan_layers=True,
        pipeline_stages=4, pipeline_microbatches=n_micro, pipeline_mesh=mesh,
    )


def test_pipelined_trunk_matches_scan_values_and_grads():
    mesh, plain, variables, x = _trunk_setup()
    want = np.asarray(jax.jit(plain.apply)(variables, x))

    for n_micro in (None, 8):  # default (= stages) and oversplit
        pp = _pp_trunk(mesh, n_micro)
        got = np.asarray(jax.jit(pp.apply)(variables, x))
        # per-layer math is identical; the residual is fp32
        # reduction-order noise from the differently-partitioned matmuls
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)
        # serialize multi-device dispatches (CLAUDE.md): the assert
        # above already fenced via np.asarray

    def loss(model):
        def f(v):
            return jnp.sum(jnp.square(model.apply(v, x)))
        return f

    g_plain = jax.jit(jax.grad(loss(plain)))(variables)
    _ = jax.tree_util.tree_map(np.asarray, g_plain)  # fence
    g_pp = jax.jit(jax.grad(loss(_pp_trunk(mesh))))(variables)
    # atol absorbs the attention k-bias entries: their gradient is
    # analytically zero (a constant k-shift cancels in softmax), so both
    # sides are O(1e-5) numeric noise against O(1e2) real grads — same
    # caveat as tests/test_tp_equivalence.py.
    jax.tree_util.tree_map_with_path(
        lambda k, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4, err_msg=str(k)
        ),
        g_plain, g_pp,
    )


def _make(dp: int, mm: int, pipeline: bool):
    cfg = ExperimentConfig.from_dict({
        "model": "pp-tiny", "batch_size": 16, "epochs": 2,
        "learning_rate": 1e-3, "seed": 0, "fp16": False,
        # flagship (experiment-6) stack incl. the warm-phase lax.cond
        "loss_type": "only_lunif_n_then_anchor+lalign+lunif(centroids)",
        "only_lunif_epochs": 1,
        "mesh_data": dp, "mesh_model": mm,
        "scan_layers": True, "pipeline": pipeline,
    })
    mesh = create_mesh(data=dp, model=mm)
    return create_train_setup(cfg, steps_per_epoch=4, mesh=mesh), mesh


def _batch():
    rng = np.random.default_rng(3)
    tokens = rng.integers(1, 250, size=(16, 12)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    return {
        "images": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
        "tokens": tokens,
    }


def test_dp_vs_pipeline_train_step_equality():
    """dp=2 × 4 pipeline stages trains identically to dp=8 (same seed,
    same batch): per-step losses pin the functional trajectory, the
    held-out embedding check pins the trained weights."""
    setup_dp, mesh_dp = _make(8, 1, pipeline=False)
    setup_pp, mesh_pp = _make(2, 4, pipeline=True)

    # identical init: mesh/pipeline must not affect parameter values
    for a, b in zip(
        jax.tree_util.tree_leaves(setup_dp.state.params),
        jax.tree_util.tree_leaves(setup_pp.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    host_batch = _batch()
    state_dp, state_pp = setup_dp.state, setup_pp.state
    for _ in range(3):
        state_dp, m_dp = setup_dp.train_step(
            state_dp, shard_batch(host_batch, mesh_dp)
        )
        loss_dp = float(m_dp["train_loss"])  # fence before next dispatch
        state_pp, m_pp = setup_pp.train_step(
            state_pp, shard_batch(host_batch, mesh_pp)
        )
        assert loss_dp == pytest.approx(float(m_pp["train_loss"]), rel=1e-4)

    # Functional equality of the trained models on a held-out batch
    # (embed both states with the NON-pipelined model — same param
    # layout, single-program semantics).
    model = setup_dp.model
    held_out = _batch()

    def embed(state):
        img, txt = jax.jit(
            lambda p: model.apply(
                {"params": p},
                jnp.asarray(held_out["images"]),
                jnp.asarray(held_out["tokens"]),
                train=False,
            )
        )(state.params)
        return np.asarray(img), np.asarray(txt)

    img_dp, txt_dp = embed(state_dp)
    img_pp, txt_pp = embed(state_pp)
    np.testing.assert_allclose(img_dp, img_pp, rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(txt_dp, txt_pp, rtol=2e-3, atol=5e-5)


def test_pipeline_validation_is_loud():
    # pipeline without scan_layers
    with pytest.raises(ValueError, match="scan_layers"):
        cfg = ExperimentConfig.from_dict({
            "model": "pp-tiny", "batch_size": 16, "epochs": 1,
            "learning_rate": 1e-3, "mesh_data": 2, "mesh_model": 4,
            "pipeline": True,
        })
        create_train_setup(cfg, steps_per_epoch=4,
                           mesh=create_mesh(data=2, model=4))

    # pipeline on a ResNet tower
    with pytest.raises(ValueError, match="ResNet"):
        cfg = ExperimentConfig.from_dict({
            "model": "RN50", "batch_size": 16, "epochs": 1,
            "learning_rate": 1e-3, "mesh_data": 2, "mesh_model": 4,
            "pipeline": True, "scan_layers": True,
        })
        create_train_setup(cfg, steps_per_epoch=4,
                           mesh=create_mesh(data=2, model=4))

    # tower depth not divisible by the stage count
    MODEL_REGISTRY.setdefault(
        "pp-tiny-odd",
        CLIPConfig(
            name="pp-tiny-odd", embed_dim=16, vision_kind="vit",
            image_size=32, vision_width=32, vision_layers=(3,),
            vision_heads=2, patch_size=16, vocab_size=256,
            context_length=12, text_width=16, text_heads=2, text_layers=4,
        ),
    )
    with pytest.raises(ValueError, match="not divisible"):
        cfg = ExperimentConfig.from_dict({
            "model": "pp-tiny-odd", "batch_size": 16, "epochs": 1,
            "learning_rate": 1e-3, "mesh_data": 2, "mesh_model": 4,
            "pipeline": True, "scan_layers": True,
        })
        create_train_setup(cfg, steps_per_epoch=4,
                           mesh=create_mesh(data=2, model=4))

    # fsdp is exclusive with pipeline
    with pytest.raises(ValueError, match="fsdp"):
        cfg = ExperimentConfig.from_dict({
            "model": "pp-tiny", "batch_size": 16, "epochs": 1,
            "learning_rate": 1e-3, "mesh_data": 2, "mesh_model": 4,
            "pipeline": True, "scan_layers": True, "fsdp": True,
        })
        create_train_setup(cfg, steps_per_epoch=4,
                           mesh=create_mesh(data=2, model=4))

    # GradCache accumulation is exclusive with pipeline
    with pytest.raises(ValueError, match="grad_accum"):
        cfg = ExperimentConfig.from_dict({
            "model": "pp-tiny", "batch_size": 16, "epochs": 1,
            "learning_rate": 1e-3, "mesh_data": 2, "mesh_model": 4,
            "pipeline": True, "scan_layers": True, "grad_accum_steps": 2,
        })
        create_train_setup(cfg, steps_per_epoch=4,
                           mesh=create_mesh(data=2, model=4))

    # remat would be silently ignored by the stage loop — reject it
    # (review finding, round 4: gpipe already checkpoints per
    # (microbatch, stage), so a remat_policy would do nothing)
    with pytest.raises(ValueError, match="remat"):
        cfg = ExperimentConfig.from_dict({
            "model": "pp-tiny", "batch_size": 16, "epochs": 1,
            "learning_rate": 1e-3, "mesh_data": 2, "mesh_model": 4,
            "pipeline": True, "scan_layers": True, "remat": True,
        })
        create_train_setup(cfg, steps_per_epoch=4,
                           mesh=create_mesh(data=2, model=4))

    # microbatches: 0 must be a descriptive ValueError, not a
    # ZeroDivisionError out of the modulo (review finding, round 4)
    from sparsify_clip_tpu.parallel.pipeline import validate_pipeline

    with pytest.raises(ValueError, match="microbatches"):
        validate_pipeline(n_layers=4, stages=4, local_batch=8, n_micro=0)


def test_eval_on_pipelined_model_matches_plain():
    """The CLI's eval path runs the SAME (possibly pipelined) model the
    train step uses (cli.py builds eval_model from setup.model), so the
    pipelined encoders must produce the same retrieval metrics as the
    plain dp twin — eval is a layout-independent read of the weights."""
    from sparsify_clip_tpu.eval import evaluate_model, make_eval_model

    setup_dp, mesh_dp = _make(8, 1, pipeline=False)
    setup_pp, mesh_pp = _make(2, 4, pipeline=True)

    rng = np.random.default_rng(11)
    batches = []
    for _ in range(2):
        tokens = rng.integers(1, 250, size=(16, 12)).astype(np.int32)
        tokens[:, 0], tokens[:, -1] = 254, 255
        batches.append({
            "images": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
            "tokens": tokens,
        })

    def run_eval(setup, mesh):
        eval_model = make_eval_model(setup.model, eval_fp32=True)
        return evaluate_model(
            eval_model, {"params": setup.state.params}, batches, mesh=mesh
        )

    plain = run_eval(setup_dp, mesh_dp)
    # np-free fence between the two multi-device programs happens inside
    # evaluate_model's host-side metric reads
    pipelined = run_eval(setup_pp, mesh_pp)
    for key in plain:
        assert pipelined[key] == pytest.approx(plain[key], abs=2e-3), key


def test_pipelined_trunk_lowers_for_tpu_with_pallas_attention():
    """Cross-platform lowering guard: export the pipelined trunk
    (fwd+grad) for platform 'tpu' FROM the CPU host, with the real
    Pallas MHA forced on (force_pallas_attention).  The two round-4
    TPU-only breakages — mha_pallas_sharded nesting a second shard_map
    inside the gpipe worker, and the vma check rejecting pallas_call
    outputs — both die at exactly this lowering step, which the
    CPU-execution tests can never reach (attention_core picks einsum
    off-TPU).  Mosaic serializes without a chip."""
    from jax import export as jax_export
    from jax.sharding import AbstractMesh, NamedSharding, PartitionSpec as P

    from sparsify_clip_tpu.ops.pallas_attention import force_pallas_attention

    amesh = AbstractMesh((2, 4), ("data", "model"))
    plain = Transformer(width=128, layers=4, heads=2, scan_layers=True)
    var_shapes = jax.eval_shape(
        lambda: plain.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 8, 128), jnp.float32)))
    pp = Transformer(width=128, layers=4, heads=2, scan_layers=True,
                     pipeline_stages=4, pipeline_mesh=amesh)

    def step(variables, x):
        return jax.grad(lambda v: jnp.sum(jnp.square(pp.apply(v, x))))(variables)

    x_in = jax.ShapeDtypeStruct((16, 8, 128), jnp.float32,
                                sharding=NamedSharding(amesh, P("data")))
    vars_in = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                       sharding=NamedSharding(amesh, P())),
        var_shapes)
    with force_pallas_attention():
        exp = jax_export.export(jax.jit(step), platforms=["tpu"])(vars_in, x_in)
    assert exp.platforms == ("tpu",)
    # the artifact must actually contain the mosaic kernel, or the
    # force flag silently stopped routing to the Pallas branch
    assert "tpu_custom_call" in exp.mlir_module()
