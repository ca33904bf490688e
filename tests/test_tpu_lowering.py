"""Cross-platform (TPU) lowering guards, run from the CPU host.

The CPU-execution suite cannot reach the TPU-only code paths: off-TPU,
``attention_core`` picks the einsum twin and ``ops.fused`` picks the
XLA loss twins, so composition bugs that only bite at TPU lowering
(mosaic's no-automatic-partitioning rule, shard_map vma checks, nested
shard_map wrappers) stay invisible until a multi-chip TPU run — which
this environment cannot execute (one chip).  ``jax.export`` with
``platforms=['tpu']`` over an AbstractMesh closes the hole: mosaic
serializes its kernels without a chip, and every one of the round-4
TPU-only blockers died exactly at this step.

Companion guards: the pipelined-trunk export in tests/test_pipeline.py
and the enclosing-shard_map routing test in tests/test_pallas_attention.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export as jax_export
from jax.sharding import AbstractMesh, NamedSharding, PartitionSpec as P

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.ops.fused import force_pallas_losses
from sparsify_clip_tpu.ops.pallas_attention import force_pallas_attention
from sparsify_clip_tpu.parallel.mesh import DATA_AXIS, create_mesh
from sparsify_clip_tpu.train import (
    build_optimizer,
    create_train_setup,
    make_train_step,
    state_shardings_for,
)

MODEL_REGISTRY.setdefault(
    "lw-tiny",
    CLIPConfig(
        # width 128 so the Pallas kernels hit their compiled (non-padded)
        # tile shapes in the serialized mosaic IR
        name="lw-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=128, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=256, context_length=12, text_width=128, text_heads=2,
        text_layers=2,
    ),
)


@pytest.mark.parametrize("knob", ["tp", "fsdp", "zero1", "accum"])
def test_full_train_step_exports_for_tpu_dp4xtp2(knob):
    """The COMPLETE exp6 train step — Pallas attention, Pallas
    InfoNCE + lunif kernels, warm-phase cond, AdamW — must lower for
    platform 'tpu' on a dp4×tp2 AbstractMesh, under each scaling knob
    (plain TP, FSDP param+moment sharding, ZeRO-1 moment sharding,
    GradCache two-pass accumulation — whose embedding-cotangent second
    pass differentiates through the ring custom-VJPs).
    This is the multi-chip TPU twin of the driver's CPU dryrun: it
    caught mosaic's refusal to auto-partition the loss kernels on ANY
    multi-device mesh.  With dp > 1 the fused losses now route to the
    ring-chunked distributed formulations (ops.fused._ring_loss →
    parallel/dist_losses), so the artifact must carry the ring's
    collective-permutes and the mosaic kernels are attention-only."""
    cfg = ExperimentConfig.from_dict(dict(
        model="lw-tiny", batch_size=16, epochs=2, learning_rate=1e-3,
        loss_type="only_lunif_n_then_anchor+lalign+lunif(centroids)",
        only_lunif_epochs=1, fp16=True, seed=0, use_pallas=True,
        mesh_data=4, mesh_model=2,
        fsdp=(knob == "fsdp"), shard_opt_state=(knob == "zero1"),
        grad_accum_steps=(2 if knob == "accum" else 1),
    ))

    # authoritative state SHAPES from a cheap concrete 1-device setup
    setup = create_train_setup(
        cfg, steps_per_epoch=4, mesh=create_mesh(data=1, model=1)
    )
    state_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), setup.state
    )

    amesh = AbstractMesh((4, 2), ("data", "model"))
    # the SAME sharding assembly production runs (train.py)
    state_shards = state_shardings_for(cfg, state_shapes, amesh)
    batch_shards = NamedSharding(amesh, P(DATA_AXIS))
    optimizer, schedule = build_optimizer(cfg, total_steps=8)
    step = make_train_step(
        setup.model, cfg, optimizer, steps_per_epoch=4, total_steps=8,
        lr_schedule=schedule, state_shards=state_shards,
        batch_shards=batch_shards,
    )

    abstract_state = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_shapes, state_shards,
    )
    abstract_batch = {
        "images": jax.ShapeDtypeStruct(
            (16, 32, 32, 3), jnp.float32, sharding=batch_shards
        ),
        "tokens": jax.ShapeDtypeStruct(
            (16, 12), jnp.int32, sharding=batch_shards
        ),
    }
    with force_pallas_attention(), force_pallas_losses():
        with jax.sharding.use_abstract_mesh(amesh):
            exp = jax_export.export(step._jitted, platforms=["tpu"])(
                abstract_state, abstract_batch
            )
    assert exp.platforms == ("tpu",)
    module = exp.mlir_module()
    # the artifact must contain the mosaic attention kernels (fwd/bwd in
    # both towers), or the force flags silently stopped routing to the
    # Pallas branches
    assert module.count("tpu_custom_call") >= 4
    # ... and the ring-chunked distributed losses (dp=4 > 1 routes the
    # fused InfoNCE/lunif through ppermute rings, not gather-replicate)
    assert "collective_permute" in module or "collective-permute" in module
