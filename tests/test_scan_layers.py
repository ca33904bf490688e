"""scan_layers: lax.scan over transformer blocks == the unrolled loop.

The knob is the compile-time/HLO-size lever for the 32-48 layer towers
(ViT-H/g/bigG): one traced block body regardless of depth, params
stacked on a leading (layers, ...) axis.  These tests pin that it is a
pure program-shape choice — same math as the unrolled loop given
repacked params, TP rules rank-pad onto the stacked kernels, and the
dp×tp train step stays equivalent to plain dp with scan on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.models import CLIP, CLIPConfig
from sparsify_clip_tpu.models.clip import MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import (
    create_mesh, param_shardings, shard_batch,
)
from sparsify_clip_tpu.train import create_train_setup

SCAN_TINY = CLIPConfig(
    name="scan-tiny", embed_dim=16, vision_kind="vit", image_size=32,
    vision_width=32, vision_layers=(3,), vision_heads=2, patch_size=16,
    vocab_size=256, context_length=12, text_width=16, text_heads=2,
    text_layers=3, vision_mlp_hidden=48,  # non-4x too
)


def _stack_resblocks(tower_params, n_layers):
    """Repack unrolled resblock_i params into the scan layout
    (layers_scan/block/** with a leading layer axis)."""
    transformer = dict(tower_params["transformer"])
    blocks = [transformer.pop(f"resblock_{i}") for i in range(n_layers)]
    transformer["layers_scan"] = {
        "block": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *blocks
        )
    }
    out = dict(tower_params)
    out["transformer"] = transformer
    return out


def test_scan_equals_unrolled_forward():
    unrolled = CLIP(cfg=SCAN_TINY)
    scanned = CLIP(cfg=SCAN_TINY, scan_layers=True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    tokens = np.zeros((2, 12), np.int32)
    tokens[:, 0], tokens[:, 1], tokens[:, -1] = 254, 7, 255
    tokens = jnp.asarray(tokens)

    variables = unrolled.init(jax.random.PRNGKey(0), images, tokens,
                              train=False)
    p = variables["params"]
    scan_params = {
        "visual": _stack_resblocks(p["visual"], 3),
        "text": _stack_resblocks(p["text"], 3),
    }
    # the repacked tree must match the scan model's own init structure
    scan_init = scanned.init(jax.random.PRNGKey(1), images, tokens,
                             train=False)["params"]
    assert (jax.tree_util.tree_structure(scan_init)
            == jax.tree_util.tree_structure(scan_params))

    img_u, txt_u = unrolled.apply(variables, images, tokens, train=False)
    img_s, txt_s = scanned.apply(
        {"params": scan_params}, images, tokens, train=False)
    np.testing.assert_allclose(np.asarray(img_u), np.asarray(img_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(txt_u), np.asarray(txt_s),
                               rtol=1e-6, atol=1e-6)


def test_scan_tp_rules_rank_pad_onto_stacked_kernels():
    scanned = CLIP(cfg=SCAN_TINY, scan_layers=True)
    variables = jax.eval_shape(
        lambda: scanned.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
            jnp.zeros((2, 12), jnp.int32), train=False,
        )
    )
    mesh = create_mesh(data=4, model=2)
    shardings = param_shardings(variables["params"], mesh)
    blk = shardings["visual"]["transformer"]["layers_scan"]["block"]
    P = jax.sharding.PartitionSpec
    assert blk["attn"]["in_proj"]["kernel"].spec == P(None, None, "model")
    assert blk["attn"]["out_proj"]["kernel"].spec == P(None, "model", None)
    assert blk["mlp"]["c_fc"]["kernel"].spec == P(None, None, "model")
    assert blk["mlp"]["c_proj"]["kernel"].spec == P(None, "model", None)
    # embeddings / LN stay replicated
    assert blk["ln_1"]["ln"]["scale"].spec == P()


def test_scan_jaxpr_size_constant_in_depth():
    """The point of the knob: program size must not grow with depth."""
    def jaxpr_len(layers, scan):
        cfg = CLIPConfig(
            name=f"d{layers}", embed_dim=16, vision_kind="vit",
            image_size=32, vision_width=32, vision_layers=(layers,),
            vision_heads=2, patch_size=16, vocab_size=64,
            context_length=8, text_width=16, text_heads=2, text_layers=2,
        )
        model = CLIP(cfg=cfg, scan_layers=scan)
        imgs = jnp.zeros((1, 32, 32, 3))
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), imgs,
                               jnp.zeros((1, 8), jnp.int32), train=False)
        )
        jaxpr = jax.make_jaxpr(
            lambda v: model.apply(v, imgs, jnp.zeros((1, 8), jnp.int32),
                                  train=False)
        )(variables)
        return len(jaxpr.jaxpr.eqns) + sum(
            len(e.params.get("jaxpr").jaxpr.eqns)
            for e in jaxpr.jaxpr.eqns if "jaxpr" in e.params
        )

    unrolled_2, unrolled_8 = jaxpr_len(2, False), jaxpr_len(8, False)
    scan_2, scan_8 = jaxpr_len(2, True), jaxpr_len(8, True)
    assert unrolled_8 > unrolled_2  # unrolled grows with depth
    assert scan_8 == scan_2         # scanned does not

def _scan_setup(scan, dp=1, tp=1):
    MODEL_REGISTRY.setdefault("scan-tiny", SCAN_TINY)
    cfg = ExperimentConfig.from_dict({
        "model": "scan-tiny", "batch_size": 16, "epochs": 2,
        "learning_rate": 1e-3, "seed": 0, "fp16": False,
        "loss_type": "only_lunif_n_then_anchor+lalign+lunif(centroids)",
        "only_lunif_epochs": 1, "scan_layers": scan,
        "mesh_data": dp, "mesh_model": tp,
    })
    mesh = create_mesh(data=dp, model=tp, devices=jax.devices()[:dp * tp])
    return create_train_setup(cfg, steps_per_epoch=4, mesh=mesh), mesh


@pytest.mark.slow
def test_scan_train_step_matches_unrolled():
    """Full train step (fwd + bwd + AdamW + schedules) with scan_layers
    produces the unrolled loop's loss trajectory, given the same
    initial params repacked into the stacked layout.  Single-device
    mesh: collectives-inside-scan deadlock the XLA *CPU* rendezvous
    runtime under the 8-fake-device emulation (threads reach different
    scan iterations; a host-runtime artifact — on TPU this is the
    standard scanned-layers pattern), so TP composition is pinned by
    the lowering test below plus the sharding-rule unit test above."""
    setup_u, mesh_u = _scan_setup(scan=False)
    setup_s, _ = _scan_setup(scan=True)

    p = setup_u.state.params
    repacked = {
        "visual": _stack_resblocks(p["visual"], 3),
        "text": _stack_resblocks(p["text"], 3),
    }
    # fresh buffers: the train step donates its state, and the
    # passthrough (non-block) leaves above still alias setup_u's params
    repacked = jax.tree_util.tree_map(jnp.copy, repacked)
    chex_equal = jax.tree_util.tree_structure(
        setup_s.state.params) == jax.tree_util.tree_structure(repacked)
    assert chex_equal
    state_s = setup_s.state.replace(params=repacked)
    # fresh optimizer state zeros match either layout's tree — rebuild
    # nothing: moments were initialized for the scan tree structure and
    # zeros are layout-independent values

    rng = np.random.default_rng(3)
    tokens = rng.integers(1, 250, size=(16, 12)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    batch = {
        "images": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
        "tokens": tokens,
    }
    state_u = setup_u.state
    for _ in range(3):
        state_u, m_u = setup_u.train_step(
            state_u, shard_batch(batch, mesh_u))
        loss_u = float(m_u["train_loss"])
        state_s, m_s = setup_s.train_step(
            state_s, shard_batch(batch, mesh_u))
        loss_s = float(m_s["train_loss"])
        assert loss_u == pytest.approx(loss_s, rel=1e-5)


@pytest.mark.slow
def test_scan_tp2_train_step_lowers():
    """The TP2-sharded scan train step lowers under the real
    ('data','model') mesh — the same validation flops_audit.py
    --mesh-model performs for ViT-g/bigG; execution is covered
    single-device above and by the rank-pad sharding unit test."""
    setup, mesh = _scan_setup(scan=True, dp=4, tp=2)
    rng = np.random.default_rng(3)
    tokens = rng.integers(1, 250, size=(16, 12)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    batch = {
        "images": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
        "tokens": tokens,
    }
    jitted = getattr(setup.train_step, "_jitted", None)
    assert jitted is not None
    with jax.sharding.set_mesh(mesh):
        lowered = jitted.lower(setup.state, batch)
    assert "scan" in lowered.as_text() or "while" in lowered.as_text()


def test_scan_params_npz_roundtrip(tmp_path):
    """Weights-only npz save/load works on the stacked (scan) tree —
    the layout a big-tower run would checkpoint."""
    from sparsify_clip_tpu.checkpoints import load_weights, save_weights

    model = CLIP(cfg=SCAN_TINY, scan_layers=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 12), jnp.int32), train=False,
    )
    path = save_weights(variables["params"], str(tmp_path / "w.npz"))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
    restored = load_weights(zeros, path)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
