"""Pallas kernels vs their XLA twins (values + gradients).

On CPU the kernels run under the TPU interpreter
(``pltpu.force_tpu_interpret_mode``) so the exact kernel code path is
exercised; on real TPU the same asserts run compiled (see the verify
skill / bench).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sparsify_clip_tpu.losses.contrastive import contrastive_loss
from sparsify_clip_tpu.losses.unif import lunif_loss
from sparsify_clip_tpu.ops.pallas_infonce import infonce_loss_pallas
from sparsify_clip_tpu.ops.pallas_lunif import lunif_loss_pallas

RNG = np.random.default_rng(11)


def _embeds(n, d):
    x = RNG.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))


@pytest.mark.parametrize("n,d", [(128, 128), (256, 128), (200, 128)])
def test_lunif_forward_matches_xla(n, d):
    x = _embeds(n, d)
    want = float(lunif_loss(x))
    with pltpu.force_tpu_interpret_mode():
        got = float(lunif_loss_pallas(x))
    assert got == pytest.approx(want, rel=1e-5)


def test_lunif_grad_matches_xla():
    x = _embeds(128, 128)
    want = jax.grad(lambda v: lunif_loss(v))(x)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda v: lunif_loss_pallas(v))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n,d", [(128, 128), (256, 128), (200, 128)])
def test_infonce_forward_matches_xla(n, d):
    img, txt = _embeds(n, d), _embeds(n, d)
    want = float(contrastive_loss(img, txt, 0.1))
    with pltpu.force_tpu_interpret_mode():
        got = float(infonce_loss_pallas(img, txt, jnp.float32(0.1)))
    assert got == pytest.approx(want, rel=1e-5)


def test_infonce_grads_match_xla():
    img, txt = _embeds(128, 128), _embeds(128, 128)
    t = jnp.float32(0.1)

    def xla(i, x, tt):
        return contrastive_loss(i, x, tt)

    gi_w, gt_w, gT_w = jax.grad(xla, argnums=(0, 1, 2))(img, txt, t)
    with pltpu.force_tpu_interpret_mode():
        gi, gt, gT = jax.grad(
            lambda i, x, tt: infonce_loss_pallas(i, x, tt), argnums=(0, 1, 2)
        )(img, txt, t)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_w), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_w), rtol=1e-4, atol=1e-6)
    assert float(gT) == pytest.approx(float(gT_w), rel=1e-4)


def test_infonce_learnable_temperature_path():
    img, txt = _embeds(128, 128), _embeds(128, 128)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda tt: infonce_loss_pallas(img, txt, tt))(jnp.float32(0.1))
    want = jax.grad(lambda tt: contrastive_loss(img, txt, tt))(jnp.float32(0.1))
    assert float(g) == pytest.approx(float(want), rel=1e-4)


def test_fused_dispatchers_multidevice_mesh_match_xla():
    """Multi-chip routing of the fused losses: with dp > 1 ops.fused
    routes to the ring-chunked distributed formulations
    (parallel/dist_losses) inside a full-mesh shard_map — embeddings
    stay sharded over 'data', chunks travel the ppermute ring, nothing
    is gathered or replicated.  Values and grads (through the
    shard_map TRANSPOSE — the jit-level path the train step uses, which
    caught the check_vma=False 1/dp cotangent scaling) must equal the
    XLA twins on the 4x2 fake mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparsify_clip_tpu.ops.fused import (
        force_pallas_losses,
        fused_infonce_loss,
        fused_lunif_loss,
    )
    from sparsify_clip_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=4, model=2)
    img, txt = _embeds(16, 128), _embeds(16, 128)
    want_nce = float(contrastive_loss(img, txt, 0.1))
    want_unif = float(lunif_loss(img))
    g_want = np.asarray(
        jax.grad(lambda v: contrastive_loss(v, txt, 0.1))(img)
    )

    with jax.sharding.set_mesh(mesh):
        img_s = jax.device_put(img, NamedSharding(mesh, P("data")))
        txt_s = jax.device_put(txt, NamedSharding(mesh, P("data")))
        with force_pallas_losses(), pltpu.force_tpu_interpret_mode():
            got_nce = float(jax.jit(
                lambda a, b: fused_infonce_loss(a, b, 0.1)
            )(img_s, txt_s))
            got_unif = float(jax.jit(fused_lunif_loss)(img_s))
            g_got = np.asarray(jax.jit(jax.grad(
                lambda a, b: fused_infonce_loss(a, b, 0.1)
            ))(img_s, txt_s))

    assert got_nce == pytest.approx(want_nce, rel=1e-5)
    assert got_unif == pytest.approx(want_unif, rel=1e-5)
    np.testing.assert_allclose(g_got, g_want, rtol=1e-4, atol=1e-6)


def test_fused_dp_losses_never_gather_or_replicate():
    """VERDICT r4 #1 done-criterion: the dp>1 fused loss step must not
    all-gather the (N, D) embeddings to replicated nor run a replicated
    N² block.  Assert on the lowered HLO: the value-and-grad program of
    the fused InfoNCE + lunif pair contains the ring's
    collective-permutes and NO all-gather (the embeddings enter
    data-sharded, so any all-gather could only be the old
    gather-then-replicate layout)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparsify_clip_tpu.ops.fused import (
        force_pallas_losses,
        fused_infonce_loss,
        fused_lunif_loss,
    )
    from sparsify_clip_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=4, model=2)
    img, txt = _embeds(16, 128), _embeds(16, 128)

    def total(i, t):
        return fused_infonce_loss(i, t, 0.1) + fused_lunif_loss(i)

    with jax.sharding.set_mesh(mesh):
        img_s = jax.device_put(img, NamedSharding(mesh, P("data")))
        txt_s = jax.device_put(txt, NamedSharding(mesh, P("data")))
        with force_pallas_losses():
            text = jax.jit(
                jax.value_and_grad(total, argnums=(0, 1))
            ).lower(img_s, txt_s).as_text()
    assert "collective_permute" in text or "collective-permute" in text, (
        "dp>1 fused losses lost the ppermute ring"
    )
    for gather in ("all_gather", "all-gather"):
        assert gather not in text, (
            "dp>1 fused loss path re-introduced an embedding all-gather "
            "(gather-then-replicate layout)"
        )


def test_fused_infonce_temperature_grad_on_mesh():
    """Gradient w.r.t. the REPLICATED learnable-temperature scalar must
    flow exactly through the multi-device kernel wrapper's
    check_vma=False shard_map (the classic check_rep transpose footgun
    — verified empirically in review, pinned here)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparsify_clip_tpu.ops.fused import force_pallas_losses, fused_infonce_loss
    from sparsify_clip_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=4, model=2)
    img, txt = _embeds(16, 128), _embeds(16, 128)
    t0 = jnp.float32(0.1)
    want = float(jax.grad(
        lambda t: contrastive_loss(img, txt, t)
    )(t0))

    with jax.sharding.set_mesh(mesh):
        img_s = jax.device_put(img, NamedSharding(mesh, P("data")))
        txt_s = jax.device_put(txt, NamedSharding(mesh, P("data")))
        with force_pallas_losses(), pltpu.force_tpu_interpret_mode():
            got = float(jax.jit(jax.grad(
                lambda t: fused_infonce_loss(img_s, txt_s, t)
            ))(t0))
    assert got == pytest.approx(want, rel=1e-4)
