"""shard_map explicit-collective losses == global-view losses,
on the 8-fake-device CPU mesh (incl. self-pair exclusion at global batch)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from sparsify_clip_tpu.losses.contrastive import contrastive_loss
from sparsify_clip_tpu.losses.align import lalign_loss
from sparsify_clip_tpu.losses.unif import lunif_loss
from sparsify_clip_tpu.losses.centroids import normalized_centroids
from sparsify_clip_tpu.parallel.mesh import create_mesh
from sparsify_clip_tpu.parallel.dist_losses import (
    global_contrastive_loss,
    global_lalign_loss,
    global_lunif_loss,
    global_normalized_centroids,
    ring_infonce_loss,
    ring_lunif_loss,
)

RNG = np.random.default_rng(5)
N, D = 64, 32  # 8 per device on the 8-device mesh


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(data=8, model=1)


def _pair():
    img = RNG.standard_normal((N, D)).astype(np.float32)
    txt = RNG.standard_normal((N, D)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    return jnp.asarray(img), jnp.asarray(txt)


def _smap(mesh, fn, n_in=2):
    spec = P("data")
    return jax.jit(
        shard_map(
            fn, mesh=mesh,
            in_specs=tuple([spec] * n_in),
            out_specs=P(),  # scalar, replicated
        )
    )


def test_global_contrastive_matches(mesh):
    img, txt = _pair()
    want = float(contrastive_loss(img, txt, 0.1))
    fn = _smap(mesh, lambda i, t: global_contrastive_loss(i, t, 0.1))
    got = float(fn(img, txt))
    assert got == pytest.approx(want, rel=1e-5)


def test_global_lunif_matches(mesh):
    img, _ = _pair()
    want = float(lunif_loss(img))
    fn = _smap(mesh, lambda x: global_lunif_loss(x), n_in=1)
    got = float(fn(img))
    assert got == pytest.approx(want, rel=1e-5)


def test_global_lalign_matches(mesh):
    img, txt = _pair()
    want = float(lalign_loss(img, txt))
    fn = _smap(mesh, global_lalign_loss)
    got = float(fn(img, txt))
    assert got == pytest.approx(want, rel=1e-5)


def test_global_centroid_lunif_matches(mesh):
    """The exp-6 centroid-uniformity term end to end: local centroids →
    global condensed-pdist LME."""
    img, txt = _pair()
    want = float(lunif_loss(normalized_centroids(img, txt)))

    def sharded(i, t):
        return global_lunif_loss(global_normalized_centroids(i, t))

    got = float(_smap(mesh, sharded)(img, txt))
    assert got == pytest.approx(want, rel=1e-5)


def test_ring_infonce_matches(mesh):
    """Ring-chunked InfoNCE == single-device contrastive_loss (the ring
    never gathers the (N, D) matrices; accumulation order differs)."""
    img, txt = _pair()
    want = float(contrastive_loss(img, txt, 0.1))
    fn = _smap(mesh, lambda i, t: ring_infonce_loss(i, t, 0.1))
    got = float(fn(img, txt))
    assert got == pytest.approx(want, rel=1e-5)


def test_ring_infonce_embedding_grads_match(mesh):
    """Custom-VJP ring backward (recompute + traveling dtxt) == autodiff
    of the global formulation, per-shard grads reassembled."""
    img, txt = _pair()
    want_i, want_t = jax.grad(
        lambda i, t: contrastive_loss(i, t, 0.1), argnums=(0, 1)
    )(img, txt)
    spec = P("data")
    grad_fn = jax.jit(
        shard_map(
            jax.grad(
                lambda i, t: ring_infonce_loss(i, t, 0.1), argnums=(0, 1)
            ),
            mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
        )
    )
    got_i, got_t = grad_fn(img, txt)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), rtol=1e-4, atol=1e-6)


def test_ring_infonce_temperature_grad_matches(mesh):
    """The learnable raw-divisor temperature's grad must arrive complete
    (psum'd) and replicated on every device."""
    img, txt = _pair()
    t0 = jnp.float32(0.1)
    want = float(jax.grad(lambda T: contrastive_loss(img, txt, T))(t0))
    spec = P("data")
    grad_fn = jax.jit(
        shard_map(
            lambda i, t, T: jax.grad(
                lambda TT: ring_infonce_loss(i, t, TT)
            )(T),
            mesh=mesh, in_specs=(spec, spec, P()), out_specs=P(),
        )
    )
    got = float(grad_fn(img, txt, t0))
    assert got == pytest.approx(want, rel=1e-4)


def test_ring_lunif_matches(mesh):
    img, _ = _pair()
    want = float(lunif_loss(img))
    fn = _smap(mesh, lambda x: ring_lunif_loss(x), n_in=1)
    got = float(fn(img))
    assert got == pytest.approx(want, rel=1e-5)


def test_ring_lunif_grads_match(mesh):
    img, _ = _pair()
    want = jax.grad(lunif_loss)(img)
    spec = P("data")
    grad_fn = jax.jit(
        shard_map(
            jax.grad(lambda x: ring_lunif_loss(x)),
            mesh=mesh, in_specs=(spec,), out_specs=spec,
        )
    )
    got = grad_fn(img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)


def test_ring_lunif_centroids_matches(mesh):
    """Exp-6 composition: local centroids → ring uniformity."""
    img, txt = _pair()
    want = float(lunif_loss(normalized_centroids(img, txt)))

    def sharded(i, t):
        return ring_lunif_loss(global_normalized_centroids(i, t))

    got = float(_smap(mesh, sharded)(img, txt))
    assert got == pytest.approx(want, rel=1e-5)


def test_gradients_match(mesh):
    """Grad through the explicit-collective path == grad through the
    global path (per-shard grads reassembled)."""
    img, txt = _pair()

    def global_total(i, t):
        return contrastive_loss(i, t, 0.1) + lunif_loss(i) + lalign_loss(i, t)

    want = jax.grad(global_total)(img, txt)

    def shard_total(i, t):
        return (
            global_contrastive_loss(i, t, 0.1)
            + global_lunif_loss(i)
            + global_lalign_loss(i, t)
        )

    spec = P("data")
    grad_fn = jax.jit(
        shard_map(
            jax.grad(shard_total), mesh=mesh,
            in_specs=(spec, spec), out_specs=spec,
        )
    )
    got = grad_fn(img, txt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)
