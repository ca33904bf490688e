"""Loss numerics vs independently-written PyTorch goldens.

Each golden below is a fresh transcription of the published formulas
(InfoNCE, Wang–Isola alignment/uniformity, centroid midpoints) computed
with torch ops, used only to cross-check the JAX implementations to
fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from sparsify_clip_tpu.losses import (
    LossContext,
    centroid_alignment_loss,
    compute_centroids,
    compute_centroids_only,
    contrastive_loss,
    contrastive_loss_roberta,
    lalign_loss,
    lunif_loss,
    make_loss_fn,
    sparsify_loss,
)
from sparsify_clip_tpu.losses.centroids import normalized_centroids

RNG = np.random.default_rng(42)


def _normalized_pair(b=32, d=64):
    img = RNG.standard_normal((b, d)).astype(np.float32)
    txt = RNG.standard_normal((b, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    return img, txt


# ---------------------------------------------------------------- goldens
def golden_infonce(img: torch.Tensor, txt: torch.Tensor, temp: float) -> float:
    sim = img @ txt.T / temp
    labels = torch.arange(img.shape[0])
    return float((TF.cross_entropy(sim, labels) + TF.cross_entropy(sim.T, labels)) / 2)


def golden_lunif(x: torch.Tensor, t: float = 2.0) -> float:
    d2 = torch.pdist(x, p=2).pow(2)
    return float(d2.mul(-t).exp().mean().log())


def golden_lalign(x: torch.Tensor, y: torch.Tensor, alpha: float = 2.0) -> float:
    return float((x - y).norm(dim=1).pow(alpha).mean())


def golden_sparsify(x: torch.Tensor) -> float:
    gram = x @ x.T
    tgt = torch.full_like(gram, -1.0)
    tgt.fill_diagonal_(1.0)
    return float(TF.mse_loss(gram, tgt))


# ------------------------------------------------------------------ tests
def test_contrastive_loss_matches_torch():
    img, txt = _normalized_pair()
    want = golden_infonce(torch.from_numpy(img), torch.from_numpy(txt), 0.1)
    got = float(contrastive_loss(jnp.asarray(img), jnp.asarray(txt), 0.1))
    assert got == pytest.approx(want, rel=2e-5)


def test_contrastive_loss_temperature_sensitivity():
    img, txt = _normalized_pair()
    for temp in (0.05, 0.1, 1.0):
        want = golden_infonce(torch.from_numpy(img), torch.from_numpy(txt), temp)
        got = float(contrastive_loss(jnp.asarray(img), jnp.asarray(txt), temp))
        assert got == pytest.approx(want, rel=2e-5)


def test_contrastive_roberta_soft_targets():
    img, txt = _normalized_pair(16, 32)
    soft = RNG.random((16, 16)).astype(np.float32)
    soft /= soft.sum(axis=1, keepdims=True)
    ti, tt, ts = map(torch.from_numpy, (img, txt, soft))
    sim = ti @ tt.T / 0.1
    want = float((TF.cross_entropy(sim, ts) + TF.cross_entropy(sim.T, ts.T)) / 2)
    got = float(
        contrastive_loss_roberta(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(soft), 0.1)
    )
    assert got == pytest.approx(want, rel=2e-5)


def test_lunif_matches_torch_pdist():
    img, _ = _normalized_pair(48, 24)
    want = golden_lunif(torch.from_numpy(img))
    got = float(lunif_loss(jnp.asarray(img)))
    assert got == pytest.approx(want, rel=2e-5)


def test_lunif_unnormalized_input():
    # torch.pdist does not assume unit norm; neither must we.
    x = RNG.standard_normal((20, 8)).astype(np.float32) * 3.0
    want = golden_lunif(torch.from_numpy(x))
    got = float(lunif_loss(jnp.asarray(x)))
    assert got == pytest.approx(want, rel=1e-4)


def test_lunif_self_pair_exclusion():
    # With 2 points the condensed pdist has exactly 1 pair; a naive
    # full-matrix mean (including diagonal) would differ.
    x = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    want = golden_lunif(torch.from_numpy(x))
    got = float(lunif_loss(jnp.asarray(x)))
    assert got == pytest.approx(want, rel=1e-6)


def test_lalign_matches_torch():
    img, txt = _normalized_pair()
    want = golden_lalign(torch.from_numpy(img), torch.from_numpy(txt))
    got = float(lalign_loss(jnp.asarray(img), jnp.asarray(txt)))
    assert got == pytest.approx(want, rel=2e-5)


def test_sparsify_matches_torch():
    img, _ = _normalized_pair(16, 8)
    want = golden_sparsify(torch.from_numpy(img))
    got = float(sparsify_loss(jnp.asarray(img)))
    assert got == pytest.approx(want, rel=2e-5)


def test_centroids_only():
    img, txt = _normalized_pair(8, 4)
    got = np.asarray(compute_centroids_only(jnp.asarray(txt), jnp.asarray(img)))
    np.testing.assert_allclose(got, (img + txt) / 2, rtol=1e-6)


def test_centroids_pairwise():
    img, txt = _normalized_pair(5, 4)
    norms, cents = compute_centroids(jnp.asarray(txt), jnp.asarray(img))
    want = (txt[:, None, :] + img[None, :, :]) / 2
    np.testing.assert_allclose(np.asarray(cents), want, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(norms), np.linalg.norm(want, axis=-1), rtol=1e-5
    )


def test_normalized_centroids_matches_torch_f_normalize():
    img, txt = _normalized_pair(16, 8)
    want = TF.normalize((torch.from_numpy(img) + torch.from_numpy(txt)) / 2, dim=-1)
    got = np.asarray(normalized_centroids(jnp.asarray(img), jnp.asarray(txt)))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)


def test_centroid_alignment():
    img, txt = _normalized_pair(16, 8)
    want = float(
        torch.norm(torch.from_numpy(img).mean(0) - torch.from_numpy(txt).mean(0))
    )
    got = float(centroid_alignment_loss(jnp.asarray(img), jnp.asarray(txt)))
    assert got == pytest.approx(want, rel=1e-5)


def test_losses_differentiable():
    img, txt = _normalized_pair(16, 8)

    def total(i, t):
        ctx = LossContext(
            temperature=jnp.float32(0.1),
            beta=jnp.float32(1.0),
            alpha=jnp.float32(1.0),
            warm=jnp.array(False),
        )
        fn = make_loss_fn("only_lunif_n_then_anchor+lalign+lunif(centroids)")
        loss, _ = fn(i, t, ctx)
        return loss

    gi, gt = jax.grad(total, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(txt))
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gt)).all()
    assert float(jnp.abs(gi).sum()) > 0


def test_masked_diagonal_matches_jnp_diagonal():
    """masked_diagonal is the deadlock-safe jnp.diagonal twin used by the
    CE loss (utils.numerics docstring has the full story): values and
    gradients must match jnp.diagonal exactly — it is pure selection."""
    from sparsify_clip_tpu.utils.numerics import masked_diagonal, masked_trace

    m = jnp.asarray(RNG.standard_normal((24, 24)).astype(np.float32))
    np.testing.assert_array_equal(masked_diagonal(m), jnp.diagonal(m))
    np.testing.assert_array_equal(
        jax.grad(lambda x: jnp.sum(masked_diagonal(x) ** 2))(m),
        jax.grad(lambda x: jnp.sum(jnp.diagonal(x) ** 2))(m),
    )
    np.testing.assert_allclose(masked_trace(m), jnp.trace(m), rtol=1e-6)
    with pytest.raises(ValueError):
        masked_diagonal(jnp.zeros((3, 4)))
