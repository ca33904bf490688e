"""Loss dispatch: every live loss_type string, the warm-phase switch,
and the experiment-7/8 dead-elif semantics (SURVEY.md §2.6)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from sparsify_clip_tpu.losses import KNOWN_LOSS_TYPES, LossContext, make_loss_fn

RNG = np.random.default_rng(7)
B, D = 24, 16


def _pair():
    img = RNG.standard_normal((B, D)).astype(np.float32)
    txt = RNG.standard_normal((B, D)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    return img, txt


def _ctx(warm=False, beta=0.7, alpha=1.3, temp=0.1, soft_targets=None,
         logit_scale=None, logit_bias=None):
    return LossContext(
        temperature=jnp.float32(temp),
        beta=jnp.float32(beta),
        alpha=jnp.float32(alpha),
        warm=jnp.array(warm),
        soft_targets=soft_targets,
        logit_scale=logit_scale,
        logit_bias=logit_bias,
    )


def _soft_targets(b=B):
    st = RNG.random((b, b)).astype(np.float32)
    return st / st.sum(axis=1, keepdims=True)


# Torch pipeline goldens -----------------------------------------------------
def t_anchor(i, t, temp=0.1):
    sim = i @ t.T / temp
    lbl = torch.arange(i.shape[0])
    return (TF.cross_entropy(sim, lbl) + TF.cross_entropy(sim.T, lbl)) / 2


def t_lunif(x, t=2.0):
    return torch.pdist(x, p=2).pow(2).mul(-t).exp().mean().log()


def t_lalign(x, y):
    return (x - y).norm(dim=1).pow(2).mean()


def t_cent(i, t):
    return TF.normalize((i + t) / 2, dim=-1)


@pytest.fixture(scope="module")
def pair():
    img, txt = _pair()
    return img, txt, torch.from_numpy(img), torch.from_numpy(txt)


def _run(loss_type, img, txt, **ctx_kw):
    fn = make_loss_fn(loss_type)
    loss, aux = fn(jnp.asarray(img), jnp.asarray(txt), _ctx(**ctx_kw))
    return float(loss), {k: float(v) for k, v in aux.items()}


def test_anchor(pair):
    img, txt, ti, tt = pair
    loss, aux = _run("anchor", img, txt)
    assert loss == pytest.approx(float(t_anchor(ti, tt)), rel=2e-5)
    assert aux["lalign"] == 0.0 and aux["lunif"] == 0.0


def test_exp3_modality_lunif(pair):
    img, txt, ti, tt = pair
    loss, _ = _run("only_lunif_n_then_anchor+lalign+lunif(text)+lunif(img)", img, txt)
    want = t_anchor(ti, tt) + t_lalign(ti, tt) + (t_lunif(ti) + t_lunif(tt)) / 2
    assert loss == pytest.approx(float(want), rel=2e-5)


def test_exp4_centroid_lunif(pair):
    img, txt, ti, tt = pair
    loss, _ = _run("only_lunif_n_then_anchor+lalign+lunif(centroids)", img, txt)
    want = t_anchor(ti, tt) + t_lalign(ti, tt) + t_lunif(t_cent(ti, tt))
    assert loss == pytest.approx(float(want), rel=2e-5)


def test_exp78_dead_elif_executes_per_modality(pair):
    """Experiments 7 AND 8 share the loss_type string; the reference's
    first (per-modality) branch wins (sparsify_clip.py:813-829)."""
    img, txt, ti, tt = pair
    beta = 0.7
    loss, _ = _run(
        "only_lunif_n_then_anchor+lalign+BETA*lunif(centroids)", img, txt, beta=beta
    )
    per_modality = (
        t_anchor(ti, tt) + t_lalign(ti, tt) + beta * (t_lunif(ti) + t_lunif(tt)) / 2
    )
    centroid_variant = (
        t_anchor(ti, tt) + t_lalign(ti, tt) + beta * t_lunif(t_cent(ti, tt))
    )
    assert loss == pytest.approx(float(per_modality), rel=2e-5)
    # and it must NOT be the (unreachable) centroid variant
    assert abs(loss - float(centroid_variant)) > 1e-4

    # The unreachable branch is still available under the __dead__ name.
    dead_loss, _ = _run(
        "__dead__anchor+lalign+BETA*lunif(centroids)", img, txt, beta=beta
    )
    assert dead_loss == pytest.approx(float(centroid_variant), rel=2e-5)


def test_exp9_alpha_beta(pair):
    img, txt, ti, tt = pair
    a, b = 1.3, 0.7
    loss, _ = _run(
        "only_lunif_n_then_anchor+ALPHA*lalign+BETA*(lunif(text)+lunif(img))",
        img, txt, alpha=a, beta=b,
    )
    want = t_anchor(ti, tt) + a * t_lalign(ti, tt) + b * (t_lunif(ti) + t_lunif(tt)) / 2
    assert loss == pytest.approx(float(want), rel=2e-5)


def test_exp10_alpha_beta_centroids(pair):
    img, txt, ti, tt = pair
    a, b = 1.3, 0.7
    loss, _ = _run(
        "only_lunif_n_then_anchor+ALPHA*lalign+BETA*lunif(centroids)",
        img, txt, alpha=a, beta=b,
    )
    want = t_anchor(ti, tt) + a * t_lalign(ti, tt) + b * t_lunif(t_cent(ti, tt))
    assert loss == pytest.approx(float(want), rel=2e-5)


@pytest.mark.parametrize(
    "loss_type,has_lunif,has_lalign",
    [
        ("ANCHOR(IMAGE,TEXT)+LALIGN(IMAGE,TEXT)+LUNIF(CENTROIDS)", True, True),
        ("ANCHOR(IMAGE,TEXT)+LALIGN(IMAGE,TEXT)", False, True),
        ("ANCHOR(IMAGE,TEXT)+LUNIF(CENTROIDS)", True, False),
    ],
)
def test_ablations(pair, loss_type, has_lunif, has_lalign):
    img, txt, ti, tt = pair
    loss, aux = _run(loss_type, img, txt)
    want = t_anchor(ti, tt)
    if has_lalign:
        want = want + t_lalign(ti, tt)
    if has_lunif:
        want = want + t_lunif(t_cent(ti, tt))
    assert loss == pytest.approx(float(want), rel=2e-5)


def test_warm_phase_switch(pair):
    img, txt, ti, tt = pair
    warm_want = float((t_lunif(ti) + t_lunif(tt)) / 2)
    for loss_type in [
        "only_lunif_n_then_anchor+lalign+lunif(centroids)",
        "only_lunif_n_then_anchor+lalign+BETA*lunif(centroids)",
    ]:
        warm_loss, aux = _run(loss_type, img, txt, warm=True)
        assert warm_loss == pytest.approx(warm_want, rel=2e-5)
        assert aux["anchor"] == 0.0
        main_loss, _ = _run(loss_type, img, txt, warm=False)
        assert main_loss != pytest.approx(warm_loss, rel=1e-3)


def test_anchor_roberta_matches_torch_soft_ce(pair):
    img, txt, ti, tt = pair
    st = _soft_targets()
    loss, aux = _run(
        "anchor-roberta", img, txt, soft_targets=jnp.asarray(st)
    )
    sim = ti @ tt.T / 0.1
    tst = torch.from_numpy(st)
    golden = (TF.cross_entropy(sim, tst) + TF.cross_entropy(sim.T, tst.T)) / 2
    assert loss == pytest.approx(float(golden), rel=1e-5)
    assert aux["anchor"] == pytest.approx(loss)


def test_anchor_roberta_requires_soft_targets(pair):
    img, txt, _, _ = pair
    fn = make_loss_fn("anchor-roberta")
    with pytest.raises(ValueError, match="soft_targets"):
        fn(jnp.asarray(img), jnp.asarray(txt), _ctx())


def test_every_live_loss_type_runs(pair):
    img, txt, _, _ = pair
    for loss_type in KNOWN_LOSS_TYPES:
        kw = {}
        if loss_type == "anchor-roberta":
            kw = {"soft_targets": jnp.asarray(_soft_targets())}
        elif loss_type == "siglip":
            kw = {
                "logit_scale": jnp.float32(10.0),
                "logit_bias": jnp.float32(-10.0),
            }
        loss, aux = _run(loss_type, img, txt, **kw)
        assert np.isfinite(loss)
        assert set(aux) >= {"anchor", "lalign", "lunif"}


def test_unknown_loss_type_raises():
    with pytest.raises(ValueError):
        make_loss_fn("not-a-loss")
