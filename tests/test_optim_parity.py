"""Optimizer-chain parity vs PyTorch: identical linear two-tower model,
identical init and batches, anchor(+lalign+lunif) losses, AdamW — the
per-step losses must track torch to fp32 tolerance for several steps.

This pins the full differentiation + AdamW(wd=0.01 on everything) +
schedule chain against the reference's exact optimizer semantics
(sparsify_clip.py:730), independent of tower architecture details.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from sparsify_clip_tpu.losses import LossContext, make_loss_fn
from sparsify_clip_tpu.utils.numerics import l2_normalize

B, D_IN, D_EMB = 16, 12, 8
LR, STEPS = 1e-2, 5


def _data():
    rng = np.random.default_rng(0)
    w_img = rng.standard_normal((D_IN, D_EMB)).astype(np.float32) * 0.3
    w_txt = rng.standard_normal((D_IN, D_EMB)).astype(np.float32) * 0.3
    x_img = rng.standard_normal((STEPS, B, D_IN)).astype(np.float32)
    x_txt = rng.standard_normal((STEPS, B, D_IN)).astype(np.float32)
    return w_img, w_txt, x_img, x_txt


def torch_losses(loss_kind, w_img, w_txt, x_img, x_txt):
    li = torch.nn.Linear(D_IN, D_EMB, bias=False)
    lt = torch.nn.Linear(D_IN, D_EMB, bias=False)
    with torch.no_grad():
        li.weight.copy_(torch.from_numpy(w_img.T))
        lt.weight.copy_(torch.from_numpy(w_txt.T))
    opt = torch.optim.AdamW(
        list(li.parameters()) + list(lt.parameters()), lr=LR
    )  # torch default wd=0.01, betas (0.9,0.999), eps 1e-8
    out = []
    for s in range(STEPS):
        img = li(torch.from_numpy(x_img[s]))
        txt = lt(torch.from_numpy(x_txt[s]))
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        sim = img @ txt.T / 0.1
        lbl = torch.arange(B)
        loss = (
            torch.nn.functional.cross_entropy(sim, lbl)
            + torch.nn.functional.cross_entropy(sim.T, lbl)
        ) / 2
        if loss_kind == "full":
            loss = loss + (img - txt).norm(dim=1).pow(2).mean()
            cent = torch.nn.functional.normalize((img + txt) / 2, dim=-1)
            loss = loss + torch.pdist(cent, p=2).pow(2).mul(-2).exp().mean().log()
        out.append(float(loss))
        opt.zero_grad()
        loss.backward()
        opt.step()
    return out


def jax_losses(loss_kind, w_img, w_txt, x_img, x_txt):
    loss_type = (
        "anchor" if loss_kind == "anchor"
        else "ANCHOR(IMAGE,TEXT)+LALIGN(IMAGE,TEXT)+LUNIF(CENTROIDS)"
    )
    loss_core = make_loss_fn(loss_type)
    ctx = LossContext(
        temperature=jnp.float32(0.1), beta=jnp.float32(0.0),
        alpha=jnp.float32(0.0), warm=jnp.array(False),
    )

    def loss_of(params, xi, xt):
        img = l2_normalize(xi @ params["wi"])
        txt = l2_normalize(xt @ params["wt"])
        loss, _ = loss_core(img, txt, ctx)
        return loss

    params = {"wi": jnp.asarray(w_img), "wt": jnp.asarray(w_txt)}
    opt = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    opt_state = opt.init(params)
    step = jax.jit(
        lambda p, s, xi, xt: _step(p, s, xi, xt)
    )

    def _step(p, s, xi, xt):
        loss, grads = jax.value_and_grad(loss_of)(p, xi, xt)
        updates, s = opt.update(grads, s, p)
        return loss, optax.apply_updates(p, updates), s

    out = []
    for i in range(STEPS):
        loss, params, opt_state = step(
            params, opt_state, jnp.asarray(x_img[i]), jnp.asarray(x_txt[i])
        )
        out.append(float(loss))
    return out


@pytest.mark.parametrize("loss_kind", ["anchor", "full"])
def test_adamw_chain_tracks_torch(loss_kind):
    data = _data()
    want = torch_losses(loss_kind, *data)
    got = jax_losses(loss_kind, *data)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
