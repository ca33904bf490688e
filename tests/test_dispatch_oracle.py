"""Dispatch-chain oracle: execute the reference's OWN if/elif loss
dispatch (sparsify_clip.py:775-938) and assert our trace-time dispatch
produces the same loss for every loss_type × phase.

The chain is extracted from the reference's AST at test time (nothing
copied into the repo) and exec'd with the reference's own loss/schedule
functions on torch tensors; our side runs
:func:`sparsify_clip_tpu.losses.make_loss_fn` on the same embeddings.
This pins the *executed* semantics — including the experiment-7/8 dead
elif, the per-branch warm phase, and the in-branch β/α weighting — not
just the individual loss formulas.
"""

import ast
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sparsify_clip_tpu.losses import LossContext, make_loss_fn
from sparsify_clip_tpu.schedules import get_alpha, get_beta

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)

_REF_FNS = [
    "get_beta", "get_alpha", "contrastive_loss", "lunif_loss",
    "lalign_loss", "compute_centroids_only",
]

# every loss_type string the reference chain tests (SURVEY.md §2.6)
CHAIN_LOSS_TYPES = [
    "anchor",
    "only_lunif_n_then_anchor+lalign+lunif(text)+lunif(img)",
    "only_lunif_n_then_anchor+lalign+lunif(centroids)",
    "only_lunif_n_then_anchor+lalign+BETA*lunif(centroids)",
    "only_lunif_n_then_anchor+ALPHA*lalign+BETA*(lunif(text)+lunif(img))",
    "only_lunif_n_then_anchor+ALPHA*lalign+BETA*lunif(centroids)",
    "ANCHOR(IMAGE,TEXT)+LALIGN(IMAGE,TEXT)+LUNIF(CENTROIDS)",
    "ANCHOR(IMAGE,TEXT)+LALIGN(IMAGE,TEXT)",
    "ANCHOR(IMAGE,TEXT)+LUNIF(CENTROIDS)",
]


def _is_loss_type_compare(test) -> bool:
    if not isinstance(test, ast.Compare):
        return False
    left = test.left
    return (
        isinstance(left, ast.Subscript)
        and isinstance(left.value, ast.Name)
        and left.value.id == "config"
        and isinstance(left.slice, ast.Constant)
        and left.slice.value == "loss_type"
    )


@pytest.fixture(scope="module")
def chain_and_fns():
    src = open(os.path.join(REFERENCE_ROOT, "sparsify_clip.py")).read()
    tree = ast.parse(src)
    fns = [
        node for node in tree.body
        if isinstance(node, ast.FunctionDef) and node.name in _REF_FNS
    ]
    def chain_len(node) -> int:
        n = 0
        while isinstance(node, ast.If) and _is_loss_type_compare(node.test):
            n += 1
            node = node.orelse[0] if len(node.orelse) == 1 else None
        return n

    # several ifs test loss_type (e.g. the anchor-roberta model-loading
    # guard at :711); the dispatch is the longest elif chain
    candidates = [
        node for node in ast.walk(tree)
        if isinstance(node, ast.If) and _is_loss_type_compare(node.test)
    ]
    assert candidates, "loss dispatch chain not found in reference"
    chain = max(candidates, key=chain_len)
    assert chain_len(chain) >= 9
    return chain, fns


def _run_reference_chain(chain, fns, loss_type, epoch, img_t, txt_t):
    namespace = {"torch": torch, "F": F, "np": np, "math": math}
    exec(
        compile(ast.Module(body=fns, type_ignores=[]), "<ref-fns>", "exec"),
        namespace,
    )
    namespace.update({
        "config": {
            "loss_type": loss_type, "only_lunif_epochs": 1,
            "beta_warmup_epoch": 20, "beta_decay_epoch": 50,
            "alpha_warmup_epoch": 50, "alpha_increment_epoch": 50,
        },
        "epoch": epoch,
        "image_embeds": img_t,
        "text_embeds": txt_t,
        "temperature": 0.1,
        "current_batch": 25000,  # mid-run: β and α both non-trivial
        "t_total": 46200,
    })
    exec(
        compile(ast.Module(body=[chain], type_ignores=[]), "<ref-chain>", "exec"),
        namespace,
    )
    assert "loss" in namespace, f"reference chain set no loss for {loss_type!r}"
    return float(namespace["loss"])


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.default_rng(31)
    img = rng.standard_normal((32, 16)).astype(np.float32)
    txt = rng.standard_normal((32, 16)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    return img, txt


@pytest.mark.parametrize("loss_type", CHAIN_LOSS_TYPES)
@pytest.mark.parametrize("epoch", [0, 5], ids=["warm", "main"])
def test_dispatch_matches_reference_chain(chain_and_fns, embeddings,
                                          loss_type, epoch):
    chain, fns = chain_and_fns
    img, txt = embeddings
    want = _run_reference_chain(
        chain, fns, loss_type, epoch,
        torch.from_numpy(img), torch.from_numpy(txt),
    )

    ctx = LossContext(
        temperature=jnp.float32(0.1),
        beta=jnp.float32(get_beta(25000, 46200, 20, 50)),
        alpha=jnp.float32(get_alpha(25000, 46200, 50, 50)),
        # reference warm phase: epoch < only_lunif_epochs (=1), and only
        # for the only_lunif_n_then_* branches — plain/ablation branches
        # have no warm phase in the chain
        warm=jnp.array(
            epoch < 1 and loss_type.startswith("only_lunif_n_then_")
        ),
    )
    got, _ = make_loss_fn(loss_type)(jnp.asarray(img), jnp.asarray(txt), ctx)
    assert float(got) == pytest.approx(want, rel=2e-5), loss_type


def test_dead_elif_is_observable_in_reference(chain_and_fns):
    """The chain tests the exp-7/8 string TWICE; python executes the
    first (per-modality) branch.  Count the duplicate to pin that the
    reference really contains the dead elif our dispatch reproduces."""
    chain, _ = chain_and_fns
    strings = []
    node = chain
    while True:
        strings.append(node.test.comparators[0].value)
        if len(node.orelse) == 1 and isinstance(node.orelse[0], ast.If):
            node = node.orelse[0]
            continue
        break
    dup = "only_lunif_n_then_anchor+lalign+BETA*lunif(centroids)"
    assert strings.count(dup) == 2
    assert set(CHAIN_LOSS_TYPES) <= set(strings)
