"""Oracle tests against the reference's OWN function definitions.

The reference script cannot be imported wholesale (its module body
pulls wandb/open_clip/umap), so the individual pure functions under
test are extracted by name from its AST and exec'd with only their real
dependencies (torch/F/np/math).  Nothing from the reference is copied
into this repo — it is read from the mounted checkout at test time as
a golden oracle.  Skipped when the checkout isn't mounted.
"""

import ast
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sparsify_clip_tpu import eval as eval_mod
from sparsify_clip_tpu.losses import (
    centroid_alignment_loss,
    compute_centroids_only,
    contrastive_loss,
    lalign_loss,
    lunif_loss,
    sparsify_loss,
)
from sparsify_clip_tpu.metrics.unif_w2 import eval_uniformity
from sparsify_clip_tpu.schedules import get_alpha, get_beta

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)

_WANTED = [
    "get_beta", "get_alpha", "contrastive_loss", "lunif_loss",
    "sparsify_loss", "lalign_loss", "compute_centroids_only",
    "centroid_alignment_loss", "compute_gap",
    "compute_mean_angular_value_of_a_modality", "uniformity",
    "mean_distance_of_true_pairs",
]


@pytest.fixture(scope="module")
def ref():
    src = open(os.path.join(REFERENCE_ROOT, "sparsify_clip.py")).read()
    tree = ast.parse(src)
    selected = [
        node for node in tree.body
        if isinstance(node, ast.FunctionDef) and node.name in _WANTED
    ]
    module = ast.Module(body=selected, type_ignores=[])
    import math

    namespace = {"torch": torch, "F": F, "np": np, "math": math}
    exec(compile(module, "<reference-oracle>", "exec"), namespace)
    return namespace


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(23)
    img = rng.standard_normal((48, 24)).astype(np.float32)
    txt = rng.standard_normal((48, 24)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    return img, txt


def test_schedules_oracle(ref):
    total = 46200
    for step in [0, 1, 461, 462, 9239, 9240, 23100, 32340, 46199]:
        assert get_beta(step, total, 20, 50) == ref["get_beta"](step, total, 20, 50)
        assert get_alpha(step, total, 50, 50) == ref["get_alpha"](step, total, 50, 50)


def test_contrastive_oracle(ref, data):
    img, txt = data
    want = float(ref["contrastive_loss"](
        torch.from_numpy(img), torch.from_numpy(txt), temperature=0.1
    ))
    got = float(contrastive_loss(jnp.asarray(img), jnp.asarray(txt), 0.1))
    assert got == pytest.approx(want, rel=2e-5)


def test_lunif_oracle(ref, data):
    img, _ = data
    want = float(ref["lunif_loss"](torch.from_numpy(img)))
    got = float(lunif_loss(jnp.asarray(img)))
    assert got == pytest.approx(want, rel=2e-5)


def test_lalign_oracle(ref, data):
    img, txt = data
    want = float(ref["lalign_loss"](torch.from_numpy(img), torch.from_numpy(txt)))
    got = float(lalign_loss(jnp.asarray(img), jnp.asarray(txt)))
    assert got == pytest.approx(want, rel=2e-5)


def test_sparsify_oracle(ref, data):
    img, _ = data
    want = float(ref["sparsify_loss"](torch.from_numpy(img)))
    got = float(sparsify_loss(jnp.asarray(img)))
    assert got == pytest.approx(want, rel=2e-5)


def test_centroids_oracle(ref, data):
    img, txt = data
    want = ref["compute_centroids_only"](
        torch.from_numpy(txt), torch.from_numpy(img)
    ).numpy()
    got = np.asarray(compute_centroids_only(jnp.asarray(txt), jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_centroid_alignment_oracle(ref, data):
    img, txt = data
    want = float(ref["centroid_alignment_loss"](
        torch.from_numpy(img), torch.from_numpy(txt)
    ))
    got = float(centroid_alignment_loss(jnp.asarray(img), jnp.asarray(txt)))
    assert got == pytest.approx(want, rel=1e-5)


def test_eval_metric_oracles(ref, data):
    img, txt = data
    ti, tt = torch.from_numpy(img), torch.from_numpy(txt)
    assert float(eval_mod.compute_gap(jnp.asarray(img), jnp.asarray(txt))) == \
        pytest.approx(float(ref["compute_gap"](ti, tt)), rel=1e-5)
    assert float(eval_mod.mean_angular_value(jnp.asarray(img))) == pytest.approx(
        float(ref["compute_mean_angular_value_of_a_modality"](ti)), rel=1e-4
    )
    assert float(eval_mod.mean_true_pair_cosine(jnp.asarray(img), jnp.asarray(txt))) \
        == pytest.approx(float(ref["mean_distance_of_true_pairs"](ti, tt)), rel=1e-4)
    assert float(eval_uniformity(jnp.asarray(img), jnp.asarray(txt))) == \
        pytest.approx(float(ref["uniformity"](ti, tt)), rel=1e-4)


def test_retrieval_ranks_oracle(data):
    """compute_metric_ret needs tensors+lists; replicate its exact call
    signature with our eval on the same random scores."""
    src = open(os.path.join(REFERENCE_ROOT, "sparsify_clip.py")).read()
    tree = ast.parse(src)
    node = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "compute_metric_ret"
    )
    from typing import Dict, List
    namespace = {"torch": torch, "List": List, "Dict": Dict}
    exec(compile(ast.Module(body=[node], type_ignores=[]), "<o>", "exec"), namespace)
    ref_ret = namespace["compute_metric_ret"]

    img, txt = data
    sim = torch.from_numpy(txt @ img.T)
    ids = list(range(sim.shape[0]))
    want_f = ref_ret(sim, ids, ids, direction="forward")
    want_b = ref_ret(sim, ids, ids, direction="backward")

    metrics = eval_mod.compute_all_metrics(
        jnp.asarray(img) * 3.0, jnp.asarray(txt) * 3.0
    )  # unnormalized inputs; compute_all_metrics normalizes like the reference
    for key, value in {**want_f, **want_b}.items():
        assert metrics[key] == pytest.approx(value, abs=1e-3), key
