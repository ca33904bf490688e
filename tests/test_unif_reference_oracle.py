"""Direct oracle test: our W₂ uniformity family vs the reference's own
``uniformity.py`` module (imported from the read-only checkout and run
on torch CPU).  Skipped when the reference isn't mounted."""

import importlib.util
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sparsify_clip_tpu.metrics.unif_w2 import (
    eval_uniformity,
    unif_w2_abs_eig,
    unif_w2_eig_real,
    unif_w2_joint,
    unif_w2_single_svd,
)

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def ref():
    path = os.path.join(REFERENCE_ROOT, "uniformity.py")
    spec = importlib.util.spec_from_file_location("reference_uniformity", path)
    module = importlib.util.module_from_spec(spec)
    sys.modules["reference_uniformity"] = module
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(17)
    x = rng.standard_normal((96, 32)).astype(np.float32)
    y = rng.standard_normal((96, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y /= np.linalg.norm(y, axis=1, keepdims=True)
    return x, y


def test_numpy_uniformity_oracle(ref, data):
    x, y = data
    want = float(ref.numpy_uniformity(torch.from_numpy(x), torch.from_numpy(y)))
    got = float(eval_uniformity(jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(want, rel=1e-4)


def test_torch_uniformity_joint_oracle(ref, data):
    x, y = data
    want = float(ref.torch_uniformity(torch.from_numpy(x), torch.from_numpy(y)))
    got = float(unif_w2_joint(jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(want, rel=1e-4)


def test_torch_uniformity1_oracle(ref, data):
    x, _ = data
    want = float(ref.torch_uniformity1(torch.from_numpy(x)))
    got = float(unif_w2_single_svd(jnp.asarray(x)))
    assert got == pytest.approx(want, rel=1e-4)


def test_torch_uniformity_equivalent_oracle(ref, data):
    x, _ = data
    want = float(ref.torch_uniformity_equivalent(torch.from_numpy(x)))
    got = float(unif_w2_eig_real(jnp.asarray(x)))
    assert got == pytest.approx(want, rel=1e-4)


def test_uniformity10_oracle(ref, data):
    x, _ = data
    want = float(ref.uniformity10(torch.from_numpy(x)))
    got = float(unif_w2_abs_eig(jnp.asarray(x)))
    assert got == pytest.approx(want, rel=1e-4)
