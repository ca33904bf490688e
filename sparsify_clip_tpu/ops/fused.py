"""Backend selection for the fused loss kernels.

Pallas kernels run compiled on TPU; off-TPU (and for
``use_pallas=False``) these dispatchers fall back to the XLA twins in
:mod:`sparsify_clip_tpu.losses`, which are the numerics goldens.  The
Pallas *interpreter* path is exercised by the kernel tests
(``tests/test_pallas_ops.py``), not by this dispatcher — interpreting
the kernels inside every CPU train step would be pure overhead since
the XLA twins are numerics-equal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.losses.contrastive import contrastive_loss
from sparsify_clip_tpu.losses.unif import lunif_loss


@functools.lru_cache()
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def fused_lunif_loss(x: jnp.ndarray, t: float = 2.0, use_pallas: bool = True):
    if use_pallas and _on_tpu():
        from sparsify_clip_tpu.ops.pallas_lunif import lunif_loss_pallas

        return lunif_loss_pallas(x, t)
    return lunif_loss(x, t)


def fused_infonce_loss(
    img: jnp.ndarray, txt: jnp.ndarray, temperature, use_pallas: bool = True
):
    if use_pallas and _on_tpu():
        from sparsify_clip_tpu.ops.pallas_infonce import infonce_loss_pallas

        return infonce_loss_pallas(img, txt, jnp.asarray(temperature, jnp.float32))
    return contrastive_loss(img, txt, temperature)
