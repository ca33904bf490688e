"""Backend selection for the fused loss kernels.

Pallas kernels run compiled on TPU; on CPU (tests, debugging) they run
through the Pallas interpreter so the same code path is exercised
everywhere.  The XLA twins in :mod:`sparsify_clip_tpu.losses` remain
the numerics goldens and the fallback for ``use_pallas=False``.
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
