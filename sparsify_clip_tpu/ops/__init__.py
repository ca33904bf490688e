"""Pallas TPU kernels for the hot loss-block paths + device-side image ops.

Every kernel has an XLA-path twin in :mod:`sparsify_clip_tpu.losses`
that serves as its numerics golden; `fused.py` picks the backend.
"""

from sparsify_clip_tpu.ops.fused import (  # noqa: F401
    fused_lunif_loss,
    fused_infonce_loss,
)
