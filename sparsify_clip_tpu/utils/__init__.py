"""Shared numerics / small helpers."""

from sparsify_clip_tpu.utils.numerics import fp32_matmul, l2_normalize  # noqa: F401
