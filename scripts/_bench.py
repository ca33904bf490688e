"""Shared benchmarking plumbing for the scripts/ profilers.

``fence`` is load-bearing: under the axon TPU tunnel,
``block_until_ready`` on a donated buffer can return before the
compute chain drains, so a device→host scalar read is the only honest
timing fence (CLAUDE.md).  Importing this module also puts the repo
root on ``sys.path`` so the scripts can import ``sparsify_clip_tpu``
without being installed.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
)


def fence(x) -> float:
    """Device→host scalar read; the only honest timing fence here."""
    return float(np.asarray(x).ravel()[0])


def timed(fn, *args, steps: int = 10, warmup: int = 2) -> float:
    """Mean seconds per call over ``steps`` fenced iterations."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / steps
