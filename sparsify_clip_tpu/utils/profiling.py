"""Tracing / profiling / debugging utilities.

The reference has no profiling at all — only a hand-rolled ETA
extrapolation (sparsify_clip.py:972-977; SURVEY.md §5).  Here:

* :class:`ThroughputMeter` — the north-star pairs/sec(/chip) counter,
  windowed over recent steps with an honest device fence;
* :func:`trace` — context manager around ``jax.profiler`` traces
  (view with TensorBoard/XProf);
* :func:`enable_nan_debugging` — flips ``jax_debug_nans`` (the
  jit-friendly substitute for the sanitizers the reference lacks);
* :func:`log_compile_time` — wall-clock of the first (compiling) call.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Optional, Tuple

import jax


class ThroughputMeter:
    """Windowed pairs/sec meter.

    Call :meth:`start` once, then :meth:`step(batch_size)` after each
    train step *after* fencing on a step output (a scalar read).  The
    window discards the first (compile) step automatically.
    """

    def __init__(self, window: int = 50, n_chips: Optional[int] = None):
        self.window = window
        self.n_chips = n_chips or len(jax.devices())
        self._times: Deque[Tuple[float, int]] = deque(maxlen=window + 1)

    def start(self) -> None:
        self._times.clear()
        self._times.append((time.perf_counter(), 0))

    def step(self, batch_size: int) -> None:
        self._times.append((time.perf_counter(), batch_size))

    @property
    def pairs_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        (t0, _), (t1, _) = self._times[0], self._times[-1]
        pairs = sum(b for _, b in list(self._times)[1:])
        return pairs / max(t1 - t0, 1e-9)

    @property
    def pairs_per_sec_per_chip(self) -> float:
        return self.pairs_per_sec / self.n_chips

    @property
    def step_time_ms(self) -> float:
        if len(self._times) < 2:
            return 0.0
        (t0, _), (t1, _) = self._times[0], self._times[-1]
        return (t1 - t0) / (len(self._times) - 1) * 1000


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """``with trace('/tmp/t'):`` captures a jax.profiler trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    """Global NaN checks inside jit (re-runs offending op eagerly)."""
    jax.config.update("jax_debug_nans", enable)


def log_compile_time(fn, *args, label: str = "fn", fence=None):
    """Run ``fn(*args)`` once, fencing with ``fence(out)`` (default:
    block_until_ready), and return (out, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args)
    if fence is None:
        jax.block_until_ready(out)
    else:
        fence(out)
    return out, time.perf_counter() - t0
