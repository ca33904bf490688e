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


def wait_for_backend(retries: int = 6, sleep_s: float = 60.0):
    """Initialize the JAX backend, retrying transient failures.

    The axon tunnel's backend init can transiently raise
    ``Unavailable: TPU backend setup/compile error`` while the remote
    worker restarts (two round-4 ``bench_system`` runs died on exactly
    this before doing any work).  jax does not cache the failure, so a
    sleep-and-retry from the same process succeeds once the worker is
    back.  Non-transient errors re-raise immediately."""
    import jax

    for attempt in range(retries):
        try:
            return jax.devices()
        except RuntimeError as err:  # xla_bridge wraps init failures
            if "UNAVAILABLE" not in str(err).upper():
                raise
            if attempt == retries - 1:
                raise
            print(
                f"[bench] backend unavailable (attempt {attempt + 1}/"
                f"{retries}), retrying in {sleep_s:.0f}s: {err}",
                file=sys.stderr,
            )
            time.sleep(sleep_s)


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


# The experiment-6 stack every bench measures (the CLI's flagship
# configuration).  ONE definition, so a key/loss_type change cannot
# leave a bench silently measuring something else than the CLI runs.
EXP6_LOSS_TYPE = "only_lunif_n_then_anchor+lalign+lunif(centroids)"


def exp6_config(model: str, batch: int, **overrides):
    """Experiment-6 train config (reference
    experiment_6-SPARSIFICATION(1E)+... semantics: bf16, lr 1e-4,
    100 epochs, warm phase 1) with bench-specific overrides."""
    from sparsify_clip_tpu.config import ExperimentConfig

    base = {
        "model": model, "batch_size": batch, "epochs": 100,
        "learning_rate": 1e-4,
        "loss_type": EXP6_LOSS_TYPE,
        "only_lunif_epochs": 1, "anchor_temperature": 0.1,
        "fp16": True, "seed": 42,
    }
    base.update(overrides)
    return ExperimentConfig.from_dict(base)


def synthetic_batch(batch: int, image_size: int, context: int = 77, seed: int = 0):
    """CLIP-shaped random host batch with sot/eot framing (the shape
    every bench feeds the train step)."""
    rng = np.random.default_rng(seed)
    tokens = rng.integers(1, 49000, size=(batch, context)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 49406, 49407
    images = rng.standard_normal((batch, image_size, image_size, 3))
    return {"images": images.astype(np.float32), "tokens": tokens}
