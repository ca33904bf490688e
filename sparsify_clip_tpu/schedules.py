"""Step-indexed scalar schedules: β, α and the cosine LR schedule.

Reference semantics (sparsify_clip.py:41-107), including the quirks
that must be preserved for matched numerics:

* ``get_beta`` / ``get_alpha`` hardcode ``steps_in_one_epoch =
  total_steps / 100`` (sparsify_clip.py:43,56) — i.e. they assume
  ``epochs == 100`` (true for every shipped config).  We reproduce the
  division-by-100 semantics, not the intent.
* The LR lambda holds the factor at 1.0 while ``current_step <
  steps_sparsify (462)`` **and** ``only_lunif_epochs > 0``
  (sparsify_clip.py:100-101), producing a discontinuity at step 462 for
  experiments 5/6: the factor drops from 1.0 to 462/num_warmup_steps and
  re-warms.
* β/α are evaluated at the **1-based** global batch index (the reference
  increments ``current_batch`` before use, sparsify_clip.py:755), while
  the LR lambda is evaluated at the 0-based optimizer step count
  (``LambdaLR`` semantics: factor for step N applied after N
  ``scheduler.step()`` calls; the first optimizer update uses factor(0)).

Each schedule ships in two forms: a pure-Python float implementation
(the golden; also used for host-side hyperparameter computation in
fp64) and a ``jnp`` implementation that is traceable inside ``jit`` for
use as an optax schedule.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# β: uniformity-loss weight — 1.0 for warmup_epoch epochs, linear decay to 0
# over decay_epoch epochs, then 0.  Reference: sparsify_clip.py:41-51.
# ---------------------------------------------------------------------------

def get_beta(current_step, total_steps, warmup_epoch: int = 20, decay_epoch: int = 50) -> float:
    steps_in_one_epoch = total_steps / 100  # reference hardcodes /100 (:43)
    if current_step < warmup_epoch * steps_in_one_epoch:
        return 1.0
    elif current_step < (warmup_epoch + decay_epoch) * steps_in_one_epoch:
        return 1.0 - float(current_step - warmup_epoch * steps_in_one_epoch) / float(
            max(1, decay_epoch * steps_in_one_epoch)
        )
    else:
        return 0.0


def get_beta_jax(current_step, total_steps, warmup_epoch: int = 20, decay_epoch: int = 50):
    """Traceable β (float32).  Matches :func:`get_beta` to fp32 precision."""
    step = jnp.asarray(current_step, jnp.float32)
    spe = jnp.asarray(total_steps, jnp.float32) / 100.0
    warm = warmup_epoch * spe
    decay = jnp.maximum(1.0, decay_epoch * spe)
    linear = 1.0 - (step - warm) / decay
    return jnp.where(step < warm, 1.0, jnp.where(step < warm + decay_epoch * spe, linear, 0.0))


# ---------------------------------------------------------------------------
# α: alignment-loss weight — 1.0, linear increase to 2.0, then 2.0.
# Reference: sparsify_clip.py:54-64.
# ---------------------------------------------------------------------------

def get_alpha(current_step, total_steps, warmup_epoch: int = 20, increment_epoch: int = 50) -> float:
    steps_in_one_epoch = total_steps / 100  # reference hardcodes /100 (:56)
    if current_step < warmup_epoch * steps_in_one_epoch:
        return 1.0
    elif current_step < (warmup_epoch + increment_epoch) * steps_in_one_epoch:
        return 1.0 + float(current_step - warmup_epoch * steps_in_one_epoch) / float(
            max(1, increment_epoch * steps_in_one_epoch)
        )
    else:
        return 2.0


def get_alpha_jax(current_step, total_steps, warmup_epoch: int = 20, increment_epoch: int = 50):
    step = jnp.asarray(current_step, jnp.float32)
    spe = jnp.asarray(total_steps, jnp.float32) / 100.0
    warm = warmup_epoch * spe
    inc = jnp.maximum(1.0, increment_epoch * spe)
    linear = 1.0 + (step - warm) / inc
    return jnp.where(step < warm, 1.0, jnp.where(step < warm + increment_epoch * spe, linear, 2.0))


# ---------------------------------------------------------------------------
# Cosine LR schedule with warmup + "sparsify hold".
# Reference: sparsify_clip.py:68-107 (lr_lambda at :97-105).
# ---------------------------------------------------------------------------

def cosine_lr_factor(
    current_step: int,
    num_warmup_steps: int,
    num_training_steps: int,
    only_lunif_epochs: int,
    steps_sparsify: int = 462,
    num_cycles: float = 0.5,
) -> float:
    """Pure-Python golden of the reference lr_lambda (sparsify_clip.py:97-105)."""
    if current_step < steps_sparsify and only_lunif_epochs > 0:
        return 1.0
    elif current_step < num_warmup_steps:
        return float(current_step) / float(max(1, num_warmup_steps))
    progress = float(current_step - num_warmup_steps) / float(
        max(1, num_training_steps - num_warmup_steps)
    )
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * float(num_cycles) * 2.0 * progress)))


def make_lr_schedule(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    only_lunif_epochs: int,
    steps_sparsify: int = 462,
    num_cycles: float = 0.5,
):
    """optax-compatible schedule: step (0-based int array) → learning rate.

    ``num_warmup_steps = int(0.20 * total)`` and ``total =
    steps_per_epoch * epochs`` are the caller's responsibility, matching
    sparsify_clip.py:734-736.
    """

    hold = only_lunif_epochs > 0  # static: baked per-experiment

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        warmup = step_f / jnp.maximum(1.0, float(num_warmup_steps))
        denom = max(1, num_training_steps - num_warmup_steps)
        progress = (step_f - num_warmup_steps) / denom
        cosine = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        factor = jnp.where(step_f < num_warmup_steps, warmup, cosine)
        if hold:
            factor = jnp.where(step_f < steps_sparsify, 1.0, factor)
        return base_lr * factor

    return schedule
