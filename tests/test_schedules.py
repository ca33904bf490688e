"""Schedule numerics: β/α curves and the cosine LR factor, including the
/100-epochs quirk and the step-462 discontinuity (SURVEY.md §2.7)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from sparsify_clip_tpu.schedules import (
    cosine_lr_factor,
    get_alpha,
    get_alpha_jax,
    get_beta,
    get_beta_jax,
    make_lr_schedule,
)

T_TOTAL = 46200  # 462 steps/epoch × 100 epochs (full-COCO reference run)
SPE = T_TOTAL / 100


def test_beta_piecewise_values():
    assert get_beta(0, T_TOTAL) == 1.0
    assert get_beta(20 * SPE - 1, T_TOTAL) == 1.0
    # Exactly at the boundary: second branch, zero progress -> 1.0
    assert get_beta(20 * SPE, T_TOTAL) == 1.0
    # Midway through decay
    mid = 20 * SPE + 25 * SPE
    assert get_beta(mid, T_TOTAL) == pytest.approx(0.5)
    assert get_beta(70 * SPE, T_TOTAL) == 0.0
    assert get_beta(T_TOTAL, T_TOTAL) == 0.0


def test_beta_div100_quirk():
    # The /100 hardcoding means β is epoch-correct ONLY when epochs==100.
    # With a 50-epoch run the "epoch 20" boundary lands at step
    # total/100*20, i.e. actual epoch 10 — we must reproduce that.
    total = 462 * 50
    boundary = total / 100 * 20
    assert get_beta(boundary - 1, total) == 1.0
    assert get_beta(boundary + total / 100 * 25, total) == pytest.approx(0.5)


def test_alpha_piecewise_values():
    assert get_alpha(0, T_TOTAL, 50, 50) == 1.0
    assert get_alpha(50 * SPE - 1, T_TOTAL, 50, 50) == 1.0
    assert get_alpha(50 * SPE + 25 * SPE, T_TOTAL, 50, 50) == pytest.approx(1.5)
    assert get_alpha(100 * SPE, T_TOTAL, 50, 50) == 2.0


def test_jax_schedules_match_python():
    steps = np.linspace(0, T_TOTAL, 977).astype(np.int64)
    beta_py = np.array([get_beta(int(s), T_TOTAL) for s in steps])
    beta_jx = np.array([float(get_beta_jax(int(s), T_TOTAL)) for s in steps])
    np.testing.assert_allclose(beta_jx, beta_py, atol=1e-5)

    alpha_py = np.array([get_alpha(int(s), T_TOTAL, 50, 50) for s in steps])
    alpha_jx = np.array([float(get_alpha_jax(int(s), T_TOTAL, 50, 50)) for s in steps])
    np.testing.assert_allclose(alpha_jx, alpha_py, atol=1e-5)


def test_lr_factor_hold_and_discontinuity():
    warmup = int(0.20 * T_TOTAL)  # 9240
    # With only_lunif_epochs > 0 the factor holds at 1.0 before step 462...
    assert cosine_lr_factor(0, warmup, T_TOTAL, only_lunif_epochs=1) == 1.0
    assert cosine_lr_factor(461, warmup, T_TOTAL, only_lunif_epochs=1) == 1.0
    # ...then drops to 462/9240 ≈ 0.05 (the reference discontinuity).
    at_462 = cosine_lr_factor(462, warmup, T_TOTAL, only_lunif_epochs=1)
    assert at_462 == pytest.approx(462 / warmup)
    assert at_462 < 0.06
    # Without the lunif phase, plain linear warmup from 0.
    assert cosine_lr_factor(0, warmup, T_TOTAL, only_lunif_epochs=0) == 0.0
    assert cosine_lr_factor(462, warmup, T_TOTAL, only_lunif_epochs=0) == pytest.approx(
        462 / warmup
    )


def test_lr_factor_cosine_tail():
    warmup = int(0.20 * T_TOTAL)
    assert cosine_lr_factor(warmup, warmup, T_TOTAL, 0) == pytest.approx(1.0)
    # Half-way through decay: cos(pi/2) -> 0.5
    half = warmup + (T_TOTAL - warmup) // 2
    assert cosine_lr_factor(half, warmup, T_TOTAL, 0) == pytest.approx(0.5, abs=1e-3)
    assert cosine_lr_factor(T_TOTAL, warmup, T_TOTAL, 0) == pytest.approx(0.0, abs=1e-9)


@pytest.mark.parametrize("only_lunif", [0, 1])
def test_optax_schedule_matches_golden(only_lunif):
    warmup = int(0.20 * T_TOTAL)
    base_lr = 1e-4
    sched = make_lr_schedule(base_lr, warmup, T_TOTAL, only_lunif)
    steps = list(range(0, 500)) + [9239, 9240, 9241, 20000, 46199, 46200]
    golden = np.array(
        [base_lr * cosine_lr_factor(s, warmup, T_TOTAL, only_lunif) for s in steps]
    )
    ours = np.array([float(sched(jnp.int32(s))) for s in steps])
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-12)
