"""Flywheel problem (mirrors reference
python/test/optimization/flywheel_problem_test.py, at N=100 for CI time;
both the vmapped fast path and the symbolic DSL path are exercised).

At this coarser dt the reference's exact bang-bang oracle overshoots r at
the transition step, so the oracle here checks the same qualitative
structure (max voltage during spin-up, steady state at r) plus exact
dynamics-constraint satisfaction to 1e-8.
"""

import math

import numpy as np
import pytest

from sleipnir_tpu import ExitStatus, ExpressionType
from sleipnir_tpu.models.flywheel import flywheel_problem


def _check_flywheel(fast):
    TOTAL_TIME = 5.0
    N = 100
    dt = TOTAL_TIME / N
    A = math.exp(-dt)
    B = 1.0 - math.exp(-dt)
    r = 10.0

    problem, X, U = flywheel_problem(N=N, total_time=TOTAL_TIME, fast=fast)

    assert problem.cost_function_type() == ExpressionType.QUADRATIC
    assert problem.equality_constraint_type() == ExpressionType.LINEAR
    assert problem.inequality_constraint_type() == ExpressionType.LINEAR

    assert problem.solve() == ExitStatus.SUCCESS

    Xv = X.value()
    Uv = U.value()

    # Initial state
    assert Xv[0, 0] == pytest.approx(0.0, abs=1e-8)

    # Dynamics constraints hold exactly
    for k in range(N):
        assert Xv[0, k + 1] == pytest.approx(
            A * Xv[0, k] + B * Uv[0, k], abs=1e-8
        )

    # Input bounds
    assert np.all(Uv >= -12.0 - 1e-9)
    assert np.all(Uv <= 12.0 + 1e-9)

    # Spin-up at max voltage while far from the reference, then settle at
    # the steady-state voltage (reference flywheel_problem_test.py:50-56)
    u_ss = 1.0 / B * (1.0 - A) * r
    for k in range(N - 1):
        error = r - Xv[0, k]
        if error > 0.2:
            assert Uv[0, k] == pytest.approx(12.0, abs=1e-4)
        elif error < 1e-4 and k < N - 2:
            assert Uv[0, k] == pytest.approx(u_ss, abs=1e-2)

    # Settles at the reference velocity
    assert Xv[0, N] == pytest.approx(r, abs=1e-2)


def test_flywheel_fast_path():
    _check_flywheel(fast=True)


def test_flywheel_dsl_path():
    _check_flywheel(fast=False)
