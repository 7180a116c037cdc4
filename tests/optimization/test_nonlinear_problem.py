"""Nonlinear problems, including adversarial cases (mirrors reference
python/test/optimization/nonlinear_problem_test.py and
test/src/optimization/nonlinear_problem_test.cpp)."""

import numpy as np
import pytest

import sleipnir_tpu as slp
from sleipnir_tpu import ExitStatus, ExpressionType, Problem
from sleipnir_tpu.autodiff.variable import bounds


def test_quartic():
    problem = Problem()
    x = problem.decision_variable()
    x.set_value(20.0)

    problem.minimize(slp.pow(x, 4))
    problem.subject_to(x >= 1)

    assert problem.cost_function_type() == ExpressionType.NONLINEAR
    assert problem.inequality_constraint_type() == ExpressionType.LINEAR

    assert problem.solve() == ExitStatus.SUCCESS
    assert x.value() == pytest.approx(1.0, abs=1e-6)


def test_rosenbrock_with_disk_constraint():
    problem = Problem()
    x, y = problem.decision_variable(2)

    problem.minimize(
        100 * slp.pow(y - slp.pow(x, 2), 2) + slp.pow(1 - x, 2)
    )
    problem.subject_to(slp.pow(x, 2) + slp.pow(y, 2) <= 2)

    assert problem.cost_function_type() == ExpressionType.NONLINEAR
    assert problem.inequality_constraint_type() == ExpressionType.QUADRATIC

    # Coarser grid than the reference's 0.1 steps to keep CI time sane;
    # the compiled solver is reused across every start point.
    for x0 in np.arange(-1.5, 1.5, 0.5):
        for y0 in np.arange(-1.5, 1.5, 0.5):
            x.set_value(x0)
            y.set_value(y0)

            assert problem.solve() == ExitStatus.SUCCESS
            assert x.value() == pytest.approx(1.0, abs=1e-3)
            assert y.value() == pytest.approx(1.0, abs=1e-3)


def test_rosenbrock_with_cubic_and_line_constraint():
    problem = Problem()
    x, y = problem.decision_variable(2)

    problem.minimize(
        100 * slp.pow(y - slp.pow(x, 2), 2) + slp.pow(1 - x, 2)
    )
    problem.subject_to(y >= slp.pow(x - 1, 3) + 1)
    problem.subject_to(y <= -x + 2)

    for x0 in np.arange(-1.5, 1.5, 0.5):
        for y0 in np.arange(-0.5, 2.5, 0.5):
            x.set_value(x0)
            y.set_value(y0)

            assert problem.solve() == ExitStatus.SUCCESS
            # Local minimum at (0, 0), global minimum at (1, 1)
            assert x.value() == pytest.approx(
                0.0, abs=1e-2
            ) or x.value() == pytest.approx(1.0, abs=1e-2)
            assert y.value() == pytest.approx(
                0.0, abs=1e-2
            ) or y.value() == pytest.approx(1.0, abs=1e-2)


def test_minimum_2d_distance_with_linear_constraint():
    problem = Problem()
    x, y = problem.decision_variable(2)
    x.set_value(20.0)
    y.set_value(50.0)

    problem.minimize(slp.sqrt(x * x + y * y))
    problem.subject_to(y == -x + 5.0)

    assert problem.cost_function_type() == ExpressionType.NONLINEAR
    assert problem.equality_constraint_type() == ExpressionType.LINEAR

    assert problem.solve() == ExitStatus.SUCCESS
    assert x.value() == pytest.approx(2.5, abs=1e-2)
    assert y.value() == pytest.approx(2.5, abs=1e-2)


def test_conflicting_bounds():
    problem = Problem()
    x, y = problem.decision_variable(2)

    problem.minimize(slp.hypot(x, y))
    problem.subject_to(slp.hypot(x, y) <= 1)
    problem.subject_to(bounds(0.5, x, -0.5))

    assert problem.solve() == ExitStatus.GLOBALLY_INFEASIBLE


def test_wachter_and_biegler_line_search_failure():
    # Example 19.2 of Nocedal & Wright; the reference converges via
    # feasibility restoration (reference nonlinear_problem_test.py:127-156).
    problem = Problem()

    x, s1, s2 = problem.decision_variable(3)
    x.set_value(-2)
    s1.set_value(3)
    s2.set_value(1)

    problem.minimize(x)

    problem.subject_to(x**2 - s1 - 1 == 0)
    problem.subject_to(x - s2 - 0.5 == 0)
    problem.subject_to(s1 >= 0)
    problem.subject_to(s2 >= 0)

    assert problem.cost_function_type() == ExpressionType.LINEAR
    assert problem.equality_constraint_type() == ExpressionType.QUADRATIC
    assert problem.inequality_constraint_type() == ExpressionType.LINEAR

    assert problem.solve() == ExitStatus.SUCCESS

    assert x.value() == pytest.approx(1.0, abs=1e-6)
    assert s1.value() == pytest.approx(0.0, abs=1e-6)
    assert s2.value() == pytest.approx(0.5, abs=1e-6)
