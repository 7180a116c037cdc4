"""Quadratic problems (mirrors reference
python/test/optimization/quadratic_problem_test.py)."""

import pytest

from sleipnir_tpu import ExitStatus, ExpressionType, Problem


def test_unconstrained_1d():
    problem = Problem()
    x = problem.decision_variable()
    x.set_value(2.0)

    problem.minimize(x * x - 6.0 * x)

    assert problem.cost_function_type() == ExpressionType.QUADRATIC
    assert problem.solve() == ExitStatus.SUCCESS
    assert x.value() == pytest.approx(3.0, abs=1e-6)


def test_unconstrained_2d():
    problem = Problem()
    x, y = problem.decision_variable(2)
    x.set_value(1.0)
    y.set_value(2.0)

    problem.minimize(x * x + y * y)

    assert problem.solve() == ExitStatus.SUCCESS
    assert x.value() == pytest.approx(0.0, abs=1e-6)
    assert y.value() == pytest.approx(0.0, abs=1e-6)


def test_unconstrained_2d_matrix():
    problem = Problem()
    x = problem.decision_variable(2)
    x[0].set_value(1.0)
    x[1].set_value(2.0)

    problem.minimize(x.T @ x)

    assert problem.cost_function_type() == ExpressionType.QUADRATIC
    assert problem.solve() == ExitStatus.SUCCESS
    assert x.value(0) == pytest.approx(0.0, abs=1e-6)
    assert x.value(1) == pytest.approx(0.0, abs=1e-6)


def test_equality_constrained():
    # Maximize xy subject to x + 3y = 36 (the README example).
    problem = Problem()
    x = problem.decision_variable()
    y = problem.decision_variable()
    x.set_value(1.0)
    y.set_value(2.0)

    problem.maximize(x * y)
    problem.subject_to(x + 3 * y == 36)

    assert problem.cost_function_type() == ExpressionType.QUADRATIC
    assert problem.equality_constraint_type() == ExpressionType.LINEAR

    assert problem.solve() == ExitStatus.SUCCESS
    assert x.value() == pytest.approx(18.0, abs=1e-5)
    assert y.value() == pytest.approx(6.0, abs=1e-5)


def test_equality_constrained_matrix():
    problem = Problem()
    x = problem.decision_variable(2)
    x[0].set_value(1.0)
    x[1].set_value(2.0)

    problem.minimize(x.T @ x)
    problem.subject_to(x == [[3.0], [3.0]])

    assert problem.solve() == ExitStatus.SUCCESS
    assert x.value(0) == pytest.approx(3.0, abs=1e-5)
    assert x.value(1) == pytest.approx(3.0, abs=1e-5)
