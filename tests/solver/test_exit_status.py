"""Off-nominal exit status coverage
(reference test/src/optimization/solver/exit_status_test.cpp)."""

import sleipnir_tpu as slp
from sleipnir_tpu import ExitStatus, ExpressionType, Problem


def test_callback_requested_stop():
    """(reference exit_status_test.cpp:17-50)"""
    problem = Problem()
    x = problem.decision_variable()
    problem.minimize(x * x)

    problem.add_callback(lambda info: None)
    x.set_value(1.0)
    assert problem.solve() == ExitStatus.SUCCESS

    problem.add_callback(lambda info: False)
    x.set_value(1.0)
    assert problem.solve() == ExitStatus.SUCCESS

    problem.add_callback(lambda info: True)
    x.set_value(1.0)
    assert problem.solve() == ExitStatus.CALLBACK_REQUESTED_STOP

    problem.clear_callbacks()
    problem.add_callback(lambda info: False)
    x.set_value(1.0)
    assert problem.solve() == ExitStatus.SUCCESS

    # Persistent callbacks survive clear_callbacks()
    problem.add_persistent_callback(lambda info: True)
    problem.clear_callbacks()
    x.set_value(1.0)
    assert problem.solve() == ExitStatus.CALLBACK_REQUESTED_STOP


def test_too_few_dofs():
    """(reference exit_status_test.cpp:52-74)"""
    problem = Problem()
    x = problem.decision_variable()
    y = problem.decision_variable()
    z = problem.decision_variable()

    problem.subject_to(x == 1.0)
    problem.subject_to(x == 2.0)
    problem.subject_to(y == 1.0)
    problem.subject_to(z == 1.0)

    assert problem.cost_function_type() == ExpressionType.NONE
    assert problem.equality_constraint_type() == ExpressionType.LINEAR
    assert problem.inequality_constraint_type() == ExpressionType.NONE

    assert problem.solve() == ExitStatus.TOO_FEW_DOFS


def test_locally_infeasible_equality():
    """(reference exit_status_test.cpp:76-97)"""
    problem = Problem()
    x = problem.decision_variable()
    y = problem.decision_variable()
    z = problem.decision_variable()

    problem.subject_to(x == y + 1.0)
    problem.subject_to(y == z + 1.0)
    problem.subject_to(z == x + 1.0)

    assert problem.equality_constraint_type() == ExpressionType.LINEAR
    assert problem.solve() == ExitStatus.LOCALLY_INFEASIBLE


def test_locally_infeasible_inequality():
    """(reference exit_status_test.cpp:99-117)"""
    problem = Problem()
    x = problem.decision_variable()
    y = problem.decision_variable()
    z = problem.decision_variable()

    problem.subject_to(x >= y + 1.0)
    problem.subject_to(y >= z + 1.0)
    problem.subject_to(z >= x + 1.0)

    assert problem.inequality_constraint_type() == ExpressionType.LINEAR
    assert problem.solve() == ExitStatus.LOCALLY_INFEASIBLE


def test_nonfinite_initial_guess():
    """(reference exit_status_test.cpp:119-174)"""
    # Nonfinite cost
    problem = Problem()
    x = problem.decision_variable()
    problem.minimize(1.0 / x)
    assert problem.solve() == ExitStatus.NONFINITE_INITIAL_GUESS

    # Nonfinite gradient (sqrt(0) has infinite derivative)
    problem = Problem()
    x = problem.decision_variable()
    problem.minimize(slp.sqrt(x))
    assert problem.solve() == ExitStatus.NONFINITE_INITIAL_GUESS

    # Nonfinite equality constraint
    problem = Problem()
    x = problem.decision_variable()
    problem.subject_to(1.0 / x == 1.0)
    assert problem.solve() == ExitStatus.NONFINITE_INITIAL_GUESS

    # Nonfinite equality constraint Jacobian
    problem = Problem()
    x = problem.decision_variable()
    problem.subject_to(slp.sqrt(x) == 1.0)
    assert problem.solve() == ExitStatus.NONFINITE_INITIAL_GUESS

    # Nonfinite inequality constraint
    problem = Problem()
    x = problem.decision_variable()
    problem.subject_to(1.0 / x > 1.0)
    assert problem.solve() == ExitStatus.NONFINITE_INITIAL_GUESS

    # Nonfinite inequality constraint Jacobian
    problem = Problem()
    x = problem.decision_variable()
    problem.subject_to(slp.sqrt(x) > 1.0)
    assert problem.solve() == ExitStatus.NONFINITE_INITIAL_GUESS


def test_diverging_iterates():
    """(reference exit_status_test.cpp:176-192)"""
    problem = Problem()
    x = problem.decision_variable()
    problem.minimize(x)

    assert problem.cost_function_type() == ExpressionType.LINEAR
    assert problem.solve() == ExitStatus.DIVERGING_ITERATES


def test_max_iterations_exceeded():
    """(reference exit_status_test.cpp:194-211)"""
    problem = Problem()
    x = problem.decision_variable()
    x.set_value(1.0)
    problem.minimize(x * x)

    assert problem.cost_function_type() == ExpressionType.QUADRATIC
    assert problem.solve(max_iterations=0) == (
        ExitStatus.MAX_ITERATIONS_EXCEEDED
    )


def test_timeout():
    """(reference exit_status_test.cpp:213-230)"""
    problem = Problem()
    x = problem.decision_variable()
    x.set_value(1.0)
    problem.minimize(x * x)

    assert problem.solve(timeout=0.0) == ExitStatus.TIMEOUT


def test_globally_infeasible_bounds():
    """Conflicting bounds are detected before solving
    (reference nonlinear_problem_test.cpp:145, bounds.hpp:55)."""
    problem = Problem()
    x = problem.decision_variable()
    problem.minimize(x * x)
    problem.subject_to(x >= 2.0)
    problem.subject_to(x <= 1.0)
    assert problem.solve() == ExitStatus.GLOBALLY_INFEASIBLE
