"""Decision variable init/assignment tests (mirrors reference
python/test/optimization/decision_variable_test.py)."""

import numpy as np

from sleipnir_tpu import Problem


def test_scalar_init_assign():
    problem = Problem()
    x = problem.decision_variable()
    assert x.value() == 0.0
    x.set_value(1.0)
    assert x.value() == 1.0
    x.set_value(2.0)
    assert x.value() == 2.0


def test_vector_init_assign():
    problem = Problem()
    y = problem.decision_variable(2)
    assert y.value(0) == 0.0
    assert y.value(1) == 0.0
    y[0].set_value(1.0)
    y[1].set_value(2.0)
    assert y.value(0) == 1.0
    assert y.value(1) == 2.0


def test_matrix_init_assign():
    problem = Problem()
    z = problem.decision_variable(3, 2)
    assert np.all(z.value() == 0.0)
    vals = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    z.set_value(vals)
    np.testing.assert_allclose(z.value(), vals)
    assert z.value(1, 1) == 4.0


def test_symmetric_matrix():
    problem = Problem()
    A = problem.symmetric_decision_variable(3)
    # Upper triangle shares lower triangle's variables
    A[1, 0].set_value(5.0)
    assert A.value(0, 1) == 5.0
    assert A.value(1, 0) == 5.0
