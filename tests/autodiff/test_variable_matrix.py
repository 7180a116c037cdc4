"""VariableMatrix tests (mirrors a subset of reference
python/test/autodiff/variable_matrix_test.py)."""

import numpy as np
import pytest

import sleipnir_tpu as slp
from sleipnir_tpu import ExpressionType, Variable, VariableMatrix, block


def test_construction_and_values():
    m = VariableMatrix(2, 3)
    assert m.shape == (2, 3)
    m.set_value(np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(m.value(), np.arange(6.0).reshape(2, 3))
    assert m.value(1, 2) == 5.0

    c = VariableMatrix(np.eye(2))
    assert c.type() == ExpressionType.CONSTANT
    np.testing.assert_allclose(c.value(), np.eye(2))


def test_assignment_and_views():
    m = VariableMatrix(3, 3)
    m.set_value(np.zeros((3, 3)))
    m[0, 0] = 5.0
    assert m.value(0, 0) == 5.0

    m[1:3, 1:3] = np.ones((2, 2))
    expected = np.zeros((3, 3))
    expected[0, 0] = 5.0
    expected[1:3, 1:3] = 1.0
    np.testing.assert_allclose(m.value(), expected)

    blk = m.block(0, 0, 2, 2)
    assert blk.shape == (2, 2)
    np.testing.assert_allclose(blk.value(), expected[:2, :2])


def test_arithmetic():
    A = VariableMatrix(np.array([[1.0, 2.0], [3.0, 4.0]]))
    B = VariableMatrix(np.array([[5.0, 6.0], [7.0, 8.0]]))

    np.testing.assert_allclose((A + B).value(), [[6, 8], [10, 12]])
    np.testing.assert_allclose((A - B).value(), [[-4, -4], [-4, -4]])
    np.testing.assert_allclose((A @ B).value(), [[19, 22], [43, 50]])
    np.testing.assert_allclose((A * B).value(), [[19, 22], [43, 50]])
    np.testing.assert_allclose((2.0 * A).value(), [[2, 4], [6, 8]])
    np.testing.assert_allclose((A / 2.0).value(), [[0.5, 1], [1.5, 2]])
    np.testing.assert_allclose((-A).value(), [[-1, -2], [-3, -4]])
    np.testing.assert_allclose(A.T.value(), [[1, 3], [2, 4]])
    np.testing.assert_allclose((A**2).value(), [[1, 4], [9, 16]])


def test_numpy_interop():
    A = np.array([[1.0, 2.0], [3.0, 4.0]])
    x = VariableMatrix(2, 1)
    x.set_value(np.array([[1.0], [2.0]]))

    y = A @ x
    np.testing.assert_allclose(y.value(), [[5.0], [11.0]])

    z = x + np.array([[1.0], [1.0]])
    np.testing.assert_allclose(z.value(), [[2.0], [3.0]])


def test_block_assembly():
    A = VariableMatrix(np.eye(2))
    b = VariableMatrix(np.array([[5.0], [6.0]]))
    M = block([[A, b]])
    assert M.shape == (2, 3)
    np.testing.assert_allclose(
        M.value(), [[1.0, 0.0, 5.0], [0.0, 1.0, 6.0]]
    )


def test_linearity_classification():
    x = VariableMatrix(2, 1)
    assert x.type() == ExpressionType.LINEAR
    assert (x + x).type() == ExpressionType.LINEAR
    assert (x.T @ x).type() == ExpressionType.QUADRATIC
    assert (x**2).type() == ExpressionType.QUADRATIC
    assert slp.sin(x).type() == ExpressionType.NONLINEAR
    assert (3.0 * x).type() == ExpressionType.LINEAR


def test_solve_free_function():
    A = VariableMatrix(np.array([[2.0, 0.0], [0.0, 4.0]]))
    b = VariableMatrix(np.array([[2.0], [4.0]]))
    x = slp.solve(A, b)
    np.testing.assert_allclose(x.value(), [[1.0], [1.0]])


def test_cwise_and_iteration():
    m = VariableMatrix(2, 2)
    m.set_value(np.array([[1.0, 2.0], [3.0, 4.0]]))
    doubled = m.cwise_transform(lambda v: 2.0 * v)
    np.testing.assert_allclose(doubled.value(), [[2, 4], [6, 8]])

    vals = [v.value() for v in m]
    assert vals == [1.0, 2.0, 3.0, 4.0]

    s = slp.cwise_reduce(m, m, lambda a, b: a * b)
    np.testing.assert_allclose(s.value(), [[1, 4], [9, 16]])


def test_constraints():
    x = VariableMatrix(2, 1)
    x.set_value(np.array([[1.0], [2.0]]))

    eq = x == np.array([[1.0], [2.0]])
    assert bool(eq)
    ineq = x >= 0.0
    assert bool(ineq)
    ineq_bad = x >= 3.0
    assert not bool(ineq_bad)


def test_matrix_exp():
    A = np.array([[0.0, 1.0], [-1.0, 0.0]])
    M = VariableMatrix(2, 2)
    M.set_value(A)
    import scipy.linalg  # noqa: F401  (skip if unavailable)

    E = M.exp()
    expected = np.array(
        [[np.cos(1.0), np.sin(1.0)], [-np.sin(1.0), np.cos(1.0)]]
    )
    np.testing.assert_allclose(E.value(), expected, atol=1e-9)
