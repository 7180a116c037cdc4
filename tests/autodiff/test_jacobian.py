"""Jacobian tests (mirrors reference
python/test/autodiff/jacobian_test.py)."""

import numpy as np

from sleipnir_tpu import Jacobian, VariableMatrix


def test_y_eq_x():
    x = VariableMatrix(3)
    for i in range(3):
        x[i].set_value(i + 1)

    J = Jacobian(x, x)
    expected = np.diag([1.0, 1.0, 1.0])
    assert (J.get().value() == expected).all()
    assert (J.value() == expected).all()


def test_y_eq_3x():
    x = VariableMatrix(3)
    for i in range(3):
        x[i].set_value(i + 1)

    y = 3 * x
    J = Jacobian(y, x)
    expected = np.diag([3.0, 3.0, 3.0])
    assert (J.value() == expected).all()


def test_products():
    x = VariableMatrix(3)
    for i in range(3):
        x[i].set_value(i + 1)

    #     [x₁x₂]
    # y = [x₂x₃]
    #     [x₁x₃]
    y = VariableMatrix(np.zeros((3, 1)))
    y[0, 0] = x[0] * x[1]
    y[1, 0] = x[1] * x[2]
    y[2, 0] = x[0] * x[2]

    J = Jacobian(y, x).value()
    expected = np.array(
        [[2.0, 1.0, 0.0], [0.0, 3.0, 2.0], [3.0, 0.0, 1.0]]
    )
    np.testing.assert_allclose(J, expected)


def test_non_square():
    x = VariableMatrix(3)
    for i in range(3):
        x[i].set_value(i + 1)

    y = VariableMatrix(np.zeros((1, 1)))
    y[0, 0] = x[0] + 3 * x[1] - 5 * x[2]
    J = Jacobian(y, x).value()
    np.testing.assert_allclose(J, [[1.0, 3.0, -5.0]])


def test_matrix_product_jacobian():
    x = VariableMatrix(2)
    x[0].set_value(1.0)
    x[1].set_value(2.0)
    A = np.array([[1.0, 2.0], [3.0, 4.0]])
    y = A @ x
    J = Jacobian(y, x).value()
    np.testing.assert_allclose(J, A)
