"""Hessian tests (mirrors reference python/test/autodiff/hessian_test.py)."""

import numpy as np
import pytest

import sleipnir_tpu as slp
from sleipnir_tpu import Gradient, Hessian, Variable, VariableMatrix


def test_linear():
    x = VariableMatrix(1)
    x[0].set_value(3)
    y = x[0]

    assert Gradient(y, x[0]).value()[0, 0] == 1.0
    H = Hessian(y, x)
    assert H.get().value()[0, 0] == 0.0
    assert H.value()[0, 0] == 0.0


def test_quadratic():
    x = VariableMatrix(1)
    x[0].set_value(3)
    y = x[0] * x[0]

    assert Gradient(y, x[0]).value()[0, 0] == 6.0
    assert Hessian(y, x).value()[0, 0] == 2.0


def test_sum_of_products():
    x = VariableMatrix(5)
    for i in range(5):
        x[i].set_value(i + 1)

    # y = Σ xᵢ²
    y = (x**2).sum()
    H = Hessian(y, x).value()
    np.testing.assert_allclose(H, 2.0 * np.eye(5))


def test_nonlinear():
    x = Variable()
    x.set_value(0.5)
    xm = VariableMatrix(np.zeros((0, 0)))

    y = slp.sin(x) * slp.cos(x)  # = sin(2x)/2, y'' = -2 sin(2x)
    wrt = x
    H = Hessian(y, wrt).value()
    assert H[0, 0] == pytest.approx(-2.0 * np.sin(1.0), abs=1e-12)


def test_rosenbrock_hessian():
    x = VariableMatrix(2)
    x[0].set_value(1.0)
    x[1].set_value(1.0)
    a, b = x[0], x[1]
    y = (1 - a) ** 2 + 100 * (b - a**2) ** 2

    H = Hessian(y, x).value()
    np.testing.assert_allclose(
        H, [[802.0, -400.0], [-400.0, 200.0]], atol=1e-9
    )
