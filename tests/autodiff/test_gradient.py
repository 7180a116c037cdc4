"""Gradient driver tests (modeled on reference
test/src/autodiff/gradient_test.cpp and python/test/autodiff/gradient_test.py).
"""

import math

import numpy as np
import pytest

from sleipnir_tpu import Gradient, Variable, VariableMatrix
import sleipnir_tpu as slp


def test_trivial_case():
    a = Variable()
    a.set_value(10)
    b = Variable()
    b.set_value(20)
    c = a

    assert Gradient(a, a).value()[0, 0] == 1.0
    assert Gradient(a, b).value()[0, 0] == 0.0
    assert Gradient(c, a).value()[0, 0] == 1.0
    assert Gradient(c, b).value()[0, 0] == 0.0


def test_unary_minus():
    a = Variable()
    a.set_value(10)
    c = -a

    assert c.value() == -a.value()
    assert Gradient(c, a).value()[0, 0] == -1.0


def test_identical_variables():
    a = Variable()
    a.set_value(10)
    x = a
    c = a * a + x

    assert c.value() == a.value() * a.value() + x.value()
    assert Gradient(c, a).value()[0, 0] == 2 * a.value() + 1


def test_elementary():
    a = Variable()
    a.set_value(1.0)
    b = Variable()
    b.set_value(2.0)
    c = Variable()
    c.set_value(3.0)

    assert Gradient(-2 * a, a).value()[0, 0] == -2.0
    assert Gradient(a / 3.0, a).value()[0, 0] == pytest.approx(1.0 / 3.0)

    a.set_value(100.0)
    b.set_value(200.0)

    assert Gradient(a + b, a).value()[0, 0] == 1.0
    assert Gradient(a - b, a).value()[0, 0] == 1.0
    assert Gradient(-a + b, a).value()[0, 0] == -1.0
    assert Gradient(a + 1, a).value()[0, 0] == 1.0


def test_comparison_value():
    x = Variable()
    x.set_value(10)
    a = Variable()
    a.set_value(10)
    b = Variable()
    b.set_value(200)

    assert a.value() == x.value()
    assert (a + b).value() == (x + b).value()


def test_trig():
    x = Variable()
    x.set_value(0.5)

    assert Gradient(slp.sin(x), x).value()[0, 0] == pytest.approx(math.cos(0.5))
    assert Gradient(slp.cos(x), x).value()[0, 0] == pytest.approx(-math.sin(0.5))
    assert Gradient(slp.tan(x), x).value()[0, 0] == pytest.approx(
        1.0 / math.cos(0.5) ** 2
    )
    assert Gradient(slp.asin(x), x).value()[0, 0] == pytest.approx(
        1.0 / math.sqrt(1 - 0.25)
    )
    assert Gradient(slp.acos(x), x).value()[0, 0] == pytest.approx(
        -1.0 / math.sqrt(1 - 0.25)
    )
    assert Gradient(slp.atan(x), x).value()[0, 0] == pytest.approx(1.0 / 1.25)


def test_exp_log():
    x = Variable()
    x.set_value(3.0)

    assert Gradient(slp.exp(x), x).value()[0, 0] == pytest.approx(math.exp(3.0))
    assert Gradient(slp.log(x), x).value()[0, 0] == pytest.approx(1.0 / 3.0)
    assert Gradient(slp.sqrt(x), x).value()[0, 0] == pytest.approx(
        0.5 / math.sqrt(3.0)
    )
    assert Gradient(x**2, x).value()[0, 0] == pytest.approx(6.0)
    assert Gradient(x**3, x).value()[0, 0] == pytest.approx(27.0)


def test_gradient_of_vector_wrt_matrix():
    x = VariableMatrix(3)
    for i in range(3):
        x[i].set_value(float(i + 1))

    y = x[0] * x[1] + x[2]
    g = Gradient(y, x).value()
    np.testing.assert_allclose(g.ravel(), [2.0, 1.0, 1.0])


def test_reuse_after_set_value():
    a = Variable()
    a.set_value(10)
    b = Variable()
    b.set_value(5)
    g = Gradient(a * b, a)

    assert g.value()[0, 0] == 5.0
    b.set_value(3)
    assert g.value()[0, 0] == 3.0
