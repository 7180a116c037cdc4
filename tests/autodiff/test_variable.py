"""Variable construction/assignment semantics
(reference python/test/autodiff/variable_test.py and
test/src/autodiff/variable_test.cpp).
"""

import warnings

import numpy as np

from sleipnir_tpu import ExpressionType, Variable, VariableMatrix


def test_default_constructor():
    a = Variable()
    assert a.value() == 0.0
    assert a.type() == ExpressionType.LINEAR


def test_constant_constructor():
    # float
    a = Variable(1.0)
    assert a.value() == 1.0
    assert a.type() == ExpressionType.CONSTANT

    # int
    b = Variable(2)
    assert b.value() == 2
    assert b.type() == ExpressionType.CONSTANT


def test_set_value():
    a = Variable()

    # float
    a.set_value(1.0)
    assert a.value() == 1.0

    # int
    a.set_value(2)
    assert a.value() == 2


def test_set_value_on_dependent_warns():
    """Assigning to a dependent variable is ignored with a warning
    (reference autodiff/variable.hpp:126-136)."""
    x = Variable()
    x.set_value(1.0)
    y = x * 2.0
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        y.set_value(7.0)
    assert len(caught) == 1
    assert y.value() == 2.0


def test_reassigned_constant_participates_in_resolve():
    """`Variable(c)` makes a mutable constant whose value set_value can
    change between solves (reference docs/usage.md "Suppressing constant
    pruning")."""
    c = Variable(2.0)
    x = Variable()
    x.set_value(3.0)
    y = c * x
    assert y.value() == 6.0
    c.set_value(5.0)
    assert y.value() == 15.0


def test_arithmetic_types():
    x = Variable()
    x.set_value(3.0)

    assert (x + x).type() == ExpressionType.LINEAR
    assert (x - x).type() == ExpressionType.LINEAR
    assert (2.0 * x).type() == ExpressionType.LINEAR
    assert (x * x).type() == ExpressionType.QUADRATIC
    assert (x / x).type() == ExpressionType.NONLINEAR
    assert (x**2).type() == ExpressionType.QUADRATIC
    assert (x**3).type() == ExpressionType.NONLINEAR

    assert (x + x).value() == 6.0
    assert (x * x).value() == 9.0
    assert (x / x).value() == 1.0
    assert (x**2).value() == 9.0
    assert (-x).value() == -3.0
    assert (+x).value() == 3.0
    assert (1.0 - x).value() == -2.0
    assert (6.0 / x).value() == 2.0
    assert (2.0**x).value() == 8.0


def test_scalar_matrix_interop():
    x = Variable()
    x.set_value(2.0)
    m = VariableMatrix(np.array([[1.0], [2.0]]))
    out = x * m
    assert isinstance(out, VariableMatrix)
    assert np.allclose(out.value(), [[2.0], [4.0]])
    out2 = x + m
    assert np.allclose(out2.value(), [[3.0], [4.0]])
    out3 = x - m
    assert np.allclose(out3.value(), [[1.0], [0.0]])
