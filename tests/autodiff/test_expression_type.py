"""Expression linearity classification and simplification tests (mirrors
reference test/src/autodiff/expression_test.cpp's 28 simplification cases
and expression_type semantics)."""

import numpy as np

import sleipnir_tpu as slp
from sleipnir_tpu import ExpressionType, Variable, VariableMatrix
from sleipnir_tpu.autodiff import expression as ex


def test_default_variable_is_linear():
    assert Variable().type() == ExpressionType.LINEAR


def test_literal_constant():
    # A Variable built from a number is a (mutable) constant
    assert Variable(5.0).type() == ExpressionType.CONSTANT


def test_sum_types():
    x = Variable()
    assert (x + 1).type() == ExpressionType.LINEAR
    assert (x + x).type() == ExpressionType.LINEAR
    assert (x * x + x).type() == ExpressionType.QUADRATIC
    assert (slp.sin(x) + x).type() == ExpressionType.NONLINEAR


def test_product_types():
    x, y = Variable(), Variable()
    assert (2 * x).type() == ExpressionType.LINEAR
    assert (x * y).type() == ExpressionType.QUADRATIC
    assert (x * x * x).type() == ExpressionType.NONLINEAR
    assert (x * x * 3.0).type() == ExpressionType.QUADRATIC


def test_division_types():
    x, y = Variable(), Variable()
    assert (x / 2).type() == ExpressionType.LINEAR
    assert (x / y).type() == ExpressionType.NONLINEAR


def test_pow_types():
    x = Variable()
    assert (x**1).type() == ExpressionType.LINEAR
    assert (x**2).type() == ExpressionType.QUADRATIC
    assert (x**3).type() == ExpressionType.NONLINEAR
    assert slp.pow(x, 2).type() == ExpressionType.QUADRATIC


def test_nonlinear_functions():
    x = Variable()
    for fn in [slp.sin, slp.cos, slp.exp, slp.log, slp.sqrt, slp.tanh]:
        assert fn(x).type() == ExpressionType.NONLINEAR


def test_constant_folding():
    # Pure literals fold at construction (reference
    # expression.hpp:155-343 pruning)
    e = ex.add(ex.constant(2.0), ex.constant(3.0))
    assert isinstance(e, ex.ConstExpr)
    assert float(e.value) == 5.0

    e = ex.mul(ex.constant(0.0), ex.new_decision_vars(()))
    assert isinstance(e, ex.ConstExpr)
    assert float(e.value) == 0.0


def test_identity_pruning():
    x = ex.new_decision_vars(())
    assert ex.add(x, ex.constant(0.0)) is x
    assert ex.mul(ex.constant(1.0), x) is x
    assert ex.div(x, ex.constant(1.0)) is x
    assert ex.pow_const(x, 1.0) is x


def test_parameters_do_not_fold():
    # Mutable constants (parameters) survive in the graph and re-feed
    p = Variable(2.0)
    x = Variable()
    x.set_value(3.0)
    e = p * x
    assert e.value() == 6.0
    p.set_value(5.0)
    assert e.value() == 15.0


def test_matrix_quadratic_form():
    x = VariableMatrix(3)
    Q = np.eye(3)
    expr = x.T @ VariableMatrix(Q) @ x
    assert expr.type() == ExpressionType.QUADRATIC
