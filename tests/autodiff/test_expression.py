"""Expression constant-folding and identity-pruning semantics
(reference test/src/autodiff/expression_test.cpp: "Prune multiply" :49,
"Prune divide" :65, "Prune binary plus" :78, "Prune binary minus" :93,
"Prune unary minus" :119, per-function pruning cases :128-393).

These exercise the Expr constructor layer directly: constructors must
constant-fold when all children are constant and prune algebraic
identities (reference autodiff/expression.hpp:155-343).
"""

import math

import numpy as np
import pytest

from sleipnir_tpu.autodiff import expression as ex
from sleipnir_tpu.autodiff.expression_type import ExpressionType


def const(v):
    return ex.constant(float(v))


def is_constant(e, v) -> bool:
    return isinstance(e, ex.ConstExpr) and bool(np.all(e.value == v))


zero = const(0)
one = const(1)
two = const(2)


def test_prune_multiply():
    assert is_constant(ex.mul(zero, one), 0)
    assert is_constant(ex.mul(zero, two), 0)
    assert is_constant(ex.mul(one, zero), 0)
    assert ex.mul(one, one) is one
    assert ex.mul(one, two) is two
    assert ex.mul(two, one) is two
    # 0 * x prunes without evaluating x
    x = ex.new_decision_vars(())
    assert is_constant(ex.mul(zero, x), 0)
    assert ex.mul(one, x) is x


def test_prune_divide():
    assert is_constant(ex.div(zero, one), 0)
    assert ex.div(one, one) is one
    assert ex.div(two, one) is two
    x = ex.new_decision_vars(())
    assert ex.div(x, one) is x


def test_prune_binary_plus():
    assert is_constant(ex.add(zero, zero), 0)
    assert ex.add(zero, one) is one
    assert ex.add(zero, two) is two
    assert ex.add(one, zero) is one
    assert ex.add(two, zero) is two
    x = ex.new_decision_vars(())
    assert ex.add(zero, x) is x
    assert ex.add(x, zero) is x


def test_prune_binary_minus():
    assert is_constant(ex.sub(zero, zero), 0)
    assert ex.sub(one, zero) is one
    assert ex.sub(two, zero) is two
    x = ex.new_decision_vars(())
    assert ex.sub(x, zero) is x


def test_prune_unary_minus():
    assert is_constant(ex.neg(zero), 0)


@pytest.mark.parametrize(
    ("op", "arg", "expected"),
    [
        ("abs", -2.0, 2.0),
        ("acos", 1.0, 0.0),
        ("asin", 0.0, 0.0),
        ("atan", 1.0, math.atan(1.0)),
        ("cbrt", 8.0, 2.0),
        ("cos", 0.0, 1.0),
        ("cosh", 0.0, 1.0),
        ("erf", 0.0, 0.0),
        ("exp", 1.0, math.e),
        ("log", 1.0, 0.0),
        ("log10", 100.0, 2.0),
        ("sign", -2.0, -1.0),
        ("sign", 2.0, 1.0),
        ("sin", 0.0, 0.0),
        ("sinh", 0.0, 0.0),
        ("sqrt", 4.0, 2.0),
        ("tan", 0.0, 0.0),
        ("tanh", 0.0, 0.0),
    ],
)
def test_prune_unary_functions(op, arg, expected):
    """Nonlinear functions of constants fold to constants
    (reference expression_test.cpp:128-393)."""
    out = ex.unary(op, const(arg))
    assert isinstance(out, ex.ConstExpr)
    assert float(out.value) == pytest.approx(expected, abs=1e-15)


@pytest.mark.parametrize(
    ("op", "a", "b", "expected"),
    [
        ("atan2", 0.0, 1.0, 0.0),
        ("hypot", 3.0, 4.0, 5.0),
        ("maximum", 2.0, 3.0, 3.0),
        ("minimum", 2.0, 3.0, 2.0),
    ],
)
def test_prune_binary_functions(op, a, b, expected):
    out = ex.binary_nonlinear(op, const(a), const(b))
    assert isinstance(out, ex.ConstExpr)
    assert float(out.value) == pytest.approx(expected, abs=1e-15)


def test_prune_pow():
    # Base pruning first, matching reference expression.hpp:1722-1724 and
    # expression_test.cpp:310: pow(0, 0) folds to 0, not IEEE pow's 1.
    assert is_constant(ex.pow_expr(zero, zero), 0)
    assert is_constant(ex.pow_expr(zero, one), 0)
    assert is_constant(ex.pow_expr(zero, two), 0)
    assert is_constant(ex.pow_expr(one, zero), 1)
    assert is_constant(ex.pow_expr(one, one), 1)
    assert is_constant(ex.pow_expr(one, two), 1)
    assert is_constant(ex.pow_expr(two, zero), 1)
    assert is_constant(ex.pow_expr(two, one), 2)
    assert is_constant(ex.pow_expr(two, two), 4)
    x = ex.new_decision_vars(())
    assert ex.pow_const(x, 1) is x
    assert is_constant(ex.pow_const(x, 0), 1)


def test_linearity_propagation():
    """Result linearity classes (reference expression.hpp:196-197, :262,
    :1740-1748 and expression_type.hpp:15-27)."""
    x = ex.new_decision_vars(())
    assert x.lin == ExpressionType.LINEAR
    assert ex.add(x, x).lin == ExpressionType.LINEAR
    assert ex.mul(two, x).lin == ExpressionType.LINEAR
    assert ex.mul(x, x).lin == ExpressionType.QUADRATIC
    assert ex.mul(ex.mul(x, x), x).lin == ExpressionType.NONLINEAR
    assert ex.div(x, x).lin == ExpressionType.NONLINEAR
    assert ex.div(x, two).lin == ExpressionType.LINEAR
    assert ex.pow_const(x, 2).lin == ExpressionType.QUADRATIC
    assert ex.pow_const(x, 3).lin == ExpressionType.NONLINEAR
    assert ex.unary("sin", x).lin == ExpressionType.NONLINEAR
    assert ex.unary("sin", two).lin == ExpressionType.CONSTANT
    # max of operand types for +/- (reference expression.hpp:262)
    q = ex.mul(x, x)
    assert ex.add(q, x).lin == ExpressionType.QUADRATIC
    assert ex.sub(x, q).lin == ExpressionType.QUADRATIC


def test_fold_evaluates_correctly():
    """Constant subtrees evaluate identically to numpy."""
    e = ex.add(ex.mul(two, two), ex.unary("sqrt", const(9.0)))
    assert isinstance(e, ex.ConstExpr)
    assert float(e.value) == 7.0
