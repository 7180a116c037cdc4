"""Constraint comparison-operator tests (mirrors reference
python/test/optimization/constraints_test.py)."""

import numpy as np

from sleipnir_tpu import Variable, VariableMatrix

ARGS = [(1.0, 1.0), (1.0, 2.0), (2.0, 1.0)]


def test_equality_constraint_boolean_comparisons():
    for lhs, rhs in ARGS:
        assert bool(float(lhs) == Variable(rhs)) == (lhs == rhs)
        assert bool(float(lhs) == VariableMatrix([[rhs]])) == (lhs == rhs)
        assert bool(Variable(lhs) == float(rhs)) == (lhs == rhs)
        assert bool(Variable(lhs) == Variable(rhs)) == (lhs == rhs)
        assert bool(Variable(lhs) == VariableMatrix([[rhs]])) == (lhs == rhs)
        assert bool(VariableMatrix([[lhs]]) == float(rhs)) == (lhs == rhs)
        assert bool(VariableMatrix([[lhs]]) == Variable(rhs)) == (lhs == rhs)
        assert bool(VariableMatrix([[lhs]]) == VariableMatrix([[rhs]])) == (
            lhs == rhs
        )
        assert bool(np.array([[lhs]]) == VariableMatrix([[rhs]])) == (
            lhs == rhs
        )
        assert bool(np.array([[lhs]]) == VariableMatrix([[rhs]])[:, :]) == (
            lhs == rhs
        )
        assert bool(VariableMatrix([[lhs]]) == np.array([[rhs]])) == (
            lhs == rhs
        )
        assert bool(VariableMatrix([[lhs]])[:, :] == np.array([[rhs]])) == (
            lhs == rhs
        )


def test_inequality_constraint_boolean_comparisons():
    # For optimization purposes < is treated the same as <=
    for lhs, rhs in ARGS:
        assert bool(float(lhs) < Variable(rhs)) == (lhs <= rhs)
        assert bool(float(lhs) <= Variable(rhs)) == (lhs <= rhs)
        assert bool(float(lhs) > Variable(rhs)) == (lhs >= rhs)
        assert bool(float(lhs) >= Variable(rhs)) == (lhs >= rhs)
        assert bool(Variable(lhs) < Variable(rhs)) == (lhs <= rhs)
        assert bool(Variable(lhs) <= Variable(rhs)) == (lhs <= rhs)
        assert bool(Variable(lhs) > Variable(rhs)) == (lhs >= rhs)
        assert bool(Variable(lhs) >= Variable(rhs)) == (lhs >= rhs)
        assert bool(VariableMatrix([[lhs]]) < VariableMatrix([[rhs]])) == (
            lhs <= rhs
        )
        assert bool(VariableMatrix([[lhs]]) >= np.array([[rhs]])) == (
            lhs >= rhs
        )


def test_constraint_concatenation():
    from sleipnir_tpu import EqualityConstraints, InequalityConstraints

    x = Variable(1.0)
    y = Variable(2.0)
    both = EqualityConstraints([x == 1.0, y == 2.0])
    assert bool(both)
    both_bad = EqualityConstraints([x == 1.0, y == 3.0])
    assert not bool(both_bad)

    ineq = InequalityConstraints([x >= 0.0, y >= 0.0])
    assert bool(ineq)
