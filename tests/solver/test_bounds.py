"""Bound-constraint detection (reference
test/src/optimization/solver/util/bounds_test.cpp "Bounds - Detection" and
"Bounds - Projection").
"""

import math

import numpy as np

from sleipnir_tpu import Jacobian, Variable, VariableMatrix, sin
from sleipnir_tpu.autodiff.expression_type import ExpressionType
from sleipnir_tpu.optimization.solver.util.bounds import (
    get_bounds,
    project_onto_bounds,
)

inf = math.inf


def test_bounds_detection():
    x, y, z, w, v = (Variable() for _ in range(5))
    decision_variables = [x, y, z, w, v]

    a = -z - 1e-12
    # Each entry implies a constraint of the form c(x) >= 0
    # (mirrors reference bounds_test.cpp:36-49)
    constraint_variables = [
        x + y - 3.0,
        x * y,
        Variable(3.0),
        x - 3.0,
        x - 4.0,
        (3.0 + 4.0 * y - y) * 4.0,
        sin(w),
        a,
        -z,
        v - 8.0,
        -v + 8.0,
        -v + 7.0,
        -v + 6.5,
    ]

    correct_bounds = [
        (4.0, inf),
        (-1.0, inf),
        (-inf, -1e-12),
        (-inf, inf),
        (8.0, 6.5),
    ]
    correct_mask = [
        False, False, False, True, True, True, False,
        True, True, True, True, True, True,
    ]
    correct_conflicts = [(9, 11), (9, 12)]

    x_ad = VariableMatrix([decision_variables]).T
    c_i_ad = VariableMatrix([constraint_variables]).T
    A_i = Jacobian(c_i_ad, x_ad).value()

    x0 = np.zeros(5)
    c_i0 = np.array([cv.value() for cv in constraint_variables])
    row_is_linear = np.array(
        [cv.type() <= ExpressionType.LINEAR for cv in constraint_variables]
    )

    bounds = get_bounds(x0, c_i0, np.asarray(A_i), row_is_linear)

    for i, (lo, hi) in enumerate(correct_bounds):
        assert bounds.lower[i] == lo, i
        assert bounds.upper[i] == hi, i
    assert list(bounds.bound_constraint_mask) == correct_mask
    assert sorted(bounds.conflicting_bound_indices) == correct_conflicts


def test_bounds_projection():
    """Projection into bounds with Ipopt §3.6 margins
    (reference bounds_test.cpp "Bounds - Projection")."""
    lower = np.array([0.0, -inf, 1.0, -inf])
    upper = np.array([1.0, 2.0, inf, inf])
    x = np.array([-5.0, 50.0, -10.0, 123.0])
    out = project_onto_bounds(x, lower, upper)
    # Interior margins: kappa_1 = kappa_2 = 1e-2
    assert out[0] == min(max(0.0 + 1e-2, -5.0), 1.0 - 1e-2)
    assert out[1] == 2.0 - 1e-2 * 2.0
    assert out[2] == 1.0 + 1e-2
    assert out[3] == 123.0  # unbounded stays put
    # Already-interior points are unchanged
    x2 = np.array([0.5, 0.0, 2.0, 0.0])
    out2 = project_onto_bounds(x2, lower, upper)
    assert np.allclose(out2, x2)
