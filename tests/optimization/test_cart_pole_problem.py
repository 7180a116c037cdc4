"""Cart-pole swing-up (mirrors reference
test/src/optimization/cart_pole_problem_test.cpp:27-120, with the
plain-double RK4 dynamics oracle, at N=60 for CI time)."""

import math

import numpy as np
import pytest

from sleipnir_tpu import ExitStatus, ExpressionType
from sleipnir_tpu.models.cart_pole import (
    cart_pole_problem,
    dynamics_numpy,
    rk4_numpy,
)

N = 60
TOTAL_TIME = 5.0
U_MAX = 20.0
D_MAX = 2.0


def test_cart_pole_problem():
    problem, X, U = cart_pole_problem(
        N=N, total_time=TOTAL_TIME, u_max=U_MAX, d_max=D_MAX
    )
    dt = TOTAL_TIME / N

    assert problem.cost_function_type() == ExpressionType.QUADRATIC
    assert problem.equality_constraint_type() == ExpressionType.NONLINEAR
    assert problem.inequality_constraint_type() == ExpressionType.LINEAR

    assert problem.solve() == ExitStatus.SUCCESS

    Xv = X.value()
    Uv = U.value()

    # Initial state
    np.testing.assert_allclose(Xv[:, 0], [0, 0, 0, 0], atol=1e-8)

    for k in range(N):
        # Cart position constraints
        assert Xv[0, k] >= -1e-9
        assert Xv[0, k] <= D_MAX + 1e-9

        # Input constraints
        assert Uv[0, k] >= -U_MAX - 1e-9
        assert Uv[0, k] <= U_MAX + 1e-9

        # Dynamics constraints vs a plain-double RK4 rollout
        expected = rk4_numpy(
            dynamics_numpy, Xv[:, k : k + 1], Uv[:, k : k + 1], dt
        )
        np.testing.assert_allclose(
            Xv[:, k + 1], expected.ravel(), atol=1e-8,
            err_msg=f"dynamics constraint at k={k}",
        )

    # Final state
    np.testing.assert_allclose(
        Xv[:, N], [1.0, math.pi, 0.0, 0.0], atol=1e-8
    )


def test_cart_pole_problem_n100_flagship():
    """Flagship benchmark size (BASELINE.md: Sleipnir solves N=100 in
    278 ms; reference benchmarks/scalability/cart_pole/main.cpp). This is
    the regression test for the slack-desynchronization failure where the
    line search collapsed at a feasible iterate and restoration
    misreported LOCALLY_INFEASIBLE (fixed by the in-solver slack resync in
    interior_point.py fr_update)."""
    problem, X, U = cart_pole_problem(
        N=100, total_time=TOTAL_TIME, u_max=U_MAX, d_max=D_MAX
    )
    assert problem.solve() == ExitStatus.SUCCESS
    Xv = X.value()
    np.testing.assert_allclose(Xv[:, 0], [0, 0, 0, 0], atol=1e-8)
    np.testing.assert_allclose(
        Xv[:, 100], [1.0, math.pi, 0.0, 0.0], atol=1e-6
    )
    st = problem._last_state
    # The iterate must be genuinely feasible with synchronized slacks.
    assert float(np.linalg.norm(np.asarray(st.c_e))) < 1e-6
    assert float(np.min(np.asarray(st.c_i))) >= -1e-10
    assert float(np.sum(np.abs(np.asarray(st.c_i) - np.asarray(st.s)))) < 1e-6
