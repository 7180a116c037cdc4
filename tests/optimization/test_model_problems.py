"""Model-family problems: double integrator and differential drive
(mirrors reference double_integrator_problem_test.py and
differential_drive_problem_test, reduced sizes)."""

import numpy as np
import pytest

from sleipnir_tpu import ExitStatus
from sleipnir_tpu.models.differential_drive import (
    differential_drive_problem,
    dynamics_numpy,
)
from sleipnir_tpu.models.double_integrator import double_integrator_problem


def test_double_integrator():
    N = 70
    T = 3.5
    r = 2.0
    problem, X, U = double_integrator_problem(N=N, total_time=T, r=r)
    dt = T / N

    assert problem.solve() == ExitStatus.SUCCESS

    Xv, Uv = X.value(), U.value()
    np.testing.assert_allclose(Xv[:, 0], [0.0, 0.0], atol=1e-8)
    np.testing.assert_allclose(Xv[:, N], [r, 0.0], atol=1e-8)

    # Exact discrete kinematics respected
    for k in range(N):
        assert Xv[0, k + 1] == pytest.approx(
            Xv[0, k] + Xv[1, k] * dt + 0.5 * Uv[0, k] * dt * dt, abs=1e-8
        )
        assert Xv[1, k + 1] == pytest.approx(
            Xv[1, k] + Uv[0, k] * dt, abs=1e-8
        )
    # Limits
    assert np.all(np.abs(Xv[1]) <= 1.0 + 1e-9)
    assert np.all(np.abs(Uv[0, :N]) <= 1.0 + 1e-9)


def test_differential_drive():
    N = 40
    T = 4.0
    problem, X, U = differential_drive_problem(N=N, total_time=T)
    dt = T / N

    assert problem.solve() == ExitStatus.SUCCESS

    Xv, Uv = X.value(), U.value()
    np.testing.assert_allclose(Xv[:, 0], np.zeros(5), atol=1e-8)
    np.testing.assert_allclose(
        Xv[:, N], [1.0, 1.0, 0.0, 0.0, 0.0], atol=1e-7
    )

    # RK4 dynamics respected against the plain-double oracle
    def rk4(x, u):
        k1 = dynamics_numpy(x, u)
        k2 = dynamics_numpy(x + dt / 2 * k1, u)
        k3 = dynamics_numpy(x + dt / 2 * k2, u)
        k4 = dynamics_numpy(x + dt * k3, u)
        return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    for k in range(N):
        expected = rk4(Xv[:, k : k + 1], Uv[:, k : k + 1])
        np.testing.assert_allclose(
            Xv[:, k + 1], expected.ravel(), atol=1e-7,
            err_msg=f"dynamics at k={k}",
        )
