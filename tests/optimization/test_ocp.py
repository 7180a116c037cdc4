"""OCP-class tests (mirrors reference
test/src/optimization/flywheel_ocp_test.cpp and cart_pole_ocp_test.cpp,
reduced sizes): transcription methods, timestep methods, accessors."""

import math

import numpy as np
import pytest

import sleipnir_tpu as slp
from sleipnir_tpu import (
    OCP,
    DynamicsType,
    ExitStatus,
    TimestepMethod,
    TranscriptionMethod,
)


def flywheel_ode(x, u):
    # dx/dt = -x + u (continuous analog of the flywheel model)
    return -x + u


def test_flywheel_ocp_explicit_direct_transcription():
    N = 50
    dt = 0.1

    ocp = OCP(
        1,
        1,
        dt,
        N,
        flywheel_ode,
        DynamicsType.EXPLICIT_ODE,
        TimestepMethod.FIXED,
        TranscriptionMethod.DIRECT_TRANSCRIPTION,
    )
    ocp.constrain_initial_state(0.0)
    ocp.set_lower_input_bound(-12)
    ocp.set_upper_input_bound(12)

    r = 10.0
    err = r - ocp.X()
    ocp.minimize((err**2).sum())

    assert ocp.solve() == ExitStatus.SUCCESS

    # Velocity should approach the reference from below and stay ≤ r
    Xv = ocp.X().value()
    assert Xv[0, 0] == pytest.approx(0.0, abs=1e-8)
    assert Xv[0, -1] == pytest.approx(r, abs=1e-1)


def test_flywheel_ocp_discrete_dynamics():
    N = 50
    dt = 0.1
    A = math.exp(-dt)
    B = 1.0 - math.exp(-dt)

    def discrete(x, u):
        return A * x + B * u

    ocp = OCP(
        1,
        1,
        dt,
        N,
        discrete,
        DynamicsType.DISCRETE,
        TimestepMethod.FIXED,
        TranscriptionMethod.DIRECT_TRANSCRIPTION,
    )
    ocp.constrain_initial_state(0.0)
    ocp.set_lower_input_bound(-12)
    ocp.set_upper_input_bound(12)
    err = 10.0 - ocp.X()
    ocp.minimize((err**2).sum())

    assert ocp.solve() == ExitStatus.SUCCESS
    Xv = ocp.X().value()
    Uv = ocp.U().value()
    # Dynamics satisfied
    for k in range(N):
        assert Xv[0, k + 1] == pytest.approx(
            A * Xv[0, k] + B * Uv[0, k], abs=1e-8
        )


def test_flywheel_ocp_direct_collocation():
    N = 30
    dt = 0.1

    ocp = OCP(
        1,
        1,
        dt,
        N,
        flywheel_ode,
        DynamicsType.EXPLICIT_ODE,
        TimestepMethod.FIXED,
        TranscriptionMethod.DIRECT_COLLOCATION,
    )
    ocp.constrain_initial_state(0.0)
    ocp.set_lower_input_bound(-12)
    ocp.set_upper_input_bound(12)
    err = 10.0 - ocp.X()
    ocp.minimize((err**2).sum())

    assert ocp.solve() == ExitStatus.SUCCESS
    assert ocp.X().value(0, N) == pytest.approx(10.0, abs=0.5)


def test_double_integrator_minimum_time_variable_single():
    # Mirrors the spirit of reference cart_pole_ocp_test minimum-time
    # problems: double integrator reaching a target with dt as a single
    # decision variable.
    N = 20

    def double_integrator(x, u):
        import jax.numpy as jnp

        return jnp.stack([x[1, 0], u[0, 0]]).reshape(2, 1)

    ocp = OCP(
        2,
        1,
        0.05,
        N,
        double_integrator,
        DynamicsType.EXPLICIT_ODE,
        TimestepMethod.VARIABLE_SINGLE,
        TranscriptionMethod.DIRECT_TRANSCRIPTION,
    )
    ocp.constrain_initial_state(np.array([[0.0], [0.0]]))
    ocp.constrain_final_state(np.array([[1.0], [0.0]]))
    ocp.set_lower_input_bound(-1.0)
    ocp.set_upper_input_bound(1.0)
    ocp.set_min_timestep(1e-3)
    ocp.set_max_timestep(1.0)

    # Minimize total time = N * dt
    ocp.minimize(ocp.dt()[0, 0] * N)

    assert ocp.solve() == ExitStatus.SUCCESS
    # Bang-bang optimum: total time = 2*sqrt(1) = 2 s
    total = ocp.dt().value(0, 0) * N
    assert total == pytest.approx(2.0, abs=1e-2)


def test_single_shooting():
    N = 10
    dt = 0.1

    ocp = OCP(
        1,
        1,
        dt,
        N,
        lambda x, u: -x + u,
        DynamicsType.EXPLICIT_ODE,
        TimestepMethod.FIXED,
        TranscriptionMethod.SINGLE_SHOOTING,
    )
    ocp.set_lower_input_bound(-12)
    ocp.set_upper_input_bound(12)
    err = 10.0 - ocp.X()
    ocp.minimize((err**2).sum())

    assert ocp.solve() == ExitStatus.SUCCESS
    # With u = 12 throughout (the optimum), x(1 s) = 12(1 − e⁻¹) ≈ 7.59
    assert ocp.X().value(0, N) == pytest.approx(
        12.0 * (1.0 - math.exp(-1.0)), abs=0.2
    )


def test_for_each_step():
    N = 5
    ocp = OCP(1, 1, 0.1, N, lambda x, u: -x + u)
    seen = []
    ocp.for_each_step(lambda x, u: seen.append((x.shape, u.shape)))
    assert len(seen) == N + 1
    assert all(s == ((1, 1), (1, 1)) for s in seen)
