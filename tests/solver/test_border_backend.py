"""Arrowhead (band + border) KKT backend tests: variable-timestep OCPs
route through the banded path instead of the dense O(N³) fallback
(reference ocp.hpp:121-142 TimestepMethod; VERDICT r3 task 6)."""

import warnings

import numpy as np
import pytest

import jax.numpy as jnp

from sleipnir_tpu import (
    DynamicsType,
    ExitStatus,
    OCP,
    TimestepMethod,
    TranscriptionMethod,
)


def _double_integrator(x, u):
    return jnp.stack([x[1, 0], u[0, 0]]).reshape(2, 1)


def _min_time_double_integrator(N, method):
    ocp = OCP(
        2,
        1,
        0.05,
        N,
        _double_integrator,
        DynamicsType.EXPLICIT_ODE,
        method,
        TranscriptionMethod.DIRECT_TRANSCRIPTION,
    )
    ocp.constrain_initial_state(np.array([[0.0], [0.0]]))
    ocp.constrain_final_state(np.array([[1.0], [0.0]]))
    ocp.set_lower_input_bound(-1.0)
    ocp.set_upper_input_bound(1.0)
    ocp.set_min_timestep(1e-3)
    ocp.set_max_timestep(1.0)
    if method == TimestepMethod.VARIABLE_SINGLE:
        ocp.minimize(ocp.dt()[0, 0] * N)
    else:
        ocp.minimize(ocp.dt()[0, :].sum())
    return ocp


def test_variable_single_uses_border_banded_backend():
    """The shared-dt column becomes a border variable — no dense fallback."""
    ocp = _min_time_double_integrator(20, TimestepMethod.VARIABLE_SINGLE)
    comp = ocp._compile()
    structure = ocp._stage_structure(comp)
    assert structure is not None
    assert structure.border.shape == (1,)
    assert structure.stage_width == 3  # (x0, x1, u)


def test_variable_per_step_folds_into_band():
    """Per-step dt variables widen the stage instead of bordering."""
    ocp = _min_time_double_integrator(20, TimestepMethod.VARIABLE)
    comp = ocp._compile()
    structure = ocp._stage_structure(comp)
    assert structure is not None
    assert structure.border.shape == (0,)
    assert structure.stage_width == 4  # (x0, x1, u, dt)


@pytest.mark.parametrize(
    "method", [TimestepMethod.VARIABLE_SINGLE, TimestepMethod.VARIABLE]
)
def test_min_time_solves_through_banded_path(method):
    """Bang-bang min-time optimum (total time 2 s) with NO dense-fallback
    warning (the audible-fallback contract from round 2)."""
    N = 40
    ocp = _min_time_double_integrator(N, method)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        status = ocp.solve()
    assert status == ExitStatus.SUCCESS
    total = float(np.sum([ocp.dt().value(0, k) for k in range(N)]))
    assert total == pytest.approx(2.0, abs=2e-2)


def test_min_time_flywheel_banded_n1000():
    """Minimum-time flywheel at N=1000 through the banded path (VERDICT
    r3 task 6 'done' criterion): spin up to 100 rad/s in minimum time."""
    N = 1000

    def flywheel(x, u):
        # dx/dt = -x/5 + 2u  (reference benchmarks/scalability/flywheel)
        return (-x[0, 0] / 5.0 + 2.0 * u[0, 0]).reshape(1, 1)

    ocp = OCP(
        1,
        1,
        0.01,
        N,
        flywheel,
        DynamicsType.EXPLICIT_ODE,
        TimestepMethod.VARIABLE_SINGLE,
        TranscriptionMethod.DIRECT_TRANSCRIPTION,
    )
    ocp.constrain_initial_state(np.array([[0.0]]))
    ocp.constrain_final_state(np.array([[50.0]]))
    ocp.set_lower_input_bound(-12.0)
    ocp.set_upper_input_bound(12.0)
    ocp.set_min_timestep(1e-4)
    ocp.set_max_timestep(1.0)
    ocp.minimize(ocp.dt()[0, 0] * N)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        status = ocp.solve()
    assert status == ExitStatus.SUCCESS
    # Steady state at u=12 is x = 5*2*12 = 120 > 50, reachable; the
    # optimum rides u = +12 the whole way:
    # dt* solves 120(1-exp(-T/5)) = 50 -> T = -5 ln(1 - 50/120)
    T_star = -5.0 * np.log(1.0 - 50.0 / 120.0)
    total = float(ocp.dt().value(0, 0)) * N
    assert total == pytest.approx(T_star, rel=1e-3)


def test_border_solution_matches_dense_backend():
    """The arrowhead solve agrees with the dense backend on the IDENTICAL
    problem (same OCP, same start; only the KKT backend differs)."""
    N = 12
    ocp = _min_time_double_integrator(N, TimestepMethod.VARIABLE_SINGLE)
    assert ocp.solve() == ExitStatus.SUCCESS
    dt_banded = ocp.dt().value(0, 0)
    iters_banded = int(ocp._last_state.iterations)

    ocp2 = _min_time_double_integrator(N, TimestepMethod.VARIABLE_SINGLE)
    ocp2._make_kkt_backend = lambda comp, options, dtype: None  # force dense
    assert ocp2.solve() == ExitStatus.SUCCESS
    dt_dense = ocp2.dt().value(0, 0)
    assert dt_banded * N == pytest.approx(dt_dense * N, rel=1e-6)
    # Same trajectory class: iteration counts in the same ballpark
    assert iters_banded <= 3 * int(ocp2._last_state.iterations) + 20
