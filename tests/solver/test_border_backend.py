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


def test_border_dense_reconstruction_matches_autodiff():
    """backend.dense() (the observability path used by callbacks/spy)
    must reproduce the full H/A_e/A_i including the border column."""
    import jax
    import jax.numpy as jnp

    from sleipnir_tpu.optimization.solver.funcs import bind, ScalingArrays
    from sleipnir_tpu.optimization.solver.options import Options

    ocp = _min_time_double_integrator(8, TimestepMethod.VARIABLE_SINGLE)
    comp, bundle = ocp.prepare_ipm(Options())
    funcs = bundle[3]
    backend = bundle[-1]
    assert backend.nb == 1

    n, me, mi = comp["n"], comp["me"], comp["mi"]
    rng = np.random.default_rng(3)
    x = jnp.asarray(0.1 + 0.05 * rng.standard_normal(n))
    y = jnp.asarray(rng.standard_normal(me))
    z = jnp.asarray(0.5 + 0.1 * rng.standard_normal(mi) ** 2)
    params = jnp.asarray(comp["compiled"].gather_params())
    sc = ScalingArrays(
        f=jnp.asarray(1.0), c_e=jnp.ones(me), c_i=jnp.ones(mi)
    )
    F = bind(funcs, params, sc, jnp.float64)
    d = backend.eval_derivs(F, x, y, z)
    H, A_e, A_i = backend.dense(d)

    # Oracles from plain dense autodiff of the same functions
    ce = lambda xv: sc.c_e * backend.ce_raw(xv, params)  # noqa: E731
    ci = lambda xv: sc.c_i * backend.ci_raw(xv, params)  # noqa: E731
    A_e_ref = np.asarray(jax.jacfwd(ce)(x))
    A_i_ref = np.asarray(jax.jacfwd(ci)(x))

    def lag(xv):
        out = sc.f * backend.f_raw(xv, params)
        out = out - (sc.c_e * y) @ backend.ce_raw(xv, params)
        out = out - (sc.c_i * z) @ backend.ci_raw(xv, params)
        return out

    H_ref = np.asarray(jax.hessian(lag)(x))
    np.testing.assert_allclose(A_e, A_e_ref, atol=1e-10)
    np.testing.assert_allclose(A_i, A_i_ref, atol=1e-10)
    np.testing.assert_allclose(H, H_ref, atol=1e-8)
