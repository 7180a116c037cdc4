"""Structured (banded) feasibility restoration.

The restoration subproblem of a stage-banded OCP is itself stage-banded
(relaxation variables p/n are stage-local), so restoration must scale
O(N) and never materialize dense derivatives (reference
feasibility_restoration.hpp:347-628 via Eigen sparse)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sleipnir_tpu.models.cart_pole import cart_pole_problem
from sleipnir_tpu.optimization.solver.exit_status import ExitStatus
from sleipnir_tpu.optimization.solver.funcs import ScalingArrays
from sleipnir_tpu.optimization.solver.kkt_banded import BandedBackend
from sleipnir_tpu.optimization.solver.options import Options
from sleipnir_tpu.optimization.solver.util.feasibility_restoration import (
    restore,
)


def _violated_state(N, total_time, seed=7, scale=0.5):
    """An IPM state at a strongly infeasible iterate of a banded cart-pole."""
    problem, X, U = cart_pole_problem(N=N, total_time=total_time)
    options = Options()
    comp, bundle = problem.prepare_ipm(options)
    init, funcs, backend = bundle[0], bundle[3], bundle[-1]
    assert isinstance(backend, BandedBackend)
    params = comp["compiled"].gather_params()
    rng = np.random.default_rng(seed)
    x0 = scale * rng.standard_normal(comp["n"])
    scaling, _ = problem.compute_ipm_scaling(comp, bundle, x0, params)
    sc = ScalingArrays(
        f=jnp.asarray(scaling.f),
        c_e=jnp.asarray(scaling.c_e),
        c_i=jnp.asarray(scaling.c_i),
    )
    state = init(
        x0,
        np.ones(comp["mi"]),
        np.zeros(comp["me"]),
        np.ones(comp["mi"]),
        0.1 * scaling.f,
        0,
        params,
        sc,
    )
    return problem, comp, funcs, backend, state, options


def _viol(funcs, state, x):
    ce = np.asarray(
        funcs.c_e(jnp.asarray(x), state.params, state.scaling)
    )
    ci = np.asarray(
        funcs.c_i(jnp.asarray(x), state.params, state.scaling)
    )
    return np.sum(np.abs(ce)) + np.sum(np.abs(np.minimum(ci, 0.0)))


def test_banded_restoration_reduces_violation_small():
    problem, comp, funcs, backend, state, options = _violated_state(8, 1.0)
    v0 = _viol(funcs, state, np.asarray(state.x))
    assert v0 > 1e-2  # genuinely violated start
    outcome, x_n, s_n, y_n, z_n, iters = restore(
        funcs, state, options, parent_backend=backend
    )
    # Restoration early-stops as soon as the parent filter accepts a
    # sufficiently-improved point (reference interior_point.hpp:738-756),
    # so "resume" with a ~10% violation cut is the designed behavior.
    assert outcome == "resume", outcome
    v1 = _viol(funcs, state, x_n)
    assert v1 < 0.95 * v0
    assert y_n.shape == (comp["me"],)
    assert np.all(s_n > 0.0)


def test_banded_restoration_long_horizon():
    """N=2000 (restoration problem ≈ 58k variables): must run in O(N)
    memory through the banded backend and recover a low-violation point."""
    problem, comp, funcs, backend, state, options = _violated_state(
        2000, 5.0, scale=0.3
    )
    v0 = _viol(funcs, state, np.asarray(state.x))
    assert v0 > 1.0
    outcome, x_n, s_n, y_n, z_n, iters = restore(
        funcs, state, options, parent_backend=backend
    )
    assert outcome == "resume", outcome
    v1 = _viol(funcs, state, x_n)
    assert v1 < 0.95 * v0, (v0, v1, outcome)
