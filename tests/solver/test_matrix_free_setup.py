"""Matrix-free setup (scaling + bound detection) for stage-structured
problems: row norms and bound rows come from the banded backend's colored
probes, never a dense (m, n) Jacobian (reference problem_scaling.hpp:58-110
and bounds.hpp:55-184 work from sparse triplets the same way)."""

import numpy as np
import jax

import sleipnir_tpu as slp
from sleipnir_tpu.models.cart_pole import cart_pole_problem
from sleipnir_tpu.optimization.solver.kkt_banded import BandedBackend
from sleipnir_tpu.optimization.solver.options import Options
from sleipnir_tpu.optimization.solver.util.bounds import (
    get_bounds,
    get_bounds_rows,
)
from sleipnir_tpu.optimization.solver.util.problem_scaling import (
    ProblemScaling,
)


def test_matrix_free_setup_matches_dense():
    problem, X, U = cart_pole_problem(N=8, total_time=1.0)
    comp, cached = problem.prepare_ipm(Options())
    backend = cached[-1]
    assert isinstance(backend, BandedBackend)
    params = comp["compiled"].gather_params()
    rng = np.random.default_rng(5)
    x0 = 0.1 * rng.standard_normal(comp["n"])

    # Dense reference quantities
    g_fn, A_e_fn, A_i_fn, ci_raw = cached[5], cached[6], cached[7], cached[8]
    g0 = np.asarray(g_fn(x0, params))
    A_e0 = np.asarray(A_e_fn(x0, params))
    A_i0 = np.asarray(A_i_fn(x0, params))
    c_i0 = np.asarray(ci_raw(x0, params))
    dense_scaling = ProblemScaling.for_ipm(g0, A_e0, A_i0)

    # Matrix-free quantities
    ce_loc, ce_next, ci_rows, ci_cols = backend.setup_rows(x0, params)
    ce_inf = np.maximum(
        np.max(np.abs(ce_loc), axis=1, initial=0.0),
        np.max(np.abs(ce_next), axis=1, initial=0.0),
    )
    ci_inf = np.max(np.abs(ci_rows), axis=1, initial=0.0)
    mf_scaling = ProblemScaling.from_row_norms(g0, ce_inf, ci_inf)

    np.testing.assert_allclose(mf_scaling.c_e, dense_scaling.c_e, rtol=1e-12)
    np.testing.assert_allclose(mf_scaling.c_i, dense_scaling.c_i, rtol=1e-12)
    assert mf_scaling.f == dense_scaling.f

    dense_bounds = get_bounds(x0, c_i0, A_i0, comp["ineq_row_linear"])
    mf_bounds = get_bounds_rows(
        x0, c_i0, ci_cols, ci_rows, comp["ineq_row_linear"]
    )
    np.testing.assert_array_equal(
        mf_bounds.bound_constraint_mask, dense_bounds.bound_constraint_mask
    )
    np.testing.assert_allclose(mf_bounds.lower, dense_bounds.lower)
    np.testing.assert_allclose(mf_bounds.upper, dense_bounds.upper)


def test_long_horizon_setup_never_dense():
    """Cart-pole N=2000 (n≈10k, mi≈8k): setup must complete in O(N·w)
    memory — a dense A_i would be 8000x10005 and a dense A_e Jacobian
    8000x10005 as well, which the matrix-free path never builds."""
    N = 2000
    problem, X, U = cart_pole_problem(N=N, total_time=5.0)
    comp, cached = problem.prepare_ipm(Options())
    backend = cached[-1]
    assert isinstance(backend, BandedBackend)
    params = comp["compiled"].gather_params()
    x0 = np.zeros(comp["n"])

    scaling, A_i0 = problem.compute_ipm_scaling(comp, cached, x0, params)
    assert A_i0 is None  # the dense Jacobian was never materialized
    assert scaling.c_e.shape == (comp["me"],)
    assert scaling.c_i.shape == (comp["mi"],)
    assert np.all(scaling.c_i > 0.0)

    ce_loc, ce_next, ci_rows, ci_cols = backend.setup_rows(x0, params)
    bounds = get_bounds_rows(
        x0,
        np.asarray(cached[8](x0, params)),
        ci_cols,
        ci_rows,
        comp["ineq_row_linear"],
    )
    # u bounds ±20 and cart position [0, 2] detected for every stage.
    assert not bounds.conflicting_bound_indices
    assert np.isfinite(bounds.upper).sum() >= 2 * (N + 1) - 2
