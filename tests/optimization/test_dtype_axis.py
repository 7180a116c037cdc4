"""f32/f64 dtype axis over the main solver paths.

The reference is templated on a Scalar type and runs its problem suites
over SCALAR_TYPES_UNDER_TEST (reference
test/include/scalar_types_under_test.hpp:57, explicit_double.hpp:14); the
JAX analog is Options.dtype. float32 cannot reach the default 1e-8 KKT
tolerance, so each dtype gets its own (tolerance, assertion atol) pair.
"""

import math

import numpy as np
import pytest

import sleipnir_tpu as slp
from sleipnir_tpu import ExitStatus, Options, Problem

# (dtype, solver tolerance, solution atol)
DTYPE_AXIS = [
    pytest.param("float64", 1e-8, 1e-6, id="f64"),
    pytest.param("float32", 1e-4, 1e-2, id="f32"),
]


@pytest.mark.parametrize("dtype,tol,atol", DTYPE_AXIS)
def test_newton_dtype(dtype, tol, atol):
    problem = Problem()
    x = problem.decision_variable()
    x.set_value(20.0)
    problem.minimize(x * x - 6.0 * x)
    status = problem.solve(Options(dtype=dtype, tolerance=tol))
    assert status == ExitStatus.SUCCESS
    assert x.value() == pytest.approx(3.0, abs=atol)


@pytest.mark.parametrize("dtype,tol,atol", DTYPE_AXIS)
def test_sqp_dtype(dtype, tol, atol):
    problem = Problem()
    x = problem.decision_variable()
    y = problem.decision_variable()
    x.set_value(1.0)
    y.set_value(1.0)
    problem.minimize(x * x + 2.0 * y * y)
    problem.subject_to(x + y == 3.0)
    status = problem.solve(Options(dtype=dtype, tolerance=tol))
    assert status == ExitStatus.SUCCESS
    assert x.value() == pytest.approx(2.0, abs=atol)
    assert y.value() == pytest.approx(1.0, abs=atol)


@pytest.mark.parametrize("dtype,tol,atol", DTYPE_AXIS)
def test_ipm_dtype(dtype, tol, atol):
    problem = Problem()
    x = problem.decision_variable()
    y = problem.decision_variable()
    x.set_value(3.0)
    y.set_value(2.0)
    problem.minimize(x * x + y * y)
    problem.subject_to(x + y >= 2.0)
    status = problem.solve(Options(dtype=dtype, tolerance=tol))
    assert status == ExitStatus.SUCCESS
    assert x.value() == pytest.approx(1.0, abs=atol)
    assert y.value() == pytest.approx(1.0, abs=atol)


@pytest.mark.parametrize(
    "dtype,tol,atol",
    [
        pytest.param("float64", 1e-8, 1e-6, id="f64"),
        # The stage-scan factorization hits the f32 conditioning wall once
        # Σ = S⁻¹Z grows (KKT condition ~1/μ²), so single precision buys
        # ~1e-2 KKT error on banded problems — the dtype axis still runs
        # the whole banded path end to end.
        pytest.param("float32", 1e-2, 1e-1, id="f32"),
    ],
)
def test_ocp_banded_dtype(dtype, tol, atol):
    """Flywheel OCP through the banded backend at both dtypes."""
    from sleipnir_tpu.models.flywheel import flywheel_problem

    problem, X, U = flywheel_problem(N=60, total_time=5.0)
    status = problem.solve(Options(dtype=dtype, tolerance=tol))
    assert status == ExitStatus.SUCCESS
    # Spin-up tracks the 10 rad/s reference by the end of the horizon.
    assert X.value()[0, 60] == pytest.approx(10.0, abs=50 * atol)
