"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware by forcing the
host platform to present 8 XLA CPU devices (the driver's dryrun_multichip
does the same). The environment's axon sitecustomize pre-imports JAX with
the TPU platform forced, so we both set the env vars and override the
platform config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

#: The solver-critical quick tier (`pytest -m fast`, < 2 min): autodiff
#: semantics, the factorization/linear-algebra kernels (incl. the Pallas
#: dd kernels in interpret mode), solver utilities, and the small DSL
#: problems. Perf iteration on the hot paths runs this instead of the
#: ~20-minute full suite (VERDICT r4 task 9).
_FAST_MODULES = {
    "tests/autodiff/test_expression.py",
    "tests/autodiff/test_expression_type.py",
    "tests/autodiff/test_gradient.py",
    "tests/autodiff/test_hessian.py",
    "tests/autodiff/test_jacobian.py",
    "tests/autodiff/test_slice.py",
    "tests/autodiff/test_variable.py",
    "tests/autodiff/test_variable_matrix.py",
    "tests/ops/test_accurate_math.py",
    "tests/ops/test_pallas_banded.py",
    "tests/solver/test_ldlt.py",
    "tests/solver/test_equilibration.py",
    "tests/solver/test_matrix_free_setup.py",
    "tests/solver/test_bounds.py",
    "tests/solver/test_block_tridiag.py",
    "tests/solver/test_inverse_blocks.py",
    "tests/optimization/test_trivial_problem.py",
    "tests/optimization/test_linear_problem.py",
    "tests/optimization/test_quadratic_problem.py",
    "tests/optimization/test_nonlinear_problem.py",
    "tests/optimization/test_decision_variable.py",
    "tests/optimization/test_constraints.py",
}

#: Known-slow cases inside otherwise-fast modules (>8 s each).
_SLOW_CASES = {
    "tests/solver/test_block_tridiag.py::test_bcr_matches_thomas_factor_solve",
    "tests/solver/test_block_tridiag.py::test_solve_matches_dense[bcr-13-5]",
    "tests/solver/test_block_tridiag.py::test_solve_matches_dense[bcr-33-3]",
    "tests/solver/test_block_tridiag.py::test_solve_matches_dense[bcr-8-2]",
    "tests/solver/test_block_tridiag.py::test_kkt_saddle_point_system[16-4-3]",
    "tests/solver/test_inverse_blocks.py::"
    "test_partitioned_inv_multilevel_recursion",
    "tests/solver/test_inverse_blocks.py::"
    "test_partitioned_inv_solve_and_inertia[1000-9]",
    "tests/ops/test_pallas_banded.py::"
    "test_pallas_factor_solve_and_inertia[40-13]",
    "tests/ops/test_pallas_banded.py::"
    "test_pallas_factor_solve_and_inertia[25-5]",
    "tests/solver/test_matrix_free_setup.py::"
    "test_long_horizon_setup_never_dense",
    "tests/solver/test_block_tridiag.py::"
    "test_inertia_matches_eigvals_indefinite[13-5]",
    "tests/solver/test_block_tridiag.py::"
    "test_inertia_matches_eigvals_indefinite[33-3]",
    "tests/solver/test_block_tridiag.py::test_kkt_saddle_point_system[7-2-2]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::")[0]
        if mod in _FAST_MODULES and not any(
            item.nodeid.startswith(s) for s in _SLOW_CASES
        ):
            item.add_marker(pytest.mark.fast)
