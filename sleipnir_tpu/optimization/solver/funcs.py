"""Matrix-callback structures: the decoupling seam between problem
compilation and the solvers (reference
solver/interior_point_matrix_callbacks.hpp:18, sqp_matrix_callbacks.hpp,
newton_matrix_callbacks.hpp).

All callables are pure JAX-traceable functions of dense arrays, pre-scaled
by the problem scaling (like the closures built in reference
problem.hpp:618-660). Solvers never see the expression DAG.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp


class ScalingArrays(NamedTuple):
    """Problem scaling as device arrays for in-jit unscaling."""

    f: jnp.ndarray  # scalar
    c_e: jnp.ndarray  # (me,)
    c_i: jnp.ndarray  # (mi,)


class _Bound:
    """Callback struct with runtime `params` and `scaling` bound as the
    trailing arguments of every callable.

    Non-decision variables enter the compiled functions as runtime
    parameters (not trace-time constants) so that Sleipnir's
    set-value-then-re-solve workflow (reference docs/usage.md "Suppressing
    constant pruning") doesn't retrace; problem scaling is recomputed at
    every solve's starting point (reference problem.hpp:616) and likewise
    rides along as data.

    When `dtype` is given, every callable's output is cast to it: compiled
    problem functions carry float64 constants, which would silently
    promote float32 solver iterates back to float64 (the reference's
    Scalar template fixes the arithmetic type the same way).
    """

    def __init__(self, funcs, params, scaling, dtype=None) -> None:
        self.params = params
        self.scaling = scaling
        for name in funcs._fields:
            value = getattr(funcs, name)
            if callable(value):
                value = _bind_one(value, params, scaling, dtype)
            setattr(self, name, value)


def _bind_one(fn, params, scaling, dtype):
    if dtype is None:
        return lambda *args: fn(*args, params, scaling)
    return lambda *args: jnp.asarray(fn(*args, params, scaling), dtype)


def bind(funcs, params, scaling, dtype=None) -> _Bound:
    """Bind params and scaling vectors into a callback struct."""
    return _Bound(funcs, params, scaling, dtype)


class NewtonFunctions(NamedTuple):
    """Callbacks for the Newton solver (reference
    newton_matrix_callbacks.hpp)."""

    num_decision_variables: int
    f: Callable  # f(x) -> scalar
    g: Callable  # g(x) -> (n,)
    H: Callable  # H(x) -> (n, n)


class SQPFunctions(NamedTuple):
    """Callbacks for the SQP solver (reference sqp_matrix_callbacks.hpp)."""

    num_decision_variables: int
    num_equality_constraints: int
    f: Callable  # f(x) -> scalar
    g: Callable  # g(x) -> (n,)
    H: Callable  # H(x, y) -> (n, n)   full Lagrangian Hessian
    H_c: Callable  # H_c(x, y) -> (n, n)  constraint part only
    c_e: Callable  # c_e(x) -> (me,)
    A_e: Callable  # A_e(x) -> (me, n)


class IPMFunctions(NamedTuple):
    """Callbacks for the interior-point solver (reference
    interior_point_matrix_callbacks.hpp:18)."""

    num_decision_variables: int
    num_equality_constraints: int
    num_inequality_constraints: int
    f: Callable  # f(x) -> scalar
    g: Callable  # g(x) -> (n,)
    H: Callable  # H(x, y, z) -> (n, n)  full Lagrangian Hessian
    H_c: Callable  # H_c(x, y, z) -> (n, n)  constraint part only
    c_e: Callable  # c_e(x) -> (me,)
    A_e: Callable  # A_e(x) -> (me, n)
    c_i: Callable  # c_i(x) -> (mi,)
    A_i: Callable  # A_i(x) -> (mi, n)
