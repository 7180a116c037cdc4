"""Flywheel spin-up model and benchmark problem.

Matches reference benchmarks/scalability/flywheel/main.cpp and
python/test/optimization/flywheel_problem_test.py:13-41: discrete linear
dynamics x₊ = A x + B u with A = exp(−dt), B = 1 − exp(−dt), input bounds
±12 V, quadratic tracking cost to r = 10 rad/s.
"""

from __future__ import annotations

import math

import numpy as np

import sleipnir_tpu as slp
from sleipnir_tpu.autodiff import expression as ex
from sleipnir_tpu.autodiff.variable import Variable


def flywheel_problem(N: int = 1000, total_time: float = 5.0, fast: bool = True):
    """Build the flywheel tracking problem. Returns (problem, X, U).

    Linear dynamics + quadratic cost + linear bounds → the dispatcher picks
    the interior-point method, like the reference.
    """
    dt = total_time / N
    A = math.exp(-dt)
    B = 1.0 - math.exp(-dt)
    r = 10.0

    if fast:
        # OCP formulation: discrete linear dynamics as one vmapped block,
        # solved with the block-tridiagonal KKT backend.
        def discrete(x, u):
            return A * x + B * u

        ocp = slp.OCP(
            1,
            1,
            dt,
            N,
            discrete,
            slp.DynamicsType.DISCRETE,
            slp.TimestepMethod.FIXED,
            slp.TranscriptionMethod.DIRECT_TRANSCRIPTION,
        )
        X = ocp.X()
        U = ocp.U()
        ocp.constrain_initial_state(0.0)
        ocp.subject_to(U >= -12.0)
        ocp.subject_to(U <= 12.0)
        err = r - X
        ocp.minimize((err**2).sum())
        return ocp, X, U

    problem = slp.Problem()
    X = problem.decision_variable(1, N + 1)
    U = problem.decision_variable(1, N)

    for k in range(N):
        problem.subject_to(X[0, k + 1] == A * X[0, k] + B * U[0, k])

    problem.subject_to(X[0, 0] == 0.0)
    problem.subject_to(U >= -12.0)
    problem.subject_to(U <= 12.0)

    # Minimize tracking error Σ (r − xₖ)²
    err = r - X
    problem.minimize((err**2).sum())

    return problem, X, U
