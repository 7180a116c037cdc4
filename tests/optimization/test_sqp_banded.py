"""Equality-only OCPs must reach SQP through the banded KKT backend.

Round-3 seam requirement: SQP rides the same KKT-backend seam as the IPM
(reference solver/sqp.hpp:91 is matrix-callback generic the same way), so
a long-horizon flywheel without input bounds solves via the O(N)
block-tridiagonal path instead of a dense (n+me)^2 factorization.
"""

import math

import numpy as np

import sleipnir_tpu as slp
from sleipnir_tpu import ExitStatus
from sleipnir_tpu.optimization.solver.kkt_banded import BandedBackend


def _flywheel_no_bounds(N: int, total_time: float = 5.0):
    dt = total_time / N
    A = math.exp(-dt)
    B = 1.0 - math.exp(-dt)

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
    ocp.constrain_initial_state(0.0)
    err = 10.0 - ocp.X()
    ocp.minimize((err**2).sum())
    return ocp


def test_sqp_uses_banded_backend_long_horizon():
    N = 2000
    ocp = _flywheel_no_bounds(N)
    status = ocp.solve()
    assert status == ExitStatus.SUCCESS

    # The cached solver bundle must have been built on the banded backend.
    [cached] = [
        v for k, v in ocp._solver_cache.items() if k[0] == "sqp"
    ]
    backend = cached[-1]
    assert isinstance(backend, BandedBackend), type(backend)
    assert backend.K == N + 1

    # Solution: discrete LQR-free tracking, x rises toward 10 and the
    # terminal state is near the reference.
    Xv = ocp.X().value()
    assert abs(Xv[0, 0]) < 1e-9
    assert Xv[0, N] > 9.9
    # Dynamics hold exactly at the solution.
    A = math.exp(-5.0 / N)
    B = 1.0 - A
    Uv = ocp.U().value()
    np.testing.assert_allclose(
        Xv[0, 1:], A * Xv[0, :-1] + B * Uv[0, :N], atol=1e-7
    )
