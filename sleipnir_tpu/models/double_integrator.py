"""Double integrator model and problem (reference
python/test/optimization/double_integrator_problem_test.py:7-49).

States x = [position, velocity]; input u = [acceleration]. Exact discrete
kinematics p₊ = p + v·dt + a·dt²/2, v₊ = v + a·dt.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import sleipnir_tpu as slp


def double_integrator_problem(
    N: int = 100, total_time: float = 3.5, r: float = 2.0
):
    """Move distance r, start/end at rest, |v| ≤ 1, |a| ≤ 1.

    Returns (problem, X, U).
    """
    dt = total_time / N

    def discrete(x, u):
        p, v = x[0, 0], x[1, 0]
        a = u[0, 0]
        return jnp.stack(
            [p + v * dt + 0.5 * a * dt * dt, v + a * dt]
        ).reshape(2, 1)

    ocp = slp.OCP(
        2,
        1,
        dt,
        N,
        discrete,
        slp.DynamicsType.DISCRETE,
        slp.TimestepMethod.FIXED,
        slp.TranscriptionMethod.DIRECT_TRANSCRIPTION,
    )
    X, U = ocp.X(), ocp.U()
    ocp.constrain_initial_state(np.array([[0.0], [0.0]]))
    ocp.constrain_final_state(np.array([[r], [0.0]]))

    # Velocity and acceleration limits
    ocp.subject_to(X[1:2, :] >= -1.0)
    ocp.subject_to(X[1:2, :] <= 1.0)
    ocp.subject_to(U >= -1.0)
    ocp.subject_to(U <= 1.0)

    # Minimize position error
    err = r - X[0:1, :]
    ocp.minimize((err**2).sum())
    return ocp, X, U
