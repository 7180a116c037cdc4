"""Flywheel OCP example (reference examples/flywheel_ocp/main.py):
spin a flywheel up to 10 rad/s through the OCP class."""

from __future__ import annotations

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import sleipnir_tpu as slp


def main(N: int = 100, total_time: float = 5.0, verbose: bool = True):
    dt = total_time / N
    A_d = math.exp(-dt)
    B_d = 1.0 - math.exp(-dt)
    r = 10.0

    def dynamics(x, u):
        return A_d * x + B_d * u

    ocp = slp.OCP(
        1,
        1,
        dt,
        N,
        dynamics,
        slp.DynamicsType.DISCRETE,
        slp.TimestepMethod.FIXED,
        slp.TranscriptionMethod.DIRECT_TRANSCRIPTION,
    )
    ocp.constrain_initial_state(0.0)
    ocp.set_lower_input_bound(-12.0)
    ocp.set_upper_input_bound(12.0)

    err = r - ocp.X()
    ocp.minimize((err**2).sum())

    status = ocp.solve()
    if verbose:
        print(f"status = {status}")
        print(f"final velocity = {ocp.X().value(0, N):.4f} rad/s")
    return status, ocp


if __name__ == "__main__":
    main()
