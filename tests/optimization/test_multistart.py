"""Multistart (mirrors reference
python/test/optimization/multistart_test.py — Mishra's bird function with
multiple local minima)."""

import math

import numpy as np
import pytest

import sleipnir_tpu as slp
from sleipnir_tpu import ExitStatus, MultistartResult, Problem, multistart


def test_mishras_bird_function():
    def solve(initial_guess):
        problem = Problem()

        x = problem.decision_variable()
        x.set_value(initial_guess[0])
        y = problem.decision_variable()
        y.set_value(initial_guess[1])

        # Mishra's bird function
        cost = (
            slp.sin(y) * slp.exp((1 - slp.cos(x)) ** 2)
            + slp.cos(x) * slp.exp((1 - slp.sin(y)) ** 2)
            + (x - y) ** 2
        )
        problem.minimize(cost)

        problem.subject_to((x + 5) ** 2 + (y + 5) ** 2 < 25)

        status = problem.solve()
        return MultistartResult(
            status, float(cost.value()), (x.value(), y.value())
        )

    result = multistart(
        solve, [(-3.0, -8.0), (-3.0, -1.5)]
    )

    assert result.status == ExitStatus.SUCCESS
    # Global minimum of the constrained Mishra's bird function
    assert result.variables[0] == pytest.approx(-3.1302468, abs=1e-3)
    assert result.variables[1] == pytest.approx(-1.5821422, abs=1e-3)
