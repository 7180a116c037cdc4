"""Multistart (mirrors reference
python/test/optimization/multistart_test.py — Mishra's bird function with
multiple local minima)."""

import math

import jax
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


def _bird_problem():
    problem = Problem()
    x = problem.decision_variable()
    y = problem.decision_variable()
    cost = (
        slp.sin(y) * slp.exp((1 - slp.cos(x)) ** 2)
        + slp.cos(x) * slp.exp((1 - slp.sin(y)) ** 2)
        + (x - y) ** 2
    )
    problem.minimize(cost)
    problem.subject_to((x + 5) ** 2 + (y + 5) ** 2 < 25)
    return problem, x, y


def test_multistart_batched_matches_serial():
    """Passing a Problem runs all guesses as ONE vmapped device
    computation (the TPU-native analog of the reference's
    thread-per-guess, multistart.hpp:54-56), sharded over the mesh."""
    from sleipnir_tpu.parallel.batch import default_mesh

    guesses = [(-3.0, -8.0), (-3.0, -1.5), (-6.0, -4.0), (-2.0, -6.0)]

    problem, x, y = _bird_problem()
    result = multistart(
        problem,
        [np.asarray(g) for g in guesses],
        mesh=default_mesh(4),
    )
    assert result.status == ExitStatus.SUCCESS
    assert result.variables[0] == pytest.approx(-3.1302468, abs=1e-3)
    assert result.variables[1] == pytest.approx(-1.5821422, abs=1e-3)


def test_solve_ipm_batched_statuses_and_costs():
    """Every batch lane solves independently; per-lane results match a
    serial solve from the same guess."""
    from sleipnir_tpu.parallel.batch import solve_ipm_batched

    guesses = [np.asarray(g) for g in [(-3.0, -8.0), (-3.0, -1.5)]]
    problem, x, y = _bird_problem()
    statuses, costs, xs, _ = solve_ipm_batched(problem, guesses)
    assert statuses.shape == (2,)
    assert xs.shape[0] == 2

    for guess, status, cost, xv in zip(guesses, statuses, costs, xs):
        serial_problem, sx, sy = _bird_problem()
        sx.set_value(guess[0])
        sy.set_value(guess[1])
        serial_status = serial_problem.solve()
        assert int(status) == int(serial_status)
        if int(status) == int(ExitStatus.SUCCESS):
            np.testing.assert_allclose(
                xv, [sx.value(), sy.value()], atol=1e-6
            )


def test_multistart_winner_polish(monkeypatch):
    """On accelerators the batched winner is re-polished with a
    single-instance warm-started solve to the full tolerance (the
    fully-vmapped batch inherits ~1e-8 MXU f64-emulation noise on TPU;
    reference bar: multistart.hpp:45-74 returns full-tolerance
    solutions). Forced on CPU by faking the backend gate."""
    import sleipnir_tpu.parallel.batch as batch_mod

    problem = slp.Problem()
    x = problem.decision_variable()
    y = problem.decision_variable()
    problem.minimize((x - 2.0) ** 2 + (y + 1.0) ** 2)
    problem.subject_to(x <= 5.0)

    real_backend = jax.default_backend

    monkeypatch.setattr(
        batch_mod.jax, "default_backend", lambda: "tpu"
    )
    # problem.solve still runs on the real (CPU) backend.
    guesses = [np.array([0.0, 0.0]), np.array([4.0, 4.0])]
    res = slp.multistart(problem, guesses)
    monkeypatch.setattr(batch_mod.jax, "default_backend", real_backend)
    assert res.status == slp.ExitStatus.SUCCESS
    np.testing.assert_allclose(
        np.asarray(res.variables), [2.0, -1.0], atol=1e-7
    )
