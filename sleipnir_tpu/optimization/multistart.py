"""Multistart: solve from several initial guesses, keep the best
(reference optimization/multistart.hpp:45-76 and
python/src/sleipnir/optimization/__init__.py:6-33).

The reference runs one OS thread per initial guess — the only parallelism it
has (SURVEY.md §2.6). Here each solve reuses the problem's cached compiled
solver, so guesses run back-to-back on the accelerator without recompiling;
batched/sharded variants live in sleipnir_tpu.parallel.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

from sleipnir_tpu.optimization.solver.exit_status import ExitStatus


class MultistartResult(NamedTuple):
    """The result of a multistart solve (reference multistart.hpp:22-29)."""

    #: The solver exit status.
    status: ExitStatus
    #: The solution's cost.
    cost: float
    #: The decision variables.
    variables: object


def multistart(
    solve: Callable[[object], MultistartResult],
    initial_guesses: Sequence[object],
) -> MultistartResult:
    """Solve from each initial guess; prefer SUCCESS, then lowest cost.

    `solve` takes an initial guess and returns a MultistartResult.
    """
    results = [solve(guess) for guess in initial_guesses]
    return min(
        results,
        key=lambda r: (int(r.status != ExitStatus.SUCCESS), r.cost),
    )
