"""Multistart: solve from several initial guesses, keep the best
(reference optimization/multistart.hpp:45-76 and
python/src/sleipnir/optimization/__init__.py:6-33).

The reference runs one OS thread per initial guess — the only parallelism
it has (SURVEY.md §2.6). TPU-natively the parallel unit is a *batch axis*,
not a thread: pass a Problem and `multistart` vmaps the whole solver state
over the guesses and runs them as one device computation, sharded over a
`jax.sharding.Mesh` when given (sleipnir_tpu.parallel.batch). The
callable form (matching the reference's API, where each guess gets a
user-built problem) runs the closures back-to-back, reusing the problem's
cached compiled solver.
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
    solve: Callable[[object], "MultistartResult"] | object,
    initial_guesses: Sequence[object],
    options=None,
    mesh=None,
) -> MultistartResult:
    """Solve from each initial guess; prefer SUCCESS, then lowest cost
    (reference multistart.hpp:66-74).

    Two forms:
      - ``multistart(problem, guesses)`` with a Problem instance: guesses
        are flat decision vectors; all solves run *batched* in one vmapped
        device computation (the default parallel path; pass ``mesh`` to
        shard the batch across devices).
      - ``multistart(solve_fn, guesses)`` with a callable returning a
        MultistartResult per guess: runs each closure in sequence
        (compiled solvers are cached per problem structure, so repeated
        solves skip compilation).
    """
    if hasattr(solve, "prepare_ipm"):
        from sleipnir_tpu.parallel.batch import (  # noqa: PLC0415
            multistart_batched,
        )

        return multistart_batched(solve, initial_guesses, options, mesh)

    results = [solve(guess) for guess in initial_guesses]
    return min(
        results,
        key=lambda r: (int(r.status != ExitStatus.SUCCESS), r.cost),
    )
