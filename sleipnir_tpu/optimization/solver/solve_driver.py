"""Solver loop driver: runs a jitted step function to completion.

Two execution modes over the same compiled step:
  - fast path (no callbacks/diagnostics): `lax.while_loop` chunks entirely on
    device — the TPU-native replacement for the reference's serial C++ loop
    (reference interior_point.hpp:382-863),
  - observed path: one jitted step per Python iteration, extracting
    IterationInfo for user callbacks / diagnostics / spy recording, matching
    the reference's per-iteration callback semantics
    (reference interior_point.hpp:413-417).

Feasibility restoration changes the problem shape, so the device loop
signals it via a status sentinel and the host runs the restoration solve
(see util/feasibility_restoration.py) before resuming.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import numpy as np
from jax import lax

from sleipnir_tpu.optimization.solver import status_codes
from sleipnir_tpu.optimization.solver.exit_status import ExitStatus
from sleipnir_tpu.optimization.solver.options import Options

#: Iterations per device round-trip in the fast path.
DEFAULT_CHUNK = 256


def make_runner(step: Callable) -> Callable:
    """Build the jitted device-resident chunk runner for a step function.

    Built once per compiled solver and reused across solves so repeated
    solves (multistart, parameter sweeps) don't recompile the loop.
    """

    def _run_chunk(st, cap):
        return lax.while_loop(
            lambda s: (s.status == status_codes.RUNNING) & (s.iterations < cap),
            step,
            st,
        )

    return jax.jit(_run_chunk)


def run_solver(
    state,
    step: Callable,
    options: Options,
    callbacks: Sequence[Callable] = (),
    info_fn: Callable | None = None,
    restoration_handler: Callable | None = None,
    diagnostics_fn: Callable | None = None,
    start_time: float | None = None,
    runner: Callable | None = None,
    profilers: dict | None = None,
):
    """Drive `step` until the state's status leaves RUNNING.

    `profilers`, when given, is a dict of SolveProfilers keyed "solve",
    "iterate", "restoration", "callbacks" (reference SolveProfiler usage,
    interior_point.hpp:155-237); segments are timed with a device sync so
    the numbers mean wall time, not dispatch time.

    Returns the final state (with a terminal ExitStatus in .status).
    """
    if start_time is None:
        start_time = time.monotonic()
    if profilers is not None:
        profilers["solve"].start()

    observed = bool(callbacks) or options.diagnostics
    # The observed path runs the SAME compiled chunk runner as the fast
    # path with a cap of one iteration, so callbacks/diagnostics never pay
    # for compiling a second program (the per-iteration jitted step used
    # to take minutes of extra XLA compile time at benchmark sizes).
    chunk = 1 if observed else (
        32 if np.isfinite(options.timeout) else DEFAULT_CHUNK
    )

    if runner is None:
        runner = make_runner(step)

    while True:
        status = int(state.status)
        if status == status_codes.RUNNING:
            if int(state.iterations) >= options.max_iterations:
                state = state._replace(
                    status=np.int32(int(ExitStatus.MAX_ITERATIONS_EXCEEDED))
                )
                break
            if time.monotonic() - start_time > options.timeout:
                state = state._replace(
                    status=np.int32(int(ExitStatus.TIMEOUT))
                )
                break
            if observed:
                stop = False
                if callbacks and info_fn is not None:
                    if profilers is not None:
                        profilers["callbacks"].start()
                    info = info_fn(state)
                    for cb in callbacks:
                        if cb(info):
                            stop = True
                    if profilers is not None:
                        profilers["callbacks"].stop()
                if stop:
                    state = state._replace(
                        status=np.int32(int(ExitStatus.CALLBACK_REQUESTED_STOP))
                    )
                    break
                prev_state = state
                if profilers is not None:
                    profilers["iterate"].start()
                state = runner(
                    state, np.int32(int(state.iterations) + 1)
                )
                if profilers is not None:
                    jax.block_until_ready(state)
                    profilers["iterate"].stop()
                if options.diagnostics and diagnostics_fn is not None:
                    diagnostics_fn(prev_state, state)
            else:
                cap = min(
                    int(state.iterations) + chunk, options.max_iterations
                )
                if profilers is not None:
                    profilers["iterate"].start()
                state = runner(state, np.int32(cap))
                if profilers is not None:
                    jax.block_until_ready(state)
                    profilers["iterate"].stop()
        elif status == status_codes.FEASIBILITY_RESTORATION_REQUESTED:
            if restoration_handler is None:
                state = state._replace(
                    status=np.int32(
                        int(ExitStatus.FEASIBILITY_RESTORATION_FAILED)
                    )
                )
                break
            if profilers is not None:
                profilers["restoration"].start()
            state = restoration_handler(state, start_time)
            if profilers is not None:
                profilers["restoration"].stop()
            if (
                int(state.status)
                == status_codes.FEASIBILITY_RESTORATION_REQUESTED
            ):
                state = state._replace(
                    status=np.int32(
                        int(ExitStatus.FEASIBILITY_RESTORATION_FAILED)
                    )
                )
                break
        else:
            break
    if profilers is not None:
        profilers["solve"].stop()
    return state
