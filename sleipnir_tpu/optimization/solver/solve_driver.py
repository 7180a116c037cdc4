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

#: Iterations per device round-trip in the fast path (upper bound — the
#: driver adapts the chunk to the measured per-iteration time, see
#: TARGET_CHUNK_SECONDS).
DEFAULT_CHUNK = 256

#: First-chunk size before any per-iteration timing exists.
INITIAL_CHUNK = 16

#: Soft cap on the wall time of a single device execution. TPU runtimes
#: kill device programs that run too long (measured on the v5e through
#: the axon tunnel: cart-pole N=5000 at ~0.26 s/iteration crashed the
#: worker process on every 256-iteration chunk (~67 s/execution), while
#: the same program runs 600+ iterations without incident in 8-iteration
#: chunks — tools/northstar_drive.py). 20 s keeps a healthy margin and
#: still amortizes the per-call dispatch to noise.
TARGET_CHUNK_SECONDS = 20.0


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
    max_chunk = 32 if np.isfinite(options.timeout) else DEFAULT_CHUNK
    chunk = 1 if observed else min(INITIAL_CHUNK, max_chunk)

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
                it_before = int(state.iterations)
                cap = min(it_before + chunk, options.max_iterations)
                if profilers is not None:
                    profilers["iterate"].start()
                t0_chunk = time.monotonic()
                state = runner(state, np.int32(cap))
                jax.block_until_ready(state)
                dt_chunk = time.monotonic() - t0_chunk
                if profilers is not None:
                    profilers["iterate"].stop()
                # Grow the chunk toward TARGET_CHUNK_SECONDS per device
                # execution: big enough to amortize dispatch, small
                # enough that the runtime's long-execution watchdog
                # never fires (see TARGET_CHUNK_SECONDS).
                done_iters = int(state.iterations) - it_before
                if done_iters > 0 and dt_chunk > 0:
                    per_iter = dt_chunk / done_iters
                    chunk = int(
                        min(
                            max_chunk,
                            max(8.0, TARGET_CHUNK_SECONDS / per_iter),
                        )
                    )
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
