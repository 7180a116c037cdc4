"""Batched and sharded solves over a device mesh.

The reference's only parallelism is one OS thread per multistart guess
(reference optimization/multistart.hpp:54-56). TPU-natively, a batch of
problem instances (multistart guesses / scenario batches, e.g. the
frc_2022/2024 shooter and constrained_multitag families in BASELINE.json)
is one *vmapped* solver state pytree sharded across a `jax.sharding.Mesh`
batch axis — every IPM iteration's KKT assembly, factorization, and line
search runs data-parallel on all chips with no communication, and XLA
inserts collectives only for the final argmin reduction.

TPU precision caveat: a fully-vmapped solve batches ALL arithmetic, so
on TPU its derivative probes ride the MXU's multi-pass-f32 f64 emulation
(~1e-8-class Jacobian noise — docs/tpu_numerics.md). Batched solves on
TPU should therefore request tolerances >= ~1e-6, or be re-polished
single-instance; the single-solve path is exact (lax.map probes).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sleipnir_tpu.optimization.multistart import MultistartResult
from sleipnir_tpu.optimization.solver import status_codes
from sleipnir_tpu.optimization.solver.exit_status import ExitStatus
from sleipnir_tpu.optimization.solver.funcs import ScalingArrays
from sleipnir_tpu.optimization.solver.options import Options


def _tree_stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def default_mesh(num_devices: int | None = None, axis: str = "batch") -> Mesh:
    """A 1-D mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def make_batched_runner(step, mesh: Mesh | None = None, axis: str = "batch"):
    """Build a jitted runner driving a batch of solver states to completion.

    Each instance becomes inert once its status leaves RUNNING; the loop
    ends when every instance has finished (or hit the iteration cap).
    """

    def step_if_running(st):
        return lax.cond(
            st.status == status_codes.RUNNING, step, lambda s: s, st
        )

    vstep = jax.vmap(step_if_running)

    def run(states, cap):
        def cond(ss):
            return jnp.any(
                (ss.status == status_codes.RUNNING) & (ss.iterations < cap)
            )

        return lax.while_loop(cond, vstep, states)

    # Sharding propagates from the inputs (see shard_batch); XLA keeps the
    # batch axis partitioned through the whole loop.
    return jax.jit(run)


def shard_batch(states, mesh: Mesh, axis: str = "batch"):
    """Place a stacked state pytree with its leading axis sharded over the
    mesh's batch axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), states)


def solve_ipm_batched(
    problem,
    initial_guesses: Sequence[np.ndarray],
    options: Options | None = None,
    mesh: Mesh | None = None,
    max_iterations: int | None = None,
):
    """Solve an inequality-constrained problem from many starting points in
    one batched device computation.

    Returns (statuses, costs, xs): arrays with leading batch dimension.
    """
    if options is None:
        options = Options()
    comp, bundle = problem.prepare_ipm(options)
    init = bundle[0]
    step = bundle[1]
    params = comp["compiled"].gather_params()

    states = []
    for guess in initial_guesses:
        x0 = np.asarray(guess, dtype=np.float64).ravel()
        scaling, _ = problem.compute_ipm_scaling(comp, bundle, x0, params)
        sc = ScalingArrays(
            f=jnp.asarray(scaling.f),
            c_e=jnp.asarray(scaling.c_e),
            c_i=jnp.asarray(scaling.c_i),
        )
        s0 = np.ones(comp["mi"])
        y0 = np.zeros(comp["me"])
        z0 = np.ones(comp["mi"])
        mu0 = 0.1 * scaling.f
        states.append(init(x0, s0, y0, z0, mu0, 0, params, sc))

    batched = _tree_stack(states)
    if mesh is not None:
        batched = shard_batch(batched, mesh)

    runner = make_batched_runner(step, None)
    cap = max_iterations if max_iterations is not None else options.max_iterations
    final = runner(batched, np.int32(cap))

    statuses = np.asarray(final.status)
    costs = np.asarray(final.f)
    xs = np.asarray(final.x)
    return statuses, costs, xs, final


def multistart_batched(
    problem,
    initial_guesses: Sequence[np.ndarray],
    options: Options | None = None,
    mesh: Mesh | None = None,
) -> MultistartResult:
    """Batched multistart: prefer SUCCESS, then lowest cost
    (reference optimization/multistart.hpp:66-74), evaluated across the
    whole batch in one device computation.

    On accelerators the fully-vmapped solve runs its arithmetic on the
    MXU's multi-pass-f32 f64 emulation path (~1e-8-class derivative
    noise — docs/tpu_numerics.md), so the batch may converge only to
    ~1e-6. The winner is therefore RE-POLISHED with one single-instance
    warm-started solve, which uses the exact sequential probe path and
    reaches the full 1e-8 tolerance — restoring the reference's contract
    that multistart returns full-tolerance solutions
    (multistart.hpp:45-74) at the cost of one extra warm solve."""
    statuses, costs, xs, _ = solve_ipm_batched(
        problem, initial_guesses, options, mesh
    )
    order = sorted(
        range(len(initial_guesses)),
        key=lambda i: (int(statuses[i] != int(ExitStatus.SUCCESS)), costs[i]),
    )
    best = order[0]
    status = ExitStatus(int(statuses[best]))
    cost = float(costs[best])
    x_best = xs[best]
    if jax.default_backend() != "cpu" and status == ExitStatus.SUCCESS:
        from sleipnir_tpu.autodiff import expression as ex  # noqa: PLC0415

        comp = problem._compile()
        ids = comp["all_ids"]
        saved = ex._registry.get(ids).copy()
        try:
            ex._registry.set(ids, np.asarray(x_best, dtype=np.float64))
            polish_status = problem.solve(options)
            if polish_status == ExitStatus.SUCCESS:
                x_best = ex._registry.get(ids).copy()
                cost = float(problem._last_state.f)
            status = (
                ExitStatus.SUCCESS
                if polish_status == ExitStatus.SUCCESS
                else status
            )
            if polish_status != ExitStatus.SUCCESS:
                ex._registry.set(ids, saved)
        except Exception:
            ex._registry.set(ids, saved)
            raise
    return MultistartResult(status, cost, x_best)
