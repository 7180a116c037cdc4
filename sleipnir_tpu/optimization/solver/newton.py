"""Newton's method for unconstrained problems as a jitted iteration.

Behavioral port of reference solver/newton.hpp:51-290: solve Hpˣ = −∇f with
the inertia-corrected regularized LDLᵀ, backtracking filter line search on
cost only (α_min = 1e-20), LINE_SEARCH_FAILED on exhaustion with the
accept-if-KKT-error-reduced fallback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from sleipnir_tpu.optimization.solver import status_codes
from sleipnir_tpu.optimization.solver.exit_status import ExitStatus
from sleipnir_tpu.optimization.solver.funcs import (
    IPMFunctions,
    NewtonFunctions,
    ScalingArrays,
    bind,
)
from sleipnir_tpu.optimization.solver.kkt_backend import DenseBackend
from sleipnir_tpu.optimization.solver.options import Options
from sleipnir_tpu.optimization.solver.util.filter import (
    FilterState,
    make_filter,
    try_add,
)
from sleipnir_tpu.optimization.solver.util.kkt_error import (
    kkt_error_newton_one,
    unscaled_kkt_error_newton,
)

ALPHA_REDUCTION_FACTOR = 0.5  # newton.hpp:141
ALPHA_MIN = 1e-20  # newton.hpp:142
MAX_LINE_SEARCH_TRIPS = 96  # α halves from 1 past 1e-20 in ~67 steps
DIVERGENCE_LIMIT = 1e10  # newton.hpp:166


class NewtonState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    #: Backend-specific derivative storage (dense H or banded blocks).
    derivs: object
    E0: jnp.ndarray
    filt: FilterState
    prev_delta: jnp.ndarray
    delta: jnp.ndarray
    gamma: jnp.ndarray
    iterations: jnp.ndarray
    status: jnp.ndarray
    alpha: jnp.ndarray
    #: Runtime parameter vector (non-decision variables; see funcs.bind).
    params: jnp.ndarray
    #: Problem scaling, recomputed per solve at x0 (reference problem.hpp:382).
    scaling: ScalingArrays


def _merge(pred, a, b):
    return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)


def make_newton(funcs: NewtonFunctions, options: Options, *, backend=None):
    """Build (init, step) for Newton on a fixed problem shape.

    `backend` selects the KKT backend (kkt_backend.DenseBackend by
    default; a banded backend for block-tridiagonal Hessians)."""
    n = funcs.num_decision_variables
    dtype = jnp.float64 if options.dtype == "float64" else jnp.float32
    tol = options.tolerance
    if backend is None:
        backend = DenseBackend(n, 0, 0, dtype)

    ipm_funcs = IPMFunctions(
        num_decision_variables=n,
        num_equality_constraints=0,
        num_inequality_constraints=0,
        f=funcs.f,
        g=funcs.g,
        H=lambda x, y, z, p, sc: funcs.H(x, p, sc),
        H_c=lambda x, y, z, p, sc: jnp.zeros((n, n), x.dtype),
        c_e=lambda x, p, sc: jnp.zeros((0,), x.dtype),
        A_e=lambda x, p, sc: jnp.zeros((0, n), x.dtype),
        c_i=lambda x, p, sc: jnp.zeros((0,), x.dtype),
        A_i=lambda x, p, sc: jnp.zeros((0, n), x.dtype),
    )
    zeros_mi = jnp.zeros((0,))

    def init(x0, params, scaling, iterations0=0) -> NewtonState:
        params = jnp.asarray(params, dtype)
        scaling = ScalingArrays(*(jnp.asarray(a, dtype) for a in scaling))
        F = bind(funcs, params, scaling, dtype)
        x0 = jnp.asarray(x0, dtype)
        Fi = bind(ipm_funcs, params, scaling, dtype)
        f = F.f(x0)
        g = F.g(x0)
        derivs = backend.eval_derivs(
            Fi, x0, zeros_mi.astype(dtype), zeros_mi.astype(dtype)
        )
        finite = (
            jnp.isfinite(f)
            & jnp.all(jnp.isfinite(g))
            & backend.all_finite(derivs)
        )
        E0 = unscaled_kkt_error_newton(scaling, g)
        status = jnp.where(
            ~finite,
            int(ExitStatus.NONFINITE_INITIAL_GUESS),
            jnp.where(E0 <= tol, int(ExitStatus.SUCCESS), status_codes.RUNNING),
        ).astype(jnp.int32)
        return NewtonState(
            x=x0,
            f=f,
            g=g,
            derivs=derivs,
            E0=E0,
            filt=make_filter(jnp.asarray(0.0, dtype), dtype),
            prev_delta=jnp.asarray(0.0, dtype),
            delta=jnp.asarray(0.0, dtype),
            gamma=jnp.asarray(0.0, dtype),
            iterations=jnp.asarray(iterations0, jnp.int32),
            status=status,
            alpha=jnp.asarray(1.0, dtype),
            params=params,
            scaling=scaling,
        )

    class LSCarry(NamedTuple):
        alpha: jnp.ndarray
        filt: FilterState
        done: jnp.ndarray
        accepted: jnp.ndarray
        tx: jnp.ndarray
        tf: jnp.ndarray
        guard: jnp.ndarray

    def iteration_body(st: NewtonState) -> NewtonState:
        F = bind(funcs, st.params, st.scaling, dtype)
        Fi = bind(ipm_funcs, st.params, st.scaling, dtype)
        x, f, g = st.x, st.f, st.g
        derivs = st.derivs
        sigma0 = zeros_mi.astype(dtype)

        fac = backend.factor(derivs, sigma0, st.prev_delta, 1e-10)

        def factorization_failed(_):
            return st._replace(
                status=jnp.asarray(
                    int(ExitStatus.FACTORIZATION_FAILED), jnp.int32
                )
            )

        def with_factorization(_):
            p_x, _p_y = backend.solve_refined(
                derivs, sigma0, fac, -g, sigma0
            )
            D_phi = g @ p_x
            zero = jnp.asarray(0.0, dtype)

            def ls_body(c: LSCarry) -> LSCarry:
                tx = x + c.alpha * p_x
                tf = F.f(tx)
                nonfinite = ~jnp.isfinite(tf)
                acc, filt1 = try_add(
                    c.filt, f, zero, tf, zero, D_phi, c.alpha
                )
                alpha_next = c.alpha * ALPHA_REDUCTION_FACTOR
                hit_min = alpha_next < ALPHA_MIN

                # KKT fallback at minimum step (reference newton.hpp:227-246)
                def kkt_fallback(_):
                    cur = kkt_error_newton_one(g)
                    tx3 = x + 1.0 * p_x
                    nxt = kkt_error_newton_one(F.g(tx3))
                    ok = nxt <= 0.999 * cur
                    return ok, tx3, F.f(tx3)

                def no_fallback(_):
                    return jnp.asarray(False), x * 0.0, zero

                run_fb = ~acc & hit_min
                fb_ok, tx3, tf3 = lax.cond(run_fb, kkt_fallback, no_fallback, 0)

                guard = c.guard + 1
                carry_acc = LSCarry(
                    alpha=c.alpha,
                    filt=filt1,
                    done=jnp.asarray(True),
                    accepted=jnp.asarray(True),
                    tx=tx,
                    tf=tf,
                    guard=guard,
                )
                carry_fb_acc = LSCarry(
                    alpha=alpha_next,
                    filt=filt1,
                    done=jnp.asarray(True),
                    accepted=jnp.asarray(True),
                    tx=tx3,
                    tf=tf3,
                    guard=guard,
                )
                carry_fail = LSCarry(
                    alpha=alpha_next,
                    filt=filt1,
                    done=jnp.asarray(True),
                    accepted=jnp.asarray(False),
                    tx=tx,
                    tf=tf,
                    guard=guard,
                )
                carry_reduce = LSCarry(
                    alpha=alpha_next,
                    filt=filt1,
                    done=guard >= MAX_LINE_SEARCH_TRIPS,
                    accepted=jnp.asarray(False),
                    tx=tx,
                    tf=tf,
                    guard=guard,
                )
                after_min = _merge(fb_ok, carry_fb_acc, carry_fail)
                low = _merge(hit_min, after_min, carry_reduce)
                fin = _merge(acc & ~nonfinite, carry_acc, low)
                # Nonfinite trial: reduce immediately, no filter call
                # (reference newton.hpp:207-216)
                carry_nf = c._replace(
                    alpha=alpha_next,
                    done=hit_min,
                    accepted=jnp.asarray(False),
                    guard=guard,
                )
                return _merge(nonfinite, carry_nf, fin)

            ls = lax.while_loop(
                lambda c: ~c.done,
                ls_body,
                LSCarry(
                    alpha=jnp.asarray(1.0, dtype),
                    filt=st.filt,
                    done=jnp.asarray(False),
                    accepted=jnp.asarray(False),
                    tx=x,
                    tf=f,
                    guard=jnp.asarray(0, jnp.int32),
                ),
            )

            def accepted_update(_):
                x1 = ls.tx
                g1 = F.g(x1)
                derivs1 = backend.eval_derivs(Fi, x1, sigma0, sigma0)
                E0 = unscaled_kkt_error_newton(st.scaling, g1)
                iterations = st.iterations + 1
                status = jnp.where(
                    iterations >= options.max_iterations,
                    int(ExitStatus.MAX_ITERATIONS_EXCEEDED),
                    jnp.where(
                        E0 <= tol,
                        int(ExitStatus.SUCCESS),
                        status_codes.RUNNING,
                    ),
                ).astype(jnp.int32)
                return st._replace(
                    x=x1,
                    f=ls.tf,
                    g=g1,
                    derivs=derivs1,
                    E0=E0,
                    filt=ls.filt,
                    prev_delta=fac.delta,
                    delta=fac.delta,
                    gamma=fac.gamma,
                    iterations=iterations,
                    status=status,
                    alpha=ls.alpha,
                )

            def line_search_failed(_):
                return st._replace(
                    status=jnp.asarray(
                        int(ExitStatus.LINE_SEARCH_FAILED), jnp.int32
                    ),
                    filt=ls.filt,
                )

            return lax.cond(ls.accepted, accepted_update, line_search_failed, 0)

        return lax.cond(fac.ok, with_factorization, factorization_failed, 0)

    def step(st: NewtonState) -> NewtonState:
        diverging = (
            jnp.max(jnp.abs(st.x), initial=0.0) > DIVERGENCE_LIMIT
        ) | ~jnp.all(jnp.isfinite(st.x))
        return lax.cond(
            diverging,
            lambda s: s._replace(
                status=jnp.asarray(
                    int(ExitStatus.DIVERGING_ITERATES), jnp.int32
                )
            ),
            iteration_body,
            st,
        )

    return init, step
