"""Sequential quadratic programming for equality-constrained problems.

Behavioral port of reference solver/sqp.hpp:91-596: the IPM skeleton minus
slacks and barrier — KKT system [H Aₑᵀ; Aₑ 0], filter line search with
second-order corrections, accept-if-KKT-error-reduced fallback, and
feasibility restoration (signaled to the host driver via a status sentinel).
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
    ScalingArrays,
    SQPFunctions,
    bind,
)
from sleipnir_tpu.optimization.solver.kkt_backend import DenseBackend
from sleipnir_tpu.optimization.solver.options import Options
from sleipnir_tpu.optimization.solver.util.filter import (
    FilterState,
    check_acceptance,
    make_filter,
    reset_filter,
    try_add,
)
from sleipnir_tpu.optimization.solver.util.kkt_error import (
    kkt_error_sqp_one_products,
    unscaled_kkt_error_sqp_products,
)

ALPHA_REDUCTION_FACTOR = 0.5  # sqp.hpp:237
ALPHA_MIN = 1e-7  # sqp.hpp:238
MAX_BACKTRACKS = 24  # α ≤ 1 halves below ALPHA_MIN within 24 steps
KAPPA_SOC = 0.99  # sqp.hpp:440
MAX_SOC_ITERATIONS = 5  # sqp.hpp:390
MAX_LINE_SEARCH_TRIPS = 64
DIVERGENCE_LIMIT = 1e10  # sqp.hpp:273


class SQPState(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    f: jnp.ndarray
    c_e: jnp.ndarray
    g: jnp.ndarray
    #: Backend-specific derivative storage (dense H/A_e arrays or
    #: per-stage banded blocks).
    derivs: object
    E0: jnp.ndarray
    filt: FilterState
    prev_delta: jnp.ndarray
    delta: jnp.ndarray
    gamma: jnp.ndarray
    full_step_rejected_counter: jnp.ndarray
    iterations: jnp.ndarray
    status: jnp.ndarray
    alpha: jnp.ndarray
    #: Consecutive iterations the local-infeasibility certificate has
    #: held (see step(): the exit requires persistence).
    infeas_streak: jnp.ndarray
    #: Runtime parameter vector (non-decision variables; see funcs.bind).
    params: jnp.ndarray
    #: Problem scaling, recomputed per solve at x0 (reference problem.hpp:477).
    scaling: ScalingArrays


def _merge(pred, a, b):
    return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)


def _one_norm(v):
    return jnp.sum(jnp.abs(v)) if v.shape[0] > 0 else jnp.asarray(0.0, v.dtype)


def make_sqp(funcs: SQPFunctions, options: Options, *, backend=None):
    """Build (init, step, resume) for SQP on a fixed problem shape.

    `backend` selects the KKT backend (kkt_backend.DenseBackend by
    default; kkt_banded.BandedBackend for direct-transcription OCP
    structure — the same seam as the IPM, so equality-only OCPs get the
    O(N) block-tridiagonal path)."""
    n = funcs.num_decision_variables
    me = funcs.num_equality_constraints
    dtype = jnp.float64 if options.dtype == "float64" else jnp.float32
    tol = options.tolerance
    if backend is None:
        backend = DenseBackend(n, me, 0, dtype)

    # Adapt the SQP callbacks to the (y, z)-dual interface the backends
    # consume (mi = 0: A_i/c_i are empty).
    ipm_funcs = IPMFunctions(
        num_decision_variables=n,
        num_equality_constraints=me,
        num_inequality_constraints=0,
        f=funcs.f,
        g=funcs.g,
        H=lambda x, y, z, p, sc: funcs.H(x, y, p, sc),
        H_c=lambda x, y, z, p, sc: funcs.H_c(x, y, p, sc),
        c_e=funcs.c_e,
        A_e=funcs.A_e,
        c_i=lambda x, p, sc: jnp.zeros((0,), x.dtype),
        A_i=lambda x, p, sc: jnp.zeros((0, n), x.dtype),
    )
    zeros_mi = jnp.zeros((0,))

    def init(x0, params, scaling, y0=None, iterations0=0) -> SQPState:
        params = jnp.asarray(params, dtype)
        scaling = ScalingArrays(*(jnp.asarray(a, dtype) for a in scaling))
        F = bind(funcs, params, scaling, dtype)
        x0 = jnp.asarray(x0, dtype)
        y0 = (
            jnp.zeros((me,), dtype)
            if y0 is None
            else jnp.asarray(y0, dtype)
        )
        Fi = bind(ipm_funcs, params, scaling, dtype)
        f = F.f(x0)
        g = F.g(x0)
        c_e = F.c_e(x0)
        derivs = backend.eval_derivs(Fi, x0, y0, zeros_mi.astype(dtype))
        finite = (
            jnp.isfinite(f)
            & jnp.all(jnp.isfinite(g))
            & jnp.all(jnp.isfinite(c_e))
            & backend.all_finite(derivs)
        )
        E0 = unscaled_kkt_error_sqp_products(
            scaling, g, backend.AeT(derivs, y0), c_e, y0
        )
        if me > n:
            status = jnp.asarray(int(ExitStatus.TOO_FEW_DOFS), jnp.int32)
        else:
            status = jnp.where(
                ~finite,
                int(ExitStatus.NONFINITE_INITIAL_GUESS),
                jnp.where(
                    E0 <= tol, int(ExitStatus.SUCCESS), status_codes.RUNNING
                ),
            ).astype(jnp.int32)
        return SQPState(
            x=x0,
            y=y0,
            f=f,
            c_e=c_e,
            g=g,
            derivs=derivs,
            E0=E0,
            filt=make_filter(_one_norm(c_e), dtype),
            prev_delta=jnp.asarray(0.0, dtype),
            delta=jnp.asarray(0.0, dtype),
            gamma=jnp.asarray(0.0, dtype),
            full_step_rejected_counter=jnp.asarray(0, jnp.int32),
            iterations=jnp.asarray(iterations0, jnp.int32),
            status=status,
            alpha=jnp.asarray(1.0, dtype),
            infeas_streak=jnp.asarray(0, jnp.int32),
            params=params,
            scaling=scaling,
        )

    def finish_iteration(st, x1, y1, f1, ce1, iterations):
        """Refresh derivatives, KKT error, and exit conditions after an
        accepted step or restoration return (reference sqp.hpp:560-592)."""
        F = bind(funcs, st.params, st.scaling, dtype)
        Fi = bind(ipm_funcs, st.params, st.scaling, dtype)
        g1 = F.g(x1)
        derivs1 = backend.eval_derivs(Fi, x1, y1, zeros_mi.astype(dtype))
        E0 = unscaled_kkt_error_sqp_products(
            st.scaling, g1, backend.AeT(derivs1, y1), ce1, y1
        )
        iterations = jnp.asarray(iterations, jnp.int32)
        status = jnp.where(
            iterations >= options.max_iterations,
            int(ExitStatus.MAX_ITERATIONS_EXCEEDED),
            jnp.where(
                E0 <= tol, int(ExitStatus.SUCCESS), status_codes.RUNNING
            ),
        ).astype(jnp.int32)
        return st._replace(
            x=x1,
            y=y1,
            f=f1,
            c_e=ce1,
            g=g1,
            derivs=derivs1,
            E0=E0,
            iterations=iterations,
            status=status,
        )

    def resume(st: SQPState, x1, y1, iterations) -> SQPState:
        """Resume after host-side feasibility restoration
        (reference sqp.hpp:544-545 then :560-592)."""
        F = bind(funcs, st.params, st.scaling, dtype)
        x1 = jnp.asarray(x1, dtype)
        y1 = jnp.asarray(y1, dtype)
        return finish_iteration(
            st, x1, y1, F.f(x1), F.c_e(x1), jnp.asarray(iterations) + 1
        )

    class LSCarry(NamedTuple):
        alpha: jnp.ndarray
        p_x: jnp.ndarray
        p_y: jnp.ndarray
        filt: FilterState
        fsrc: jnp.ndarray
        done: jnp.ndarray
        accepted: jnp.ndarray
        fr: jnp.ndarray
        tx: jnp.ndarray
        ty: jnp.ndarray
        tf: jnp.ndarray
        tce: jnp.ndarray
        guard: jnp.ndarray

    def iteration_body(st: SQPState) -> SQPState:
        F = bind(funcs, st.params, st.scaling, dtype)
        Fi = bind(ipm_funcs, st.params, st.scaling, dtype)
        x, y = st.x, st.y
        f, c_e = st.f, st.c_e
        g, derivs = st.g, st.derivs
        sigma0 = zeros_mi.astype(dtype)

        # [H Aₑᵀ; Aₑ 0] assembled + factored by the backend with inertia
        # correction (reference sqp.hpp:290-306).
        rhs_top = -g + (backend.AeT(derivs, y) if me > 0 else 0.0)

        fac = backend.factor(derivs, sigma0, st.prev_delta, 1e-10)

        def compute_step(rhs_top_vec, rhs_bottom_vec):
            return backend.solve_refined(
                derivs, sigma0, fac, rhs_top_vec, rhs_bottom_vec
            )

        p_x, p_y = compute_step(rhs_top, -c_e)
        alpha_max = jnp.asarray(1.0, dtype)
        D_phi = g @ p_x
        current_viol = _one_norm(c_e)

        def ls_body(c: LSCarry) -> LSCarry:
            tx = x + c.alpha * c.p_x
            ty = y + c.alpha * c.p_y
            tf = F.f(tx)
            tce = F.c_e(tx)
            nonfinite = ~(jnp.isfinite(tf) & jnp.all(jnp.isfinite(tce)))

            acc, filt1 = try_add(
                c.filt, f, current_viol, tf, _one_norm(tce), D_phi, c.alpha
            )

            next_viol = _one_norm(tce)
            soc_trigger = (
                ~nonfinite
                & ~acc
                & (c.alpha == alpha_max)
                & (next_viol >= current_viol)
            )

            # Second-order corrections (reference sqp.hpp:375-456)
            class SOCCarry(NamedTuple):
                p_x: jnp.ndarray
                p_y: jnp.ndarray
                a: jnp.ndarray
                ce_soc: jnp.ndarray
                soc_viol: jnp.ndarray
                acc: jnp.ndarray
                stop: jnp.ndarray
                filt: FilterState
                tx: jnp.ndarray
                ty: jnp.ndarray
                tf: jnp.ndarray
                tce: jnp.ndarray
                it: jnp.ndarray

            def soc_body(sc: SOCCarry) -> SOCCarry:
                ce_soc = sc.a * sc.ce_soc + sc.tce
                px2, py2 = compute_step(rhs_top, -ce_soc)
                tx2 = x + sc.a * px2
                ty2 = y + sc.a * py2
                tf2 = F.f(tx2)
                tce2 = F.c_e(tx2)
                acc2, filt2 = try_add(
                    sc.filt,
                    f,
                    current_viol,
                    tf2,
                    _one_norm(tce2),
                    D_phi,
                    c.alpha,
                )
                nv = _one_norm(tce2)
                stop = (
                    acc2
                    | (nv > KAPPA_SOC * sc.soc_viol)
                    | (sc.it + 1 >= MAX_SOC_ITERATIONS)
                )
                return SOCCarry(
                    p_x=px2,
                    p_y=py2,
                    a=sc.a,
                    ce_soc=ce_soc,
                    soc_viol=nv,
                    acc=acc2,
                    stop=stop,
                    filt=filt2,
                    tx=tx2,
                    ty=ty2,
                    tf=tf2,
                    tce=tce2,
                    it=sc.it + 1,
                )

            soc_init = SOCCarry(
                p_x=c.p_x,
                p_y=c.p_y,
                a=c.alpha,
                ce_soc=c_e,
                soc_viol=next_viol,
                acc=jnp.asarray(False),
                stop=jnp.asarray(False),
                filt=filt1,
                tx=tx,
                ty=ty,
                tf=tf,
                tce=tce,
                it=jnp.asarray(0, jnp.int32),
            )
            soc = lax.cond(
                soc_trigger,
                lambda si: lax.while_loop(lambda sc: ~sc.stop, soc_body, si),
                lambda si: si,
                soc_init,
            )
            soc_accepted = soc_trigger & soc.acc
            filt_after = soc.filt
            acc_total = acc | soc_accepted

            fsrc1 = jnp.where(
                ~nonfinite & ~acc_total & (c.alpha == alpha_max),
                c.fsrc + 1,
                c.fsrc,
            )
            reset_cond = (
                ~nonfinite
                & ~acc_total
                & (fsrc1 >= 4)
                & (filt_after.max_viol > current_viol / 10.0)
                & filt_after.last_rejection_due_to_filter
            )
            filt_reset = reset_filter(filt_after)._replace(
                max_viol=filt_after.max_viol * 0.1
            )

            alpha_next = c.alpha * ALPHA_REDUCTION_FACTOR
            hit_min = alpha_next < ALPHA_MIN

            # Batched backtracking ladder — one vectorized evaluation of
            # every remaining halving candidate replaces the sequential
            # trips (see interior_point.py ls_body for the semantics
            # argument: filter entries only change on acceptance, which
            # terminates the backtracking; the landing trip re-evaluates
            # its candidate on the exact scalar path).
            def _jump(_):
                rs = ALPHA_REDUCTION_FACTOR ** jnp.arange(
                    1, MAX_BACKTRACKS + 1, dtype=dtype
                )
                alphas = c.alpha * rs
                idx = jnp.arange(MAX_BACKTRACKS)
                below = alphas * ALPHA_REDUCTION_FACTOR < ALPHA_MIN
                jlast = jnp.argmax(below)

                def trial(a):
                    tx_ = x + a * c.p_x
                    tf_ = F.f(tx_)
                    tce_ = F.c_e(tx_)
                    return tf_, _one_norm(tce_)

                tfs, tviols = jax.vmap(trial)(alphas)
                accs, rejected_pres, in_filters, finites, _sw, _ar = (
                    jax.vmap(
                        lambda a, tc, tv: check_acceptance(
                            filt_after, f, current_viol, tc, tv, D_phi, a
                        )
                    )(alphas, tfs, tviols)
                )
                rejf = finites & ~rejected_pres & in_filters
                reset_possible = (fsrc1 >= 4) & (
                    filt_after.max_viol > current_viol / 10.0
                )
                stop = accs | (reset_possible & ~accs & rejf)
                stop = (stop & (idx <= jlast)) | (idx == jlast)
                jstop = jnp.argmax(stop)
                prior = (idx < jstop) & finites
                lastp = jnp.max(jnp.where(prior, idx, -1))
                flag = jnp.where(
                    lastp >= 0,
                    rejf[jnp.maximum(lastp, 0)],
                    filt_after.last_rejection_due_to_filter,
                )
                return alphas[jstop], flag

            def _no_jump(_):
                return alpha_next, filt_after.last_rejection_due_to_filter

            run_jump = ~nonfinite & ~acc_total & ~reset_cond & ~hit_min
            alpha_jumped, flag_jumped = lax.cond(
                run_jump, _jump, _no_jump, 0
            )

            def kkt_fallback(_):
                cur_err = kkt_error_sqp_one_products(
                    g, backend.AeT(derivs, y), c_e, y
                )
                tx3 = x + alpha_max * c.p_x
                ty3 = y + alpha_max * c.p_y
                tf3 = F.f(tx3)
                tce3 = F.c_e(tx3)
                d3 = backend.eval_derivs(Fi, tx3, ty3, sigma0)
                next_err = kkt_error_sqp_one_products(
                    F.g(tx3), backend.AeT(d3, ty3), tce3, ty3
                )
                ok = next_err <= 0.999 * cur_err
                return ok, tx3, ty3, tf3, tce3

            def no_fallback(_):
                zf = jnp.asarray(0.0, dtype)
                return jnp.asarray(False), x * 0.0, y * 0.0, zf, c_e * 0.0

            run_fallback = ~nonfinite & ~acc_total & ~reset_cond & hit_min
            kkt_ok, tx3, ty3, tf3, tce3 = lax.cond(
                run_fallback, kkt_fallback, no_fallback, 0
            )

            guard = c.guard + 1
            guard_trip = guard >= MAX_LINE_SEARCH_TRIPS

            carry_nf = c._replace(
                alpha=alpha_next, done=hit_min, fr=hit_min, guard=guard
            )
            carry_acc = LSCarry(
                alpha=jnp.where(soc_accepted, soc.a, c.alpha),
                p_x=jnp.where(soc_accepted, soc.p_x, c.p_x),
                p_y=jnp.where(soc_accepted, soc.p_y, c.p_y),
                filt=filt_after,
                fsrc=fsrc1,
                done=jnp.asarray(True),
                accepted=jnp.asarray(True),
                fr=jnp.asarray(False),
                tx=jnp.where(soc_accepted, soc.tx, tx),
                ty=jnp.where(soc_accepted, soc.ty, ty),
                tf=jnp.where(soc_accepted, soc.tf, tf),
                tce=jnp.where(soc_accepted, soc.tce, tce),
                guard=guard,
            )
            carry_reset = c._replace(filt=filt_reset, fsrc=fsrc1, guard=guard)
            carry_reduce = c._replace(
                alpha=alpha_jumped,
                filt=filt_after._replace(
                    last_rejection_due_to_filter=flag_jumped
                ),
                fsrc=fsrc1,
                guard=guard,
                done=guard_trip,
                fr=guard_trip,
            )
            carry_kkt_acc = carry_reduce._replace(
                done=jnp.asarray(True),
                accepted=jnp.asarray(True),
                fr=jnp.asarray(False),
                tx=tx3,
                ty=ty3,
                tf=tf3,
                tce=tce3,
            )
            carry_fr = carry_reduce._replace(
                done=jnp.asarray(True),
                accepted=jnp.asarray(False),
                fr=jnp.asarray(True),
            )

            after_min = _merge(kkt_ok, carry_kkt_acc, carry_fr)
            low = _merge(hit_min, after_min, carry_reduce)
            notacc = _merge(reset_cond, carry_reset, low)
            fin = _merge(acc_total, carry_acc, notacc)
            return _merge(nonfinite, carry_nf, fin)

        ls = lax.while_loop(
            lambda c: ~c.done,
            ls_body,
            LSCarry(
                alpha=alpha_max,
                p_x=p_x,
                p_y=p_y,
                filt=st.filt,
                fsrc=st.full_step_rejected_counter,
                done=jnp.asarray(False),
                accepted=jnp.asarray(False),
                fr=jnp.asarray(False),
                tx=x,
                ty=y,
                tf=f,
                tce=c_e,
                guard=jnp.asarray(0, jnp.int32),
            ),
        )

        def accepted_update(_):
            fsrc = jnp.where(
                ls.alpha == alpha_max, jnp.asarray(0, jnp.int32), ls.fsrc
            )
            return finish_iteration(
                st._replace(
                    filt=ls.filt,
                    prev_delta=fac.delta,
                    delta=fac.delta,
                    gamma=fac.gamma,
                    full_step_rejected_counter=fsrc,
                    alpha=ls.alpha,
                ),
                ls.tx,
                ls.ty,
                ls.tf,
                ls.tce,
                st.iterations + 1,
            )

        def fr_update(_):
            return st._replace(
                status=jnp.asarray(
                    status_codes.FEASIBILITY_RESTORATION_REQUESTED, jnp.int32
                ),
                filt=ls.filt,
                prev_delta=fac.delta,
                delta=fac.delta,
                gamma=fac.gamma,
                alpha=ls.alpha,
            )

        def factorization_failed(_):
            return st._replace(
                status=jnp.asarray(
                    int(ExitStatus.FACTORIZATION_FAILED), jnp.int32
                )
            )

        return lax.cond(
            fac.ok,
            lambda _: lax.cond(ls.accepted, accepted_update, fr_update, 0),
            factorization_failed,
            0,
        )

    def step(st: SQPState) -> SQPState:
        # Local infeasibility check (reference
        # solver/util/is_locally_infeasible.hpp:18-38) via backend
        # products, with the 5-iteration persistence requirement (see
        # interior_point.step for the rationale).
        if me > 0:
            eq_infeasible = (
                jnp.linalg.norm(backend.AeT(st.derivs, st.c_e)) < 1e-6
            ) & (jnp.linalg.norm(st.c_e) > 1e-2)
        else:
            eq_infeasible = jnp.asarray(False)
        infeas_streak = jnp.where(
            eq_infeasible, st.infeas_streak + 1, 0
        ).astype(jnp.int32)
        locally_infeasible = infeas_streak >= 5
        st = st._replace(infeas_streak=infeas_streak)
        diverging = (
            jnp.max(jnp.abs(st.x), initial=0.0) > DIVERGENCE_LIMIT
        ) | ~jnp.all(jnp.isfinite(st.x))
        early_status = jnp.where(
            locally_infeasible,
            int(ExitStatus.LOCALLY_INFEASIBLE),
            int(ExitStatus.DIVERGING_ITERATES),
        ).astype(jnp.int32)
        return lax.cond(
            locally_infeasible | diverging,
            lambda s: s._replace(status=early_status),
            iteration_body,
            st,
        )

    return init, step, resume
