"""Interior-point method as a jitted device-resident iteration.

Behavioral port of the reference Wächter-Biegler-style primal-dual IPM with
filter line search (reference solver/interior_point.hpp:63-866) to a pure
JAX step function over an `IPMState` pytree:

  - the unbounded C++ `while` loops (line search backtracking :512-717, SOC
    retries :561-664, regularization escalation, μ decrease :827-831) become
    bounded `lax.while_loop`s with carry flags,
  - Eigen sparse triplet assembly (:426-448) becomes dense block assembly,
  - SimplicialLDLT becomes the blocked LDLᵀ in sleipnir_tpu.ops.ldlt,
  - feasibility restoration (:721-767), which solves a *different-shaped*
    subproblem, is signaled to the host driver via a status sentinel instead
    of being called recursively under jit.

The driver (solve_driver.py) runs `step` under `lax.while_loop` when no
callbacks/diagnostics are requested, or one jitted step per Python-loop
iteration otherwise.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sleipnir_tpu.optimization.solver import status_codes
from sleipnir_tpu.optimization.solver.exit_status import ExitStatus
from sleipnir_tpu.optimization.solver.funcs import (
    IPMFunctions,
    ScalingArrays,
    bind,
)
from sleipnir_tpu.optimization.solver.options import Options
from sleipnir_tpu.optimization.solver.util.filter import (
    FilterState,
    check_acceptance,
    make_filter,
    reset_filter,
    try_add,
)
from sleipnir_tpu.optimization.solver.kkt_backend import DenseBackend
from sleipnir_tpu.optimization.solver.util.kkt_error import (
    kkt_error_ipm_inf_products,
    kkt_error_ipm_one_products,
    unscaled_kkt_error_ipm_products,
)
from sleipnir_tpu.optimization.solver.util.step_rules import (
    fraction_to_the_boundary,
)

# Constants from the reference
TAU_MIN = 0.99  # interior_point.hpp:298
ALPHA_REDUCTION_FACTOR = 0.5  # :355
ALPHA_MIN = 1e-7  # :356
KAPPA_SOC = 0.99  # :646
KAPPA_SIGMA = 1e10  # :798
KAPPA_EPSILON = 10.0  # :821
KAPPA_MU = 0.2  # :310
THETA_MU = 1.5  # :314
MAX_SOC_ITERATIONS = 5  # :574
MAX_LINE_SEARCH_TRIPS = 64  # safety net (α halves from 1 past 1e-7 in 24)
MAX_BACKTRACKS = 24  # α ≤ 1 halves below ALPHA_MIN within 24 steps
DIVERGENCE_LIMIT = 1e10  # :405


class IPMState(NamedTuple):
    """Device-resident interior-point solver state.

    This is the TPU-native analog of the reference's (x, s, y, z, μ,
    iterations) in/out parameters (interior_point.hpp:122-134) plus the
    cached callback values it keeps in locals.
    """

    x: jnp.ndarray
    s: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    mu: jnp.ndarray
    tau: jnp.ndarray
    f: jnp.ndarray
    c_e: jnp.ndarray
    c_i: jnp.ndarray
    g: jnp.ndarray
    #: Backend-specific derivative storage (dense H/A_e/A_i arrays or
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
    alpha_max: jnp.ndarray
    alpha_z: jnp.ndarray
    #: Diagnostics: ∞-norms of the last accepted primal/dual steps.
    p_pr_inf: jnp.ndarray
    p_du_inf: jnp.ndarray
    #: Consecutive iterations the local-infeasibility certificate has
    #: held (see step(): the exit requires persistence).
    infeas_streak: jnp.ndarray
    #: Runtime parameter vector (non-decision variables; see funcs.bind).
    params: jnp.ndarray
    #: Problem scaling, recomputed per solve at x0 (reference problem.hpp:616).
    scaling: ScalingArrays


def _merge(pred, a, b):
    """Elementwise select between two same-structure pytrees."""
    return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)


def _one_norm(v):
    return jnp.sum(jnp.abs(v)) if v.shape[0] > 0 else jnp.asarray(0.0, v.dtype)


def make_interior_point(
    funcs: IPMFunctions,
    options: Options,
    *,
    in_feasibility_restoration: bool = False,
    stop_check: Callable | None = None,
    backend=None,
):
    """Build (init, step, resume) for the IPM on a fixed problem shape.

    `stop_check(state) -> bool` is the jit-compatible analog of the
    reference's iteration callbacks that can request a stop — used by
    feasibility restoration's early-exit check
    (reference interior_point.hpp:738-756).

    `backend` selects the KKT backend (kkt_backend.DenseBackend by default;
    kkt_banded.BandedBackend for direct-transcription OCP structure).
    """
    n = funcs.num_decision_variables
    me = funcs.num_equality_constraints
    mi = funcs.num_inequality_constraints
    dtype = jnp.float64 if options.dtype == "float64" else jnp.float32
    if backend is None:
        backend = DenseBackend(n, me, mi, dtype)
    tol = options.tolerance
    # Constraint regularization is forced to zero in feasibility restoration
    # because A_e can't be rank-deficient there (reference :350-352).
    gamma_min = 0.0 if in_feasibility_restoration else 1e-10

    def phi(f, s, mu):
        """Log-barrier merit φ_μ(x, s) = f − μ Σ ln sᵢ (reference :504)."""
        return f - mu * jnp.sum(jnp.log(s))

    def viol(c_e, c_i, s):
        """Constraint violation θ = ‖cₑ‖₁ + ‖cᵢ − s‖₁ (filter.hpp:53-57)."""
        return _one_norm(c_e) + _one_norm(c_i - s)

    # -- init --------------------------------------------------------------

    def init(x0, s0, y0, z0, mu0, iterations0, params, scaling) -> IPMState:
        params = jnp.asarray(params, dtype)
        scaling = ScalingArrays(*(jnp.asarray(a, dtype) for a in scaling))
        F = bind(funcs, params, scaling, dtype)
        x0 = jnp.asarray(x0, dtype)
        s0 = jnp.asarray(s0, dtype)
        y0 = jnp.asarray(y0, dtype)
        z0 = jnp.asarray(z0, dtype)
        f = F.f(x0)
        g = F.g(x0)
        c_e = F.c_e(x0)
        c_i = F.c_i(x0)
        derivs = backend.eval_derivs(F, x0, y0, z0)

        finite = (
            jnp.isfinite(f)
            & jnp.all(jnp.isfinite(g))
            & jnp.all(jnp.isfinite(c_e))
            & jnp.all(jnp.isfinite(c_i))
            & backend.all_finite(derivs)
        )

        E0 = unscaled_kkt_error_ipm_products(
            scaling,
            g,
            backend.AeT(derivs, y0),
            backend.AiT(derivs, z0),
            c_e,
            c_i,
            s0,
            y0,
            z0,
            jnp.asarray(0.0, dtype),
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

        return IPMState(
            x=x0,
            s=s0,
            y=y0,
            z=z0,
            mu=jnp.asarray(mu0, dtype),
            tau=jnp.asarray(TAU_MIN, dtype),
            f=f,
            c_e=c_e,
            c_i=c_i,
            g=g,
            derivs=derivs,
            E0=E0,
            filt=make_filter(viol(c_e, c_i, s0), dtype),
            prev_delta=jnp.asarray(0.0, dtype),
            delta=jnp.asarray(0.0, dtype),
            gamma=jnp.asarray(0.0, dtype),
            full_step_rejected_counter=jnp.asarray(0, jnp.int32),
            iterations=jnp.asarray(iterations0, jnp.int32),
            status=status,
            alpha=jnp.asarray(1.0, dtype),
            alpha_max=jnp.asarray(1.0, dtype),
            alpha_z=jnp.asarray(1.0, dtype),
            p_pr_inf=jnp.asarray(0.0, dtype),
            p_du_inf=jnp.asarray(0.0, dtype),
            infeas_streak=jnp.asarray(0, jnp.int32),
            params=params,
            scaling=scaling,
        )

    # -- per-iteration body ------------------------------------------------



    def finish_iteration(st, x1, s1, y1, z1, f1, ce1, ci1, iterations):
        """Refresh derivatives, the KKT error, and the barrier parameter
        after an accepted step or a restoration return
        (reference :808-862)."""
        F = bind(funcs, st.params, st.scaling, dtype)
        g1 = F.g(x1)
        derivs1 = backend.eval_derivs(F, x1, y1, z1)
        AeT_y1 = backend.AeT(derivs1, y1)
        AiT_z1 = backend.AiT(derivs1, z1)
        E0 = unscaled_kkt_error_ipm_products(
            st.scaling, g1, AeT_y1, AiT_z1, ce1, ci1, s1, y1, z1,
            jnp.asarray(0.0, dtype),
        )

        # Barrier parameter minimum μ_min = d_f·tol/10 (reference :294)
        mu_min = st.scaling.f * tol / 10.0

        def mu_cond(carry):
            mu_c, _tau_c, _filt_c = carry
            E_mu = kkt_error_ipm_inf_products(
                g1, AeT_y1, AiT_z1, ce1, ci1, s1, y1, z1, mu_c
            )
            return (mu_c > mu_min) & (E_mu <= KAPPA_EPSILON * mu_c)

        def mu_body(carry):
            mu_c, _tau_c, filt_c = carry
            mu_new = jnp.maximum(
                mu_min, jnp.minimum(KAPPA_MU * mu_c, mu_c**THETA_MU)
            )
            tau_new = jnp.maximum(TAU_MIN, 1.0 - mu_new)
            return mu_new, tau_new, reset_filter(filt_c)

        mu1, tau1, filt1 = lax.cond(
            E0 > tol,
            lambda c: lax.while_loop(mu_cond, mu_body, c),
            lambda c: c,
            (st.mu, st.tau, st.filt),
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
            s=s1,
            y=y1,
            z=z1,
            mu=mu1,
            tau=tau1,
            f=f1,
            c_e=ce1,
            c_i=ci1,
            g=g1,
            derivs=derivs1,
            E0=E0,
            filt=filt1,
            iterations=iterations,
            status=status,
        )

    def resume(st: IPMState, x1, s1, y1, z1, iterations) -> IPMState:
        """Resume the solve after host-side feasibility restoration updated
        the iterates (reference :769-771 then :808-862)."""
        F = bind(funcs, st.params, st.scaling, dtype)
        x1 = jnp.asarray(x1, dtype)
        s1 = jnp.asarray(s1, dtype)
        y1 = jnp.asarray(y1, dtype)
        z1 = jnp.asarray(z1, dtype)
        f1 = F.f(x1)
        ce1 = F.c_e(x1)
        ci1 = F.c_i(x1)
        return finish_iteration(
            st, x1, s1, y1, z1, f1, ce1, ci1, jnp.asarray(iterations) + 1
        )

    class LSCarry(NamedTuple):
        alpha: jnp.ndarray
        alpha_z: jnp.ndarray
        p_x: jnp.ndarray
        p_s: jnp.ndarray
        p_y: jnp.ndarray
        p_z: jnp.ndarray
        filt: FilterState
        fsrc: jnp.ndarray
        done: jnp.ndarray
        accepted: jnp.ndarray
        fr: jnp.ndarray
        tx: jnp.ndarray
        ts: jnp.ndarray
        ty: jnp.ndarray
        tz: jnp.ndarray
        tf: jnp.ndarray
        tce: jnp.ndarray
        tci: jnp.ndarray
        guard: jnp.ndarray

    def iteration_body(st: IPMState) -> IPMState:
        F = bind(funcs, st.params, st.scaling, dtype)
        x, s, y, z = st.x, st.s, st.y, st.z
        mu, tau = st.mu, st.tau
        f, c_e, c_i = st.f, st.c_e, st.c_i
        g, derivs = st.g, st.derivs

        # Σ = S⁻¹Z (reference :423-426)
        sigma = z / s if mi > 0 else s

        # rhs = −[∇f − Aₑᵀy − Aᵢᵀ(−Σcᵢ + μS⁻¹e + z); cₑ] (reference :442-448)
        rhs_top = -g
        if me > 0:
            rhs_top = rhs_top + backend.AeT(derivs, y)
        if mi > 0:
            rhs_top = rhs_top + backend.AiT(
                derivs, -sigma * c_i + mu / s + z
            )

        # Assemble + factor [H + AᵢᵀΣAᵢ, Aₑᵀ; Aₑ, 0] with inertia
        # correction (reference :428-465) — dense or block-tridiagonal
        # depending on the backend.
        fac = backend.factor(derivs, sigma, st.prev_delta, gamma_min)

        def compute_step(rhs_top_vec, rhs_bottom_vec, c_i_minus_s):
            """Newton-KKT solve + slack/dual recovery (reference :470-481),
            with iterative refinement for backward stability."""
            p_x, p_y = backend.solve_refined(
                derivs, sigma, fac, rhs_top_vec, rhs_bottom_vec
            )
            p_s = c_i_minus_s + (
                backend.Ai(derivs, p_x) if mi > 0 else c_i_minus_s * 0.0
            )
            p_z = mu / s - z - sigma * p_s if mi > 0 else p_s
            return p_x, p_s, p_y, p_z

        p_x, p_s, p_y, p_z = compute_step(rhs_top, -c_e, c_i - s)

        # Fraction-to-the-boundary (reference :487-497)
        alpha_max = fraction_to_the_boundary(s, p_s, tau)
        alpha_z0 = fraction_to_the_boundary(z, p_z, tau)
        fr_immediate = alpha_max < ALPHA_MIN

        current_cost = phi(f, s, mu)
        current_viol = viol(c_e, c_i, s)

        # D_ϕ = ∇f·pˣ − μ Σᵢ pᵢˢ/sᵢ (reference :501-509)
        D_phi = g @ p_x - (
            mu * jnp.sum(p_s / s) if mi > 0 else jnp.asarray(0.0, dtype)
        )

        # Feasible IPM: keep feasible inequalities feasible (reference :515-523)
        feasible_sub = (
            jnp.all(c_i > 0.0)
            if (options.feasible_ipm and mi > 0)
            else jnp.asarray(False)
        )

        # ---- backtracking filter line search (reference :512-717) --------

        def ls_cond(c: LSCarry):
            return ~c.done & (c.guard < MAX_LINE_SEARCH_TRIPS)

        def ls_body(c: LSCarry) -> LSCarry:
            tx = x + c.alpha * c.p_x
            tci = F.c_i(tx)
            ts = jnp.where(feasible_sub, tci, s + c.alpha * c.p_s)
            # Equality duals advance with the PRIMAL step size (Ipopt /
            # Wächter-Biegler eq. (8): λ_{k+1} = λ_k + α_k d_λ). The
            # reference instead uses α_z here (interior_point.hpp:523),
            # which lets y run away when the primal α collapses — measured
            # on cart-pole N=24/T=4: reference-style y-steps blow the duals
            # to 1e10 and the solve dies in restoration, while Ipopt-style
            # y-steps converge. A deliberate robustness improvement.
            ty = y + c.alpha * c.p_y
            tz = z + c.alpha_z * c.p_z
            tf = F.f(tx)
            tce = F.c_e(tx)

            nonfinite = ~(
                jnp.isfinite(tf)
                & jnp.all(jnp.isfinite(tce))
                & jnp.all(jnp.isfinite(tci))
            )

            # Filter acceptance (reference :545-549)
            acc, filt1 = try_add(
                c.filt,
                current_cost,
                current_viol,
                phi(tf, ts, mu),
                viol(tce, tci, ts),
                D_phi,
                c.alpha,
            )

            next_viol = viol(tce, tci, ts)
            soc_trigger = (
                ~nonfinite
                & ~acc
                & (c.alpha == alpha_max)
                & (next_viol >= current_viol)
            )

            # ---- second-order corrections (reference :557-664) -----------
            class SOCCarry(NamedTuple):
                p_x: jnp.ndarray
                p_s: jnp.ndarray
                p_y: jnp.ndarray
                p_z: jnp.ndarray
                a: jnp.ndarray
                az: jnp.ndarray
                ce_soc: jnp.ndarray
                cims_soc: jnp.ndarray
                soc_viol: jnp.ndarray
                acc: jnp.ndarray
                stop: jnp.ndarray
                filt: FilterState
                tx: jnp.ndarray
                ts: jnp.ndarray
                ty: jnp.ndarray
                tz: jnp.ndarray
                tf: jnp.ndarray
                tce: jnp.ndarray
                tci: jnp.ndarray
                it: jnp.ndarray

            def soc_body(sc: SOCCarry) -> SOCCarry:
                # cₑˢᵒᶜ = αˢᵒᶜcₑ + cₑ(trial) (reference :601-616)
                ce_soc = sc.a * sc.ce_soc + sc.tce
                cims_soc = sc.a * sc.cims_soc + sc.tci - sc.ts
                rhs_top2 = -g
                if me > 0:
                    rhs_top2 = rhs_top2 + backend.AeT(derivs, y)
                if mi > 0:
                    rhs_top2 = rhs_top2 + backend.AiT(
                        derivs, mu / s - sigma * cims_soc
                    )
                px2, ps2, py2, pz2 = compute_step(
                    rhs_top2, -ce_soc, cims_soc
                )
                a2 = fraction_to_the_boundary(s, ps2, tau)
                az2 = fraction_to_the_boundary(z, pz2, tau)
                tx2 = x + a2 * px2
                ts2 = s + a2 * ps2
                # Primal step size for equality duals (see ls_body).
                ty2 = y + a2 * py2
                tz2 = z + az2 * pz2
                tf2 = F.f(tx2)
                tce2 = F.c_e(tx2)
                tci2 = F.c_i(tx2)
                acc2, filt2 = try_add(
                    sc.filt,
                    current_cost,
                    current_viol,
                    phi(tf2, ts2, mu),
                    viol(tce2, tci2, ts2),
                    D_phi,
                    c.alpha,
                )
                nv = viol(tce2, tci2, ts2)
                # Stop when accepted, when violation reduction stalls
                # (reference :648-654), or after 5 corrections.
                stop = acc2 | (nv > KAPPA_SOC * sc.soc_viol) | (sc.it + 1 >= MAX_SOC_ITERATIONS)
                return SOCCarry(
                    p_x=px2,
                    p_s=ps2,
                    p_y=py2,
                    p_z=pz2,
                    a=a2,
                    az=az2,
                    ce_soc=ce_soc,
                    cims_soc=cims_soc,
                    soc_viol=nv,
                    acc=acc2,
                    stop=stop,
                    filt=filt2,
                    tx=tx2,
                    ts=ts2,
                    ty=ty2,
                    tz=tz2,
                    tf=tf2,
                    tce=tce2,
                    tci=tci2,
                    it=sc.it + 1,
                )

            soc_init = SOCCarry(
                p_x=c.p_x,
                p_s=c.p_s,
                p_y=c.p_y,
                p_z=c.p_z,
                a=c.alpha,
                az=c.alpha_z,
                ce_soc=c_e,
                cims_soc=c_i - s,
                soc_viol=next_viol,
                acc=jnp.asarray(False),
                stop=jnp.asarray(False),
                filt=filt1,
                tx=tx,
                ts=ts,
                ty=ty,
                tz=tz,
                tf=tf,
                tce=tce,
                tci=tci,
                it=jnp.asarray(0, jnp.int32),
            )

            soc = lax.cond(
                soc_trigger,
                lambda si: lax.while_loop(lambda sc: ~sc.stop, soc_body, si),
                lambda si: si,
                soc_init,
            )
            soc_accepted = soc_trigger & soc.acc
            filt_after = soc.filt  # includes filt1 when no SOC ran

            acc_total = acc | soc_accepted

            # Full-step rejection counter (reference :666-671)
            fsrc1 = jnp.where(
                ~nonfinite & ~acc_total & (c.alpha == alpha_max),
                c.fsrc + 1,
                c.fsrc,
            )

            # Filter reset heuristic (reference :673-684)
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

            # ---- batched backtracking ladder -------------------------
            # A rejected trial normally halves α and pays another
            # sequential while-loop trip (~0.3 ms on TPU regardless of
            # body size — docs/tpu_numerics.md "latency model"). Instead,
            # evaluate ALL remaining halving candidates in one batched
            # shot against the current filter — valid because filter
            # ENTRIES only change on acceptance, which terminates the
            # backtracking (util/filter.py try_add) — and jump α directly
            # to the first candidate the sequential loop would stop at:
            # an acceptance, a mid-ladder filter reset (fsrc ≥ 4 +
            # rejection-due-to-filter, reference :673-684), or the last
            # trial above α_min (whose trip runs the KKT fallback / FR
            # exit, reference :691-716). The landing trip re-evaluates
            # its candidate on the exact scalar path, so TPU vmap noise
            # in the prediction costs at most one extra trip, never a
            # wrong accept.
            def _jump(_):
                rs = ALPHA_REDUCTION_FACTOR ** jnp.arange(
                    1, MAX_BACKTRACKS + 1, dtype=dtype
                )
                alphas = c.alpha * rs  # (J,)
                idx = jnp.arange(MAX_BACKTRACKS)
                # Last sequential trial: first j whose halving would fall
                # below α_min.
                below = alphas * ALPHA_REDUCTION_FACTOR < ALPHA_MIN
                jlast = jnp.argmax(below)

                def trial(a):
                    tx_ = x + a * c.p_x
                    tci_ = F.c_i(tx_)
                    ts_ = jnp.where(feasible_sub, tci_, s + a * c.p_s)
                    tf_ = F.f(tx_)
                    tce_ = F.c_e(tx_)
                    return phi(tf_, ts_, mu), viol(tce_, tci_, ts_)

                tphis, tviols = jax.vmap(trial)(alphas)
                accs, rejected_pres, in_filters, finites, _sw, _ar = (
                    jax.vmap(
                        lambda a, tc, tv: check_acceptance(
                            filt_after, current_cost, current_viol, tc,
                            tv, D_phi, a,
                        )
                    )(alphas, tphis, tviols)
                )
                rejf = finites & ~rejected_pres & in_filters
                reset_possible = (fsrc1 >= 4) & (
                    filt_after.max_viol > current_viol / 10.0
                )
                stop = accs | (reset_possible & ~accs & rejf)
                stop = (stop & (idx <= jlast)) | (idx == jlast)
                jstop = jnp.argmax(stop)
                # last_rejection_due_to_filter entering the landing trip:
                # set by the last finite rejected trial jumped over
                # (try_add leaves it unchanged on nonfinite trials).
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

            # KKT-error-reduction fallback at minimum step (reference :691-716)
            def kkt_fallback(_):
                cur_err = kkt_error_ipm_one_products(
                    g,
                    backend.AeT(derivs, y),
                    backend.AiT(derivs, z),
                    c_e,
                    c_i,
                    s,
                    y,
                    z,
                    mu,
                )
                tx3 = x + alpha_max * c.p_x
                ts3 = s + alpha_max * c.p_s
                tf3 = F.f(tx3)
                tce3 = F.c_e(tx3)
                tci3 = F.c_i(tx3)
                g3 = F.g(tx3)

                # The Jacobians in the KKT-error products are independent
                # of the duals, so evaluate derivatives once at tx3 and
                # reuse them for both candidates below.
                d3 = backend.eval_derivs(F, tx3, y, z)
                # z always steps by its own fraction-to-the-boundary α_z
                # (reference interior_point.hpp:698) so trial z keeps its
                # positivity rule.
                tz3 = z + c.alpha_z * c.p_z

                def err_with(ay):
                    """KKT error of the trial with y-step size ay."""
                    ty = y + ay * c.p_y
                    return kkt_error_ipm_one_products(
                        g3,
                        backend.AeT(d3, ty),
                        backend.AiT(d3, tz3),
                        tce3,
                        tci3,
                        ts3,
                        ty,
                        tz3,
                        mu,
                    )

                # Candidate y-step sizes: the reference's α_z
                # (interior_point.hpp:698-701) and Ipopt's default primal α
                # ("alpha_for_y primal"). The full α_z dual jump is the
                # escape hatch on problems like Wächter-Biegler's
                # line-search-failure example, but it can also detonate the
                # duals (measured on cart-pole N=24/T=4: y reaches 1e8 and
                # the solve dies); picking the candidate with the lower
                # 1-norm KKT error keeps both behaviors.
                err_a = err_with(c.alpha_z)
                err_b = err_with(alpha_max)
                ay_best = jnp.where(err_a <= err_b, c.alpha_z, alpha_max)
                next_err = jnp.minimum(err_a, err_b)
                ty3 = y + ay_best * c.p_y
                ok = next_err <= 0.999 * cur_err
                return ok, tx3, ts3, ty3, tz3, tf3, tce3, tci3

            def no_fallback(_):
                zf = jnp.asarray(0.0, dtype)
                return (
                    jnp.asarray(False),
                    x * 0.0,
                    s * 0.0,
                    y * 0.0,
                    z * 0.0,
                    zf,
                    c_e * 0.0,
                    c_i * 0.0,
                )

            run_fallback = ~nonfinite & ~acc_total & ~reset_cond & hit_min
            kkt_ok, tx3, ts3, ty3, tz3, tf3, tce3, tci3 = lax.cond(
                run_fallback, kkt_fallback, no_fallback, 0
            )

            # ---- merge the control-flow paths ----------------------------
            guard = c.guard + 1
            guard_trip = guard >= MAX_LINE_SEARCH_TRIPS

            carry_nf = c._replace(
                alpha=alpha_next,
                done=hit_min,
                fr=hit_min,
                guard=guard,
            )
            carry_acc = LSCarry(
                alpha=jnp.where(soc_accepted, soc.a, c.alpha),
                alpha_z=jnp.where(soc_accepted, soc.az, c.alpha_z),
                p_x=jnp.where(soc_accepted, soc.p_x, c.p_x),
                p_s=jnp.where(soc_accepted, soc.p_s, c.p_s),
                p_y=jnp.where(soc_accepted, soc.p_y, c.p_y),
                p_z=jnp.where(soc_accepted, soc.p_z, c.p_z),
                filt=filt_after,
                fsrc=fsrc1,
                done=jnp.asarray(True),
                accepted=jnp.asarray(True),
                fr=jnp.asarray(False),
                tx=jnp.where(soc_accepted, soc.tx, tx),
                ts=jnp.where(soc_accepted, soc.ts, ts),
                ty=jnp.where(soc_accepted, soc.ty, ty),
                tz=jnp.where(soc_accepted, soc.tz, tz),
                tf=jnp.where(soc_accepted, soc.tf, tf),
                tce=jnp.where(soc_accepted, soc.tce, tce),
                tci=jnp.where(soc_accepted, soc.tci, tci),
                guard=guard,
            )
            carry_reset = c._replace(
                filt=filt_reset, fsrc=fsrc1, guard=guard
            )
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
                ts=ts3,
                ty=ty3,
                tz=tz3,
                tf=tf3,
                tce=tce3,
                tci=tci3,
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

        ls_init = LSCarry(
            alpha=alpha_max,
            alpha_z=alpha_z0,
            p_x=p_x,
            p_s=p_s,
            p_y=p_y,
            p_z=p_z,
            filt=st.filt,
            fsrc=st.full_step_rejected_counter,
            done=fr_immediate,
            accepted=jnp.asarray(False),
            fr=fr_immediate,
            tx=x,
            ts=s,
            ty=y,
            tz=z,
            tf=f,
            tce=c_e,
            tci=c_i,
            guard=jnp.asarray(0, jnp.int32),
        )
        ls = lax.while_loop(ls_cond, ls_body, ls_init)

        # ---- post-line-search update (reference :721-862) ----------------

        def accepted_update(_):
            fsrc = jnp.where(
                ls.alpha == alpha_max,
                jnp.asarray(0, jnp.int32),
                ls.fsrc,
            )
            x1, s1, y1 = ls.tx, ls.ts, ls.ty
            # z clamp to κ_Σ band around μ/s (reference :784-801)
            z1 = (
                jnp.clip(
                    ls.tz, (1.0 / KAPPA_SIGMA) * mu / s1, KAPPA_SIGMA * mu / s1
                )
                if mi > 0
                else ls.tz
            )
            p_pr = jnp.maximum(
                jnp.max(jnp.abs(ls.p_x), initial=0.0),
                jnp.max(jnp.abs(ls.p_s), initial=0.0),
            )
            p_du = jnp.maximum(
                jnp.max(jnp.abs(ls.p_y), initial=0.0),
                jnp.max(jnp.abs(ls.p_z), initial=0.0),
            )
            out = finish_iteration(
                st._replace(
                    filt=ls.filt,
                    prev_delta=fac.delta,
                    delta=fac.delta,
                    gamma=fac.gamma,
                    full_step_rejected_counter=fsrc,
                    alpha=ls.alpha,
                    alpha_max=alpha_max,
                    alpha_z=ls.alpha_z,
                    p_pr_inf=p_pr,
                    p_du_inf=p_du,
                ),
                x1,
                s1,
                y1,
                z1,
                ls.tf,
                ls.tce,
                ls.tci,
                st.iterations + 1,
            )
            return out

        def fr_update(_):
            def request_restoration(_):
                # Request feasibility restoration from the host driver
                # (reference :721-767); if already restoring, fail (:726-728).
                status = jnp.asarray(
                    int(ExitStatus.FEASIBILITY_RESTORATION_FAILED)
                    if in_feasibility_restoration
                    else status_codes.FEASIBILITY_RESTORATION_REQUESTED,
                    jnp.int32,
                )
                return st._replace(
                    status=status,
                    filt=ls.filt,
                    prev_delta=fac.delta,
                    delta=fac.delta,
                    gamma=fac.gamma,
                    # The restoration early-stop check reuses the line
                    # search's final α (reference :755).
                    alpha=ls.alpha,
                )

            if mi == 0:
                return request_restoration(0)

            # ---- slack resync before restoration -------------------------
            # The line search can collapse (α → 0) at an iterate that is
            # feasible but whose slacks have drifted away from cᵢ(x), so
            # θ = ‖cₑ‖₁ + ‖cᵢ − s‖₁ is dominated by pure slack
            # desynchronization (observed on cart-pole N=100: θ = 1.16 at
            # ‖cₑ‖₂ = 4.8e-8, min cᵢ = +3e-16). Before escalating to a
            # restoration solve — whose "converged" exit would misdiagnose
            # the feasible parent as locally infeasible — resynchronize
            # s ← cᵢ(x) wherever cᵢ > 0 (the feasible-IPM device of
            # reference interior_point.hpp:514-521, applied once). Only
            # taken when it removes ≥90% of θ, which makes it
            # self-limiting: a repeat failure at the same iterate has no
            # slack desync left to remove and falls through to restoration.
            theta_e = _one_norm(c_e)
            s_sync = jnp.where(c_i > 0.0, c_i, s)
            theta_slack_after = jnp.sum(
                jnp.where(c_i > 0.0, 0.0, jnp.abs(c_i - s))
            )
            resync_ok = (theta_e + theta_slack_after) <= 0.1 * viol(
                c_e, c_i, s
            )

            def do_resync(_):
                s1 = s_sync
                # Keep z in the κ_Σ band around μ/s after the jump in s
                # (reference :784-801).
                z1 = jnp.clip(
                    z, (1.0 / KAPPA_SIGMA) * mu / s1, KAPPA_SIGMA * mu / s1
                )
                # θ changed discontinuously; old filter entries would block
                # the next steps, so clear them.
                return finish_iteration(
                    st._replace(
                        filt=reset_filter(ls.filt),
                        prev_delta=fac.delta,
                        delta=fac.delta,
                        gamma=fac.gamma,
                        alpha=ls.alpha,
                    ),
                    x,
                    s1,
                    y,
                    z1,
                    f,
                    c_e,
                    c_i,
                    st.iterations + 1,
                )

            return lax.cond(resync_ok, do_resync, request_restoration, 0)

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

    # -- full step with iteration-top checks -------------------------------

    def step(st: IPMState) -> IPMState:
        # Local infeasibility and divergence checks (reference :387-408
        # and solver/util/is_locally_infeasible.hpp:18-61)
        if me > 0:
            eq_infeasible = (
                jnp.linalg.norm(backend.AeT(st.derivs, st.c_e)) < 1e-6
            ) & (jnp.linalg.norm(st.c_e) > 1e-2)
        else:
            eq_infeasible = jnp.asarray(False)
        if mi > 0:
            c_i_plus = jnp.minimum(st.c_i, 0.0)
            ineq_infeasible = (
                jnp.linalg.norm(backend.AiT(st.derivs, c_i_plus)) < 1e-6
            ) & (jnp.linalg.norm(c_i_plus) > 1e-6)
        else:
            ineq_infeasible = jnp.asarray(False)
        # PERSISTENCE requirement (robustness improvement over the
        # reference, which exits on the first crossing,
        # interior_point.hpp:387-403): the KNITRO §6 certificate
        # ‖Aᵀc‖→0 ∧ ‖c‖>ε can hold transiently at iterates the line
        # search merely passes through — observed on cart-pole N=24/T=4
        # (spurious LOCALLY_INFEASIBLE on a feasible problem) and under
        # injected 1e-8 derivative noise (tests/solver/
        # test_noise_robustness.py). Require 5 consecutive iterations.
        infeas_now = eq_infeasible | ineq_infeasible
        infeas_streak = jnp.where(
            infeas_now, st.infeas_streak + 1, 0
        ).astype(jnp.int32)
        locally_infeasible = infeas_streak >= 5
        st = st._replace(infeas_streak=infeas_streak)
        diverging = (
            (jnp.max(jnp.abs(st.x), initial=0.0) > DIVERGENCE_LIMIT)
            | ~jnp.all(jnp.isfinite(st.x))
            | (jnp.max(jnp.abs(st.s), initial=0.0) > DIVERGENCE_LIMIT)
            | ~jnp.all(jnp.isfinite(st.s))
        )
        requested_stop = (
            stop_check(st) if stop_check is not None else jnp.asarray(False)
        )

        early_status = jnp.where(
            locally_infeasible,
            int(ExitStatus.LOCALLY_INFEASIBLE),
            jnp.where(
                diverging,
                int(ExitStatus.DIVERGING_ITERATES),
                int(ExitStatus.CALLBACK_REQUESTED_STOP),
            ),
        ).astype(jnp.int32)
        early = locally_infeasible | diverging | requested_stop

        return lax.cond(
            early,
            lambda s: s._replace(status=early_status),
            iteration_body,
            st,
        )

    return init, step, resume
