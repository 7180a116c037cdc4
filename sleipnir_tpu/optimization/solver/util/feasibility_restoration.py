"""Feasibility restoration: minimize constraint violation near the current
iterate when the line search fails.

Behavioral port of reference solver/util/feasibility_restoration.hpp:
solves

      min  ρ Σ (pₑ + nₑ + pᵢ + nᵢ) + ζ/2 (x − xᵣ)ᵀDᵣ(x − xᵣ)
  s.t. cₑ(x) − pₑ + nₑ = 0
       cᵢ(x) − pᵢ + nᵢ ≥ 0,  pₑ, nₑ, pᵢ, nᵢ ≥ 0

with ρ = 1e3, ζ = √μ_fr, Dᵣ = diag(min(1, 1/xᵣᵢ²)), via a second
interior-point instance on the augmented (n + 2mₑ + 2mᵢ)-variable problem
(reference :359-607). Because the subproblem has a different static shape,
the parent's jitted loop signals the host driver, which calls into here
(SURVEY.md §7 "hard parts").

An early-stop check replicates the reference's extra iteration callback
(reference interior_point.hpp:738-756): restoration stops as soon as the
parent filter would accept the candidate iterate with sufficiently reduced
constraint violation; the parent then resumes with least-squares multiplier
estimates (reference solver/util/lagrange_multiplier_estimate.hpp:57-135).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sleipnir_tpu.optimization.solver.exit_status import ExitStatus
from sleipnir_tpu.optimization.solver.funcs import IPMFunctions, ScalingArrays
from sleipnir_tpu.optimization.solver.interior_point import (
    make_interior_point,
)
from sleipnir_tpu.optimization.solver.options import Options
from sleipnir_tpu.optimization.solver.solve_driver import run_solver
from sleipnir_tpu.optimization.solver.util.filter import try_add

RHO = 1e3  # reference feasibility_restoration.hpp:391
KAPPA_SIGMA = 1e10


def compute_p_n(c: np.ndarray, rho: float, mu: float):
    """Initialize relaxation slacks p, n via Ipopt eq (33)
    (reference feasibility_restoration.hpp:52-100)."""
    b = rho * c - mu
    n = (-b + np.sqrt(b * b + 2.0 * rho * mu * c)) / (2.0 * rho)
    p = c + n
    return p, n


def restore(
    parent: IPMFunctions,
    parent_state,
    options: Options,
    *,
    base_mu: float | None = None,
    start_time: float | None = None,
    parent_backend=None,
):
    """Run feasibility restoration for an IPM (or SQP via mi=0) parent.

    When `parent_backend` is a BandedBackend, the restoration subproblem
    is itself solved on a banded backend: the relaxation variables
    pₑ/nₑ/pᵢ/nᵢ are stage-local (each belongs to its constraint row's
    stage), so the augmented problem stays block-tridiagonal with stage
    width m + 2p + 2q and restoration scales O(N) like the parent
    (reference feasibility_restoration.hpp:347-628 keeps the same sparse
    structure through Eigen).

    Returns (outcome, x, s, y, z, iterations) where outcome is one of
    "resume" (parent continues), or a terminal ExitStatus.
    """
    n = parent.num_decision_variables
    me = parent.num_equality_constraints
    mi = parent.num_inequality_constraints

    x_r = np.asarray(parent_state.x, dtype=np.float64)
    s_r = np.asarray(parent_state.s, dtype=np.float64)
    c_e0 = np.asarray(parent_state.c_e, dtype=np.float64)
    c_i0 = np.asarray(parent_state.c_i, dtype=np.float64)
    mu = float(base_mu) if base_mu is not None else float(parent_state.mu)
    alpha = float(parent_state.alpha)
    iterations0 = int(parent_state.iterations)

    def inf_norm(v):
        return float(np.max(np.abs(v))) if v.shape[0] else 0.0

    # fr_μ = max(μ, ‖cₑ‖_∞, ‖cᵢ − s‖_∞) (reference :396-397)
    fr_mu = max(mu, inf_norm(c_e0), inf_norm(c_i0 - s_r))
    zeta = math.sqrt(fr_mu)

    p_e0, n_e0 = compute_p_n(c_e0, RHO, fr_mu)
    p_i0, n_i0 = compute_p_n(c_i0 - s_r, RHO, fr_mu)

    with np.errstate(divide="ignore"):
        D_r = np.minimum(1.0, 1.0 / np.square(x_r))

    n_extra = 2 * me + 2 * mi
    N = n + n_extra
    MI = mi + n_extra

    fr_x0 = np.concatenate([x_r, p_e0, n_e0, p_i0, n_i0])
    fr_s0 = np.concatenate([s_r, np.ones(n_extra)])
    fr_y0 = np.zeros(me)
    with np.errstate(divide="ignore"):
        fr_z0 = np.concatenate(
            [
                fr_mu / s_r,
                fr_mu / p_e0,
                fr_mu / n_e0,
                fr_mu / p_i0,
                fr_mu / n_i0,
            ]
        )

    # Inherit parent's constraint scaling; cost unscaled; new rows unscaled
    # (reference :423-430).
    parent_sc = parent_state.scaling
    fr_scaling = ScalingArrays(
        f=jnp.asarray(1.0),
        c_e=jnp.asarray(parent_sc.c_e),
        c_i=jnp.concatenate(
            [jnp.asarray(parent_sc.c_i), jnp.ones(n_extra)]
        ),
    )

    D_r_j = jnp.asarray(D_r)
    x_r_j = jnp.asarray(x_r)

    use_banded = parent_backend is not None and hasattr(
        parent_backend, "structure"
    )
    if use_banded:
        return _restore_banded(
            parent,
            parent_state,
            options,
            parent_backend,
            x_r,
            s_r,
            c_e0,
            c_i0,
            mu,
            fr_mu,
            zeta,
            D_r_j,
            x_r_j,
            p_e0,
            n_e0,
            p_i0,
            n_i0,
            alpha,
            iterations0,
            start_time,
        )

    def fr_f(xp, params, scaling):
        xx = xp[:n]
        diff = xx - x_r_j
        return RHO * jnp.sum(xp[n:]) + 0.5 * zeta * diff @ (D_r_j * diff)

    def fr_g(xp, params, scaling):
        xx = xp[:n]
        return jnp.concatenate(
            [zeta * D_r_j * (xx - x_r_j), jnp.full((n_extra,), RHO)]
        )

    def fr_H(xp, yp, zp, params, scaling):
        out = jnp.zeros((N, N))
        out = out.at[:n, :n].set(
            jnp.diag(zeta * D_r_j) + parent.H_c(xp[:n], yp, zp[:mi], params, parent_sc)
        )
        return out

    def fr_H_c(xp, yp, zp, params, scaling):
        return jnp.zeros((N, N))

    def fr_c_e(xp, params, scaling):
        p_e = xp[n : n + me]
        n_e = xp[n + me : n + 2 * me]
        return parent.c_e(xp[:n], params, parent_sc) - p_e + n_e

    def fr_A_e(xp, params, scaling):
        out = jnp.zeros((me, N))
        out = out.at[:, :n].set(parent.A_e(xp[:n], params, parent_sc))
        if me > 0:
            eye = jnp.eye(me)
            out = out.at[:, n : n + me].set(-eye)
            out = out.at[:, n + me : n + 2 * me].set(eye)
        return out

    def fr_c_i(xp, params, scaling):
        p_i = xp[n + 2 * me : n + 2 * me + mi]
        n_i = xp[n + 2 * me + mi :]
        top = parent.c_i(xp[:n], params, parent_sc) - p_i + n_i
        return jnp.concatenate([top, xp[n:]])

    def fr_A_i(xp, params, scaling):
        out = jnp.zeros((MI, N))
        out = out.at[:mi, :n].set(parent.A_i(xp[:n], params, parent_sc))
        if mi > 0:
            eye = jnp.eye(mi)
            out = out.at[:mi, n + 2 * me : n + 2 * me + mi].set(-eye)
            out = out.at[:mi, n + 2 * me + mi :].set(eye)
        out = out.at[mi:, n:].set(jnp.eye(n_extra))
        return out

    fr_funcs = IPMFunctions(
        num_decision_variables=N,
        num_equality_constraints=me,
        num_inequality_constraints=MI,
        f=fr_f,
        g=fr_g,
        H=fr_H,
        H_c=fr_H_c,
        c_e=fr_c_e,
        A_e=fr_A_e,
        c_i=fr_c_i,
        A_i=fr_A_i,
    )

    # Early-stop check: parent filter accepts the candidate with a 10x
    # violation reduction (reference interior_point.hpp:738-756).
    parent_filter = parent_state.filt
    parent_g = jnp.asarray(parent_state.g)
    s_r_j = jnp.asarray(s_r)
    init_cost = parent_state.f - mu * jnp.sum(jnp.log(jnp.asarray(s_r)))
    init_viol = float(
        np.sum(np.abs(c_e0)) + np.sum(np.abs(c_i0 - s_r))
    )

    def stop_check(rst):
        tx = rst.x[:n]
        ts = rst.s[:mi]
        tf = parent.f(tx, rst.params, parent_sc)
        tce = parent.c_e(tx, rst.params, parent_sc)
        tci = parent.c_i(tx, rst.params, parent_sc)
        trial_cost = tf - mu * jnp.sum(jnp.log(ts))
        trial_viol = jnp.sum(jnp.abs(tce)) + jnp.sum(jnp.abs(tci - ts))
        D_phi_r = parent_g @ (tx - x_r_j) - mu * jnp.sum(
            (ts - s_r_j) / s_r_j
        )
        acc, _ = try_add(
            parent_filter,
            init_cost,
            init_viol,
            trial_cost,
            trial_viol,
            D_phi_r,
            alpha,
        )
        return (trial_viol < 0.9 * init_viol) & acc

    fr_init, fr_step, _ = make_interior_point(
        fr_funcs,
        options,
        in_feasibility_restoration=True,
        stop_check=stop_check,
    )

    state = fr_init(
        fr_x0,
        fr_s0,
        fr_y0,
        fr_z0,
        fr_mu,
        iterations0,
        parent_state.params,
        fr_scaling,
    )
    state = run_solver(
        state, fr_step, options, start_time=start_time
    )

    status = ExitStatus(int(state.status))
    x_new = np.asarray(state.x[:n])
    s_new = np.asarray(state.s[:mi])
    iterations_out = int(state.iterations)

    def resume_with_dual_estimates(x_res, s_res):
        # Estimate duals at the restored point and resume the parent
        # (reference :612-622).
        pj = parent_state.params
        g_new = np.asarray(parent.g(jnp.asarray(x_res), pj, parent_sc))
        A_e_new = np.asarray(parent.A_e(jnp.asarray(x_res), pj, parent_sc))
        A_i_new = np.asarray(parent.A_i(jnp.asarray(x_res), pj, parent_sc))
        y_est, z_est = lagrange_multiplier_estimate(
            g_new, A_e_new, A_i_new, s_res, mu
        )
        return "resume", x_res, s_res, y_est, z_est, iterations_out

    if status == ExitStatus.CALLBACK_REQUESTED_STOP:
        # Parent filter accepted.
        return resume_with_dual_estimates(x_new, s_new)
    if status == ExitStatus.SUCCESS:
        # Restoration converged. The reference translates this directly to
        # LOCALLY_INFEASIBLE (reference :623-624), but that misdiagnoses
        # two cases: (a) the parent iterate was already feasible and the
        # line search stalled for another reason (e.g. slack drift) — the
        # restoration subproblem then converges trivially; (b) restoration
        # genuinely reduced the parent violation, meaning the violation
        # minimizer has NOT been reached and the problem is not provably
        # locally infeasible (Ipopt only declares infeasibility when
        # restoration converges to a stationary point of the violation).
        # Resume in both cases; declare infeasibility only when
        # restoration converged without meaningful progress.
        pj = parent_state.params
        ce_new = np.asarray(parent.c_e(jnp.asarray(x_new), pj, parent_sc))
        ci_new = np.asarray(parent.c_i(jnp.asarray(x_new), pj, parent_sc))
        eps_feas = max(options.tolerance * 100.0, 1e-10)
        ce_ok = ce_new.shape[0] == 0 or np.max(np.abs(ce_new)) <= eps_feas
        ci_ok = ci_new.shape[0] == 0 or np.min(ci_new) >= -eps_feas
        theta_old = np.sum(np.abs(c_e0)) + np.sum(
            np.abs(np.minimum(c_i0, 0.0))
        )
        theta_new = np.sum(np.abs(ce_new)) + np.sum(
            np.abs(np.minimum(ci_new, 0.0))
        )
        improved = theta_new < 0.1 * theta_old
        if (ce_ok and ci_ok) or improved:
            s_res = (
                np.maximum(ci_new, mu) if mi > 0 else s_new
            )
            return resume_with_dual_estimates(x_new, s_res)
        return (
            ExitStatus.LOCALLY_INFEASIBLE,
            x_new,
            s_new,
            None,
            None,
            iterations_out,
        )
    return (
        ExitStatus.FEASIBILITY_RESTORATION_FAILED,
        x_new,
        s_new,
        None,
        None,
        iterations_out,
    )


def lagrange_multiplier_estimate(
    g: np.ndarray,
    A_e: np.ndarray,
    A_i: np.ndarray,
    s: np.ndarray,
    mu: float,
):
    """Least-squares dual estimate [y; z] = (ÂÂᵀ)⁻¹Â[∇f; −μe] with
    Â = [Aₑ 0; Aᵢ −S], z clamped to the κ_Σ band
    (reference solver/util/lagrange_multiplier_estimate.hpp:57-135)."""
    me = A_e.shape[0]
    mi = A_i.shape[0]
    n = g.shape[0]
    A_hat = np.zeros((me + mi, n + mi))
    A_hat[:me, :n] = A_e
    A_hat[me:, :n] = A_i
    if mi > 0:
        A_hat[me:, n:] = -np.diag(s)
    rhs_temp = np.concatenate([g, -mu * np.ones(mi)])
    lhs = A_hat @ A_hat.T
    rhs = A_hat @ rhs_temp
    try:
        sol = np.linalg.solve(lhs, rhs)
    except np.linalg.LinAlgError:
        sol = np.linalg.lstsq(lhs, rhs, rcond=None)[0]
    y = sol[:me]
    z = sol[me:]
    if mi > 0:
        z = np.clip(z, mu / (KAPPA_SIGMA * s), KAPPA_SIGMA * mu / s)
    return y, z


#: Attribute name under which compiled restoration bundles are cached ON
#: the parent BandedBackend object — the cache dies with the backend (no
#: unbounded module-global growth, no id()-reuse collisions) and the key
#: carries every Options field the compiled program captures.
_BANDED_FR_CACHE_ATTR = "_banded_fr_bundles"


def _banded_fr_bundle(parent, parent_backend, options, P0: int):
    """Build (or fetch) the COMPILED banded restoration solver for a
    parent problem structure.

    All per-invocation VALUES (restoration anchor x_r, damping D_r, zeta,
    the parent's barrier/step-size/filter state for the early-stop check,
    and the parent scaling) ride in the runtime parameter vector, so the
    jitted step/runner programs depend only on the problem STRUCTURE and
    compile exactly once per (parent, options) — previously every
    restoration invocation rebuilt the closures and paid a full retrace +
    XLA compile (~20 s per warm solve on CPU, minutes on TPU)."""
    from sleipnir_tpu.optimization.solver.kkt_banded import (
        BandedBackend,
        StageStructure,
    )
    from sleipnir_tpu.optimization.solver.solve_driver import make_runner
    from sleipnir_tpu.optimization.solver.util.filter import (
        MAX_FILTER_ENTRIES,
        FilterState,
    )

    key = (
        id(parent),
        P0,
        options.dtype,
        float(options.tolerance),
        int(options.max_iterations),
        bool(options.feasible_ipm),
    )
    # parent is an IPMFunctions NamedTuple (no attribute storage);
    # parent_backend is the 1:1 BandedBackend object, so the cache lives
    # there and dies with it.
    cache = getattr(parent_backend, _BANDED_FR_CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(parent_backend, _BANDED_FR_CACHE_ATTR, cache)
    bundle = cache.get(key)
    if bundle is not None:
        return bundle

    n = parent.num_decision_variables
    me = parent.num_equality_constraints
    mi = parent.num_inequality_constraints
    st = parent_backend.structure
    K, m, p, q = st.num_stages, st.stage_width, st.eq_pad, st.ineq_pad
    nb = int(np.asarray(st.border).shape[0])
    e2 = 2 * (p + q)  # relaxation slots per stage (incl. padded slots)
    m2 = m + e2
    N2 = K * m2 + nb
    MI2 = mi + K * e2

    ce_stage = np.asarray(st.ce_stage)
    ce_slot = np.asarray(st.ce_slot)
    ci_stage = np.asarray(st.ci_stage)
    ci_slot = np.asarray(st.ci_slot)

    # Flat layout: [x (n); extras (K*e2, stage-major)] with per-stage extras
    # ordered [p_e (p), n_e (p), p_i (q), n_i (q)]. Padded slots become
    # dummy variables with their own >=0 rows — they cost rho*t, start at
    # fr_mu, and decay with the barrier; keeping them preserves a uniform
    # stage width.
    pe_idx = n + ce_stage * e2 + ce_slot
    ne_idx = n + ce_stage * e2 + p + ce_slot
    pi_idx = n + ci_stage * e2 + 2 * p + ci_slot
    ni_idx = n + ci_stage * e2 + 2 * p + q + ci_slot
    pe_idx_j = jnp.asarray(pe_idx)
    ne_idx_j = jnp.asarray(ne_idx)
    pi_idx_j = jnp.asarray(pi_idx)
    ni_idx_j = jnp.asarray(ni_idx)

    ones_sc = ScalingArrays(
        f=jnp.asarray(1.0),
        c_e=jnp.ones(me),
        c_i=jnp.ones(mi),
    )

    # Runtime-parameter layout: [parent params; per-invocation values]
    M = MAX_FILTER_ENTRIES
    off: dict = {}
    cur = P0
    for name, size in (
        ("x_r", n),
        ("D_r", n),
        ("zeta", 1),
        ("mu", 1),
        ("alpha", 1),
        ("init_cost", 1),
        ("init_viol", 1),
        ("parent_g", n),
        ("s_r", mi),
        ("sc_f", 1),
        ("sc_ce", me),
        ("sc_ci", mi),
        ("f_costs", M),
        ("f_viols", M),
        ("f_valid", M),
        ("f_min", 1),
        ("f_max", 1),
        ("f_lr", 1),
    ):
        off[name] = (cur, cur + size)
        cur += size
    prm_len = cur

    def sl(prm, name):
        a, b = off[name]
        return prm[a:b]

    def sc1(prm, name):
        a, _ = off[name]
        return prm[a]

    def fr_f_raw(xp, prm):
        xx = xp[:n]
        diff = xx - sl(prm, "x_r")
        return RHO * jnp.sum(xp[n:]) + 0.5 * sc1(prm, "zeta") * diff @ (
            sl(prm, "D_r") * diff
        )

    def fr_ce_raw(xp, prm):
        base = parent.c_e(xp[:n], prm[:P0], ones_sc)
        if me == 0:
            return base
        return base - xp[pe_idx_j] + xp[ne_idx_j]

    def fr_ci_raw(xp, prm):
        top = parent.c_i(xp[:n], prm[:P0], ones_sc)
        if mi > 0:
            top = top - xp[pi_idx_j] + xp[ni_idx_j]
        return jnp.concatenate([top, xp[n:]])

    # Stage structure of the augmented problem
    parent_staged = np.asarray(st.var_perm).reshape(K, m)
    var_perm2 = np.empty(K * m2, dtype=np.int64)
    for k in range(K):
        var_perm2[k * m2 : k * m2 + m] = parent_staged[k]
        var_perm2[k * m2 + m : (k + 1) * m2] = (
            n + k * e2 + np.arange(e2)
        )
    ci_stage2 = np.concatenate(
        [ci_stage, np.repeat(np.arange(K), e2)]
    ).astype(ci_stage.dtype if mi else np.int64)
    ci_slot2 = np.concatenate(
        [ci_slot, np.tile(q + np.arange(e2), K)]
    ).astype(ci_slot.dtype if mi else np.int64)
    fr_structure = StageStructure(
        num_stages=K,
        stage_width=m2,
        var_perm=var_perm2,
        ce_stage=ce_stage,
        ce_slot=ce_slot,
        eq_pad=max(p, 1),
        ci_stage=ci_stage2,
        ci_slot=ci_slot2,
        ineq_pad=q + e2,
        # A border (shared-dt) column in the parent stays a border of the
        # augmented problem at the same flat position (< n).
        border=np.asarray(st.border),
    )
    dtype = jnp.float64 if options.dtype == "float64" else jnp.float32
    fr_backend = BandedBackend(
        fr_structure, fr_f_raw, fr_ce_raw, fr_ci_raw, N2, me, MI2, dtype
    )

    def _raise(*_a, **_k):  # pragma: no cover - dense callbacks unused
        raise NotImplementedError(
            "banded restoration never materializes dense derivatives"
        )

    fr_funcs = IPMFunctions(
        num_decision_variables=N2,
        num_equality_constraints=me,
        num_inequality_constraints=MI2,
        f=lambda xp, prm, sc: sc.f * fr_f_raw(xp, prm),
        g=lambda xp, prm, sc: sc.f
        * jnp.concatenate(
            [
                sc1(prm, "zeta")
                * sl(prm, "D_r")
                * (xp[:n] - sl(prm, "x_r")),
                jnp.full((N2 - n,), RHO, xp.dtype),
            ]
        ),
        H=_raise,
        H_c=_raise,
        c_e=lambda xp, prm, sc: sc.c_e * fr_ce_raw(xp, prm),
        A_e=_raise,
        c_i=lambda xp, prm, sc: sc.c_i * fr_ci_raw(xp, prm),
        A_i=_raise,
    )

    # Early-stop check: parent filter accepts the candidate with a 10x
    # violation reduction (reference interior_point.hpp:738-756). All
    # parent-state values come from the runtime params.
    def stop_check(rst):
        prm = rst.params
        parent_sc_rt = ScalingArrays(
            f=sc1(prm, "sc_f"),
            c_e=sl(prm, "sc_ce"),
            c_i=sl(prm, "sc_ci"),
        )
        mu_rt = sc1(prm, "mu")
        x_r_rt = sl(prm, "x_r")
        s_r_rt = sl(prm, "s_r")
        tx = rst.x[:n]
        ts = rst.s[:mi]
        tf = parent.f(tx, prm[:P0], parent_sc_rt)
        tce = parent.c_e(tx, prm[:P0], parent_sc_rt)
        tci = parent.c_i(tx, prm[:P0], parent_sc_rt)
        trial_cost = tf - mu_rt * jnp.sum(jnp.log(ts))
        trial_viol = jnp.sum(jnp.abs(tce)) + jnp.sum(jnp.abs(tci - ts))
        D_phi_r = sl(prm, "parent_g") @ (tx - x_r_rt) - mu_rt * jnp.sum(
            (ts - s_r_rt) / s_r_rt
        )
        parent_filter = FilterState(
            costs=sl(prm, "f_costs"),
            viols=sl(prm, "f_viols"),
            valid=sl(prm, "f_valid") > 0.5,
            min_viol=sc1(prm, "f_min"),
            max_viol=sc1(prm, "f_max"),
            last_rejection_due_to_filter=sc1(prm, "f_lr") > 0.5,
        )
        acc, _ = try_add(
            parent_filter,
            sc1(prm, "init_cost"),
            sc1(prm, "init_viol"),
            trial_cost,
            trial_viol,
            D_phi_r,
            sc1(prm, "alpha"),
        )
        return (trial_viol < 0.9 * sc1(prm, "init_viol")) & acc

    fr_init, fr_step, _ = make_interior_point(
        fr_funcs,
        options,
        in_feasibility_restoration=True,
        stop_check=stop_check,
        backend=fr_backend,
    )
    runner = make_runner(fr_step)

    bundle = {
        "fr_init": jax.jit(fr_init),
        "fr_step": fr_step,
        "runner": runner,
        "off": off,
        "prm_len": prm_len,
        "dims": (n, me, mi, K, e2, N2, MI2),
        "idx": (pe_idx, ne_idx, pi_idx, ni_idx),
        # strong ref keeps the id(parent) key component stable
        "_refs": (parent,),
    }
    cache[key] = bundle
    return bundle


def _restore_banded(
    parent,
    parent_state,
    options,
    parent_backend,
    x_r,
    s_r,
    c_e0,
    c_i0,
    mu,
    fr_mu,
    zeta,
    D_r_j,
    x_r_j,
    p_e0,
    n_e0,
    p_i0,
    n_i0,
    alpha,
    iterations0,
    start_time,
):
    """Stage-banded feasibility restoration (see restore()); the compiled
    solver comes from _banded_fr_bundle and is reused across invocations."""
    P0 = int(np.asarray(parent_state.params).shape[0])
    bundle = _banded_fr_bundle(parent, parent_backend, options, P0)
    n, me, mi, K, e2, N2, MI2 = bundle["dims"]
    pe_idx, ne_idx, pi_idx, ni_idx = bundle["idx"]
    off = bundle["off"]

    parent_sc = parent_state.scaling
    filt = parent_state.filt
    init_cost = float(parent_state.f) - mu * float(
        np.sum(np.log(np.asarray(s_r)))
    ) if mi > 0 else float(parent_state.f)
    init_viol = float(np.sum(np.abs(c_e0)) + np.sum(np.abs(c_i0 - s_r)))

    prm = np.zeros(bundle["prm_len"], dtype=np.float64)
    prm[:P0] = np.asarray(parent_state.params, dtype=np.float64)

    def put(name, value):
        a, b = off[name]
        prm[a:b] = np.asarray(value, dtype=np.float64).reshape(b - a)

    put("x_r", x_r)
    put("D_r", np.asarray(D_r_j))
    put("zeta", zeta)
    put("mu", mu)
    put("alpha", alpha)
    put("init_cost", init_cost)
    put("init_viol", init_viol)
    put("parent_g", np.asarray(parent_state.g))
    put("s_r", s_r)
    put("sc_f", np.asarray(parent_sc.f))
    put("sc_ce", np.asarray(parent_sc.c_e))
    put("sc_ci", np.asarray(parent_sc.c_i))
    put("f_costs", np.asarray(filt.costs))
    put("f_viols", np.asarray(filt.viols))
    put("f_valid", np.asarray(filt.valid, dtype=np.float64))
    put("f_min", np.asarray(filt.min_viol))
    put("f_max", np.asarray(filt.max_viol))
    put("f_lr", np.asarray(filt.last_rejection_due_to_filter, np.float64))

    fr_scaling = ScalingArrays(
        f=jnp.asarray(1.0),
        c_e=jnp.asarray(parent_sc.c_e),
        c_i=jnp.concatenate(
            [jnp.asarray(parent_sc.c_i), jnp.ones(K * e2)]
        ),
    )

    # Starting point: dummies at fr_mu with synchronized slacks
    extras0 = np.full(K * e2, fr_mu)
    # (border variables already live inside x_r's flat positions < n; the
    # augmented vector is [x (n); extras (K*e2)] exactly as before)
    fr_x0 = np.concatenate([x_r, extras0])
    fr_x0[pe_idx] = p_e0
    fr_x0[ne_idx] = n_e0
    fr_x0[pi_idx] = p_i0
    fr_x0[ni_idx] = n_i0
    fr_s0 = np.concatenate([s_r, fr_x0[n:]])
    fr_y0 = np.zeros(me)
    with np.errstate(divide="ignore"):
        fr_z0 = np.concatenate([fr_mu / s_r, fr_mu / fr_x0[n:]])

    state = bundle["fr_init"](
        fr_x0,
        fr_s0,
        fr_y0,
        fr_z0,
        fr_mu,
        iterations0,
        prm,
        fr_scaling,
    )
    state = run_solver(
        state, bundle["fr_step"], options, start_time=start_time,
        runner=bundle["runner"],
    )

    status = ExitStatus(int(state.status))
    x_new = np.asarray(state.x[:n])
    s_new = np.asarray(state.s[:mi])
    iterations_out = int(state.iterations)

    def resume_duals(x_res, s_res):
        # Dense least-squares dual estimation is O(m^2 n) — fine for small
        # problems, prohibitive at long horizons; reset duals there and
        # let the parent IPM re-estimate within a few iterations.
        pj = parent_state.params
        if n + mi <= 6000:
            g_new = np.asarray(parent.g(jnp.asarray(x_res), pj, parent_sc))
            A_e_new = np.asarray(
                parent.A_e(jnp.asarray(x_res), pj, parent_sc)
            )
            A_i_new = np.asarray(
                parent.A_i(jnp.asarray(x_res), pj, parent_sc)
            )
            y_est, z_est = lagrange_multiplier_estimate(
                g_new, A_e_new, A_i_new, s_res, mu
            )
        else:
            y_est = np.zeros(me)
            z_est = (
                np.clip(mu / s_res, mu / 1e10, 1e10) if mi else np.zeros(0)
            )
        return "resume", x_res, s_res, y_est, z_est, iterations_out

    if status == ExitStatus.CALLBACK_REQUESTED_STOP:
        return resume_duals(x_new, s_new)
    if status == ExitStatus.SUCCESS:
        # Same parent-feasibility / progress check as the dense path (see
        # restore()).
        pj = parent_state.params
        ce_new = np.asarray(parent.c_e(jnp.asarray(x_new), pj, parent_sc))
        ci_new = np.asarray(parent.c_i(jnp.asarray(x_new), pj, parent_sc))
        eps_feas = max(options.tolerance * 100.0, 1e-10)
        ce_ok = ce_new.shape[0] == 0 or np.max(np.abs(ce_new)) <= eps_feas
        ci_ok = ci_new.shape[0] == 0 or np.min(ci_new) >= -eps_feas
        theta_old = np.sum(np.abs(c_e0)) + np.sum(
            np.abs(np.minimum(c_i0, 0.0))
        )
        theta_new = np.sum(np.abs(ce_new)) + np.sum(
            np.abs(np.minimum(ci_new, 0.0))
        )
        improved = theta_new < 0.1 * theta_old
        if (ce_ok and ci_ok) or improved:
            s_res = np.maximum(ci_new, mu) if mi > 0 else s_new
            return resume_duals(x_new, s_res)
        return (
            ExitStatus.LOCALLY_INFEASIBLE,
            x_new,
            s_new,
            None,
            None,
            iterations_out,
        )
    return (
        ExitStatus.FEASIBILITY_RESTORATION_FAILED,
        x_new,
        s_new,
        None,
        None,
        iterations_out,
    )
