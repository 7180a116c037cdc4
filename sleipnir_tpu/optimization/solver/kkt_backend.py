"""KKT backends: how derivatives are stored and the Newton-KKT system is
factored/solved.

The interior-point and SQP solvers are generic over this seam (the TPU
analog of the reference's sparse-vs-dense RegularizedLDLT facade,
reference solver/util/regularized_ldlt.hpp:19-136):

  - DenseBackend: dense (n,n)/(m,n) derivative arrays and the blocked dense
    LDLᵀ. Right for small/irregular problems (the reference's dense path,
    fill ≥ 25%: reference interior_point.hpp:340-348).
  - BandedBackend (kkt_banded.py): per-stage derivative blocks extracted
    with O(stage-width) colored JVP/HVP probes and a block-tridiagonal
    factorization — O(N) time/memory in the horizon length for
    direct-transcription OCPs (SURVEY.md §7 step 3).

Both run the same δ/γ inertia-correction escalation
(reference solver/util/sparse_regularized_ldlt.hpp:104-151) via
`regularization_loop`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class RegLoopResult(NamedTuple):
    fac: object  # backend-specific factor pytree
    delta: jnp.ndarray
    gamma: jnp.ndarray
    ok: jnp.ndarray


#: Number of δ-candidates factored AT ONCE in the regularization ladder
#: (including the unregularized candidate). Measured on the v5e (K=101,
#: w=13): factoring 4 candidates in one vmapped call costs 1.08x ONE
#: factorization — the batch axis rides along for free because the
#: factorization cost is sequential-step/kernel-dispatch overhead, not
#: arithmetic (docs/tpu_numerics.md "Per-op device overhead"). The
#: sequential escalation paid ~2 full factorizations per iteration.
#: On CPU the 4-wide ladder costs ~4x one factorization in flops but
#: replaces ~2 sequential attempts and picks the SMALLEST acceptable δ
#: (measured on the flagship: 218 iterations / no restoration excursion
#: vs the sequential loop's 221 + excursion), so it stays on by default
#: everywhere. SLEIPNIR_TPU_LADDER=1 restores the sequential escalation.
LADDER = 4


def _ladder_depth(dtype) -> int:
    import os  # noqa: PLC0415

    override = os.environ.get("SLEIPNIR_TPU_LADDER")
    if override is not None:
        return max(1, int(override))
    # f32 pivots near the inertia threshold (eps^0.75 ≈ 2e-5) are noisy
    # enough that a 4-rung smallest-ideal selection jumps between rungs
    # and can stall the solve (tests/optimization/test_dtype_axis.py f32);
    # depth 2 still removes the wasted sequential (0, 0) attempt.
    if np.dtype(dtype) == np.float32:
        return 2
    return LADDER


def regularization_loop(
    factor_with: Callable,
    ideal_pos: int,
    ideal_neg: int,
    prev_delta,
    gamma_min: float,
    dtype,
    max_ladder: int | None = None,
) -> RegLoopResult:
    """Shared inertia-correction escalation
    (reference sparse_regularized_ldlt.hpp:64-151), restructured as a
    batched candidate ladder.

    `factor_with(delta, gamma)` returns (fac, pos, neg, zero, failed) where
    fac is any pytree of arrays.

    One vmapped call factors {(0, 0), (δ₀, γ_min), (10δ₀, γ_min),
    (100δ₀, γ_min)} together and the SMALLEST candidate with ideal inertia
    wins — the common cases (unregularized ok; one or two δ escalations)
    cost one batched factorization instead of 2-3 sequential ones. γ stays
    at γ_min on the ladder so the reference's diagnosis-dependent γ
    escalation (has_zero/too_positive → γ×10,
    sparse_regularized_ldlt.hpp:118-143) is reproduced exactly by the
    sequential fallback loop, which takes over from the ladder's top rung
    in the rare case no rung has ideal inertia.
    """
    eps = float(np.finfo(np.dtype(dtype)).eps)

    delta0 = jnp.where(
        prev_delta == 0.0,
        jnp.asarray(1e-4, dtype),
        jnp.maximum(prev_delta / 2.0, eps),
    )
    gamma0 = jnp.asarray(gamma_min, dtype)

    # ---- batched candidate ladder ------------------------------------
    ladder = _ladder_depth(dtype)
    if max_ladder is not None:
        ladder = max(1, min(ladder, max_ladder))
    deltas = jnp.concatenate(
        [
            jnp.zeros((1,), dtype),
            delta0 * (10.0 ** jnp.arange(ladder - 1, dtype=dtype)),
        ]
    )
    gammas = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.full((ladder - 1,), gamma0)]
    )
    if ladder == 1:
        lfac, pos0, neg0, zero0, failed0 = factor_with(deltas[0], gammas[0])
        lideal = (
            (pos0 == ideal_pos) & (neg0 == ideal_neg) & (zero0 == 0)
            & ~failed0
        )[None]
        lfac = jax.tree.map(lambda a: a[None], lfac)
    else:
        lfac, lpos, lneg, lzero, lfailed = jax.vmap(factor_with)(
            deltas, gammas
        )
        lideal = (
            (lpos == ideal_pos) & (lneg == ideal_neg) & (lzero == 0)
            & ~lfailed
        )
    ranks = jnp.arange(ladder)
    pick = jnp.min(jnp.where(lideal, ranks, ladder))
    any_ok = pick < ladder
    pick_c = jnp.minimum(pick, ladder - 1)
    fac_pick = jax.tree.map(lambda a: a[pick_c], lfac)
    delta_pick = deltas[pick_c]
    gamma_pick = gammas[pick_c]

    class Carry(NamedTuple):
        fac: object
        delta: jnp.ndarray
        gamma: jnp.ndarray
        done: jnp.ndarray
        failed: jnp.ndarray

    def cond(c: Carry):
        return ~(c.done | c.failed)

    def body(c: Carry):
        fac, pos, neg, zero, failed_factor = factor_with(c.delta, c.gamma)
        ideal = (
            (pos == ideal_pos) & (neg == ideal_neg) & (zero == 0)
            & ~failed_factor
        )
        has_zero = (zero > 0) & ~failed_factor
        too_negative = (neg > ideal_neg) & ~failed_factor & ~has_zero
        too_positive = (
            (pos > ideal_pos) & ~failed_factor & ~has_zero & ~too_negative
        )
        gamma_zero = c.gamma == 0.0
        new_delta = jnp.where(
            ideal,
            c.delta,
            jnp.where(
                has_zero,
                jnp.where(gamma_zero, c.delta, c.delta * 10.0),
                jnp.where(
                    too_negative,
                    c.delta * 10.0,
                    jnp.where(too_positive, c.delta, c.delta * 10.0),
                ),
            ),
        )
        new_gamma = jnp.where(
            ideal,
            c.gamma,
            jnp.where(
                has_zero,
                jnp.where(gamma_zero, jnp.asarray(1e-10, dtype), c.gamma * 10.0),
                jnp.where(
                    too_negative,
                    c.gamma,
                    jnp.where(
                        gamma_zero, jnp.asarray(1e-10, dtype), c.gamma * 10.0
                    ),
                ),
            ),
        )
        overflow = (new_delta > 1e20) | (new_gamma > 1e20)
        return Carry(
            fac=jax.tree.map(
                lambda a, b: jnp.where(ideal, a, b), fac, c.fac
            ),
            delta=jnp.where(ideal, c.delta, new_delta),
            gamma=jnp.where(ideal, c.gamma, new_gamma),
            done=ideal,
            failed=overflow & ~ideal,
        )

    # Sequential fallback: takes over one decade above the ladder's top
    # rung. lax.cond skips it entirely (device-side) when a rung won.
    init = Carry(
        fac=fac_pick,
        delta=delta0 * (10.0 ** (ladder - 1)),
        gamma=gamma0,
        done=any_ok,
        failed=jnp.asarray(False),
    )
    out = lax.cond(
        any_ok,
        lambda c: c,
        lambda c: lax.while_loop(cond, body, c),
        init,
    )

    fac = jax.tree.map(
        lambda a, b: jnp.where(any_ok, a, b), fac_pick, out.fac
    )
    delta = jnp.where(any_ok, delta_pick, out.delta)
    gamma = jnp.where(any_ok, gamma_pick, out.gamma)
    ok = any_ok | out.done
    return RegLoopResult(fac=fac, delta=delta, gamma=gamma, ok=ok)


# ---------------------------------------------------------------------------
# Dense backend
# ---------------------------------------------------------------------------


class DenseDerivs(NamedTuple):
    """Scaled dense derivative matrices."""

    H: jnp.ndarray  # (n, n)
    A_e: jnp.ndarray  # (me, n)
    A_i: jnp.ndarray  # (mi, n)


def _equilibrate_dense(A, rounds: int = 2):
    """Symmetric Ruiz equilibration: returns (SAS, s). A congruence, so
    the inertia is exactly preserved while row/column magnitudes compress
    to O(1) — see kkt_banded._equilibrate for why this is load-bearing
    for pivot-sign robustness under TPU f64 emulation."""
    s = jnp.ones((A.shape[0],), A.dtype)
    for _ in range(rounds):
        rn = jnp.max(jnp.abs(A), axis=1)
        f = jnp.where(rn > 0.0, 1.0 / jnp.sqrt(rn), 1.0)
        A = A * f[:, None] * f[None, :]
        s = s * f
    return A, s


class DenseFactor(NamedTuple):
    L: jnp.ndarray
    d: jnp.ndarray
    #: Ruiz equilibration scale: the factor is of S·KKT·S, so solves are
    #: x = S · ldlt_solve(L, d, S · b).
    s: jnp.ndarray
    delta: jnp.ndarray
    gamma: jnp.ndarray
    ok: jnp.ndarray


class DenseBackend:
    """Dense derivative storage + blocked dense LDLᵀ (the default)."""

    def __init__(self, n: int, me: int, mi: int, dtype) -> None:
        self.n = n
        self.me = me
        self.mi = mi
        self.dtype = dtype

    # -- derivative evaluation --------------------------------------------

    def eval_derivs(self, F, x, y, z) -> DenseDerivs:
        return DenseDerivs(
            H=F.H(x, y, z), A_e=F.A_e(x), A_i=F.A_i(x)
        )

    def all_finite(self, d: DenseDerivs):
        return (
            jnp.all(jnp.isfinite(d.H))
            & jnp.all(jnp.isfinite(d.A_e))
            & jnp.all(jnp.isfinite(d.A_i))
        )

    # -- matvecs -----------------------------------------------------------

    def AeT(self, d: DenseDerivs, v):
        return d.A_e.T @ v if self.me > 0 else jnp.zeros((self.n,), self.dtype)

    def Ae(self, d: DenseDerivs, v):
        return d.A_e @ v

    def AiT(self, d: DenseDerivs, v):
        return d.A_i.T @ v if self.mi > 0 else jnp.zeros((self.n,), self.dtype)

    def Ai(self, d: DenseDerivs, v):
        return d.A_i @ v

    # -- factorization -----------------------------------------------------

    def factor(self, d: DenseDerivs, sigma, prev_delta, gamma_min):
        """Assemble [H + AᵢᵀΣAᵢ, Aₑᵀ; Aₑ, −γI] and factor with inertia
        correction (reference interior_point.hpp:426-465)."""
        from sleipnir_tpu.ops.ldlt import inertia, ldlt_factor  # noqa: PLC0415

        n, me, mi = self.n, self.me, self.mi
        eps = float(np.finfo(np.dtype(self.dtype)).eps)
        top_left = d.H + (
            d.A_i.T @ (sigma[:, None] * d.A_i) if mi > 0 else 0.0
        )
        lhs = jnp.zeros((n + me, n + me), self.dtype)
        lhs = lhs.at[:n, :n].set(top_left)
        if me > 0:
            lhs = lhs.at[:n, n:].set(d.A_e.T)
            lhs = lhs.at[n:, :n].set(d.A_e)
        reg_pos = jnp.concatenate(
            [jnp.ones((n,), self.dtype), jnp.zeros((me,), self.dtype)]
        )
        reg_neg = jnp.concatenate(
            [jnp.zeros((n,), self.dtype), -jnp.ones((me,), self.dtype)]
        )

        # Pivot zero-threshold on the EQUILIBRATED system (O(1) pivots);
        # see BandedBackend.factor.
        eps_inertia = float(eps**0.75)

        def factor_with(delta, gamma):
            A, s = _equilibrate_dense(
                lhs + jnp.diag(delta * reg_pos + gamma * reg_neg)
            )
            L, dd = ldlt_factor(A)
            pos, neg, zero = inertia(dd, eps_inertia)
            # The unregularized attempt additionally requires pivots away
            # from zero (reference sparse_regularized_ldlt.hpp:82-83)
            small = jnp.any(jnp.abs(dd) < 1e-4) & (delta == 0.0) & (
                gamma == 0.0
            )
            failed = ~jnp.all(jnp.isfinite(dd)) | small
            return (L, dd, s), pos, neg, zero, failed

        out = regularization_loop(
            factor_with, n, me, prev_delta, gamma_min, self.dtype
        )
        L, dd, s = out.fac
        return DenseFactor(
            L=L, d=dd, s=s, delta=out.delta, gamma=out.gamma, ok=out.ok
        )

    def solve(self, fac: DenseFactor, rhs_top, rhs_bottom):
        """Solve for (p_x, p_y): [·][pˣ; −pʸ] = [rhs_top; rhs_bottom]."""
        from sleipnir_tpu.ops.ldlt import ldlt_solve  # noqa: PLC0415

        rhs = jnp.concatenate([rhs_top, rhs_bottom])
        p = fac.s * ldlt_solve(fac.L, fac.d, fac.s * rhs)
        return p[: self.n], -p[self.n :]

    def _kkt_matvec(self, d: DenseDerivs, sigma, delta, gamma, u, v):
        """Apply the regularized KKT matrix
        [H + AᵢᵀΣAᵢ + δI, Aₑᵀ; Aₑ, −γI] to (u, v)."""
        top = d.H @ u + delta * u
        if self.mi > 0:
            top = top + d.A_i.T @ (sigma * (d.A_i @ u))
        if self.me > 0:
            top = top + d.A_e.T @ v
            bot = d.A_e @ u - gamma * v
        else:
            bot = v
        return top, bot

    def solve_refined(
        self, d: DenseDerivs, sigma, fac: DenseFactor, rhs_top, rhs_bottom,
        iterations: int = 2,
    ):
        """Solve + fixed-count iterative refinement.

        The unpivoted LDLᵀ loses digits on ill-conditioned saddle-point
        systems; refinement against the regularized KKT matrix restores
        backward stability at the cost of one matvec + back-solve per pass
        (what Ipopt does after its inertia-corrected factorization)."""
        from sleipnir_tpu.ops.ldlt import ldlt_solve  # noqa: PLC0415

        rhs = jnp.concatenate([rhs_top, rhs_bottom])

        def solve_fn(b_):
            # The factor is of the equilibrated S·KKT·S (DenseFactor.s)
            return fac.s * ldlt_solve(fac.L, fac.d, fac.s * b_)

        p = solve_fn(rhs)

        # Loop (not unroll) the refinement passes — see
        # BandedBackend.solve_refined for the compile-size rationale.
        def refine(_, p):
            t, b = self._kkt_matvec(
                d, sigma, fac.delta, fac.gamma, p[: self.n], p[self.n :]
            )
            r = rhs - jnp.concatenate([t, b])
            return p + solve_fn(r)

        p = lax.fori_loop(0, iterations, refine, p)
        return p[: self.n], -p[self.n :]

    # -- observability -----------------------------------------------------

    def dense(self, d: DenseDerivs):
        return d.H, d.A_e, d.A_i
