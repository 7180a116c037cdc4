"""Inertia-corrected regularized LDLᵀ factorization of the KKT system.

Port of the *behavior* of reference
solver/util/sparse_regularized_ldlt.hpp:64-151 (and its dense twin) to a
jittable bounded `lax.while_loop`: factor the saddle system, check the
inertia of D against the ideal (n⁺ = #decision vars, n⁻ = #equality
constraints, n⁰ = 0), and on mismatch retry with the regularization matrix
[δI, 0; 0, −γI], escalating δ and γ by 10x per failure mode until either the
inertia is ideal or δ/γ exceed 1e20 (ill-conditioning ⇒ failure).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from sleipnir_tpu.ops.ldlt import inertia, ldlt_factor, ldlt_solve


class RegularizedFactor(NamedTuple):
    """Result of a regularized LDLᵀ factorization."""

    L: jnp.ndarray
    d: jnp.ndarray
    #: Hessian regularization δ used (0 if none needed).
    delta: jnp.ndarray
    #: Constraint Jacobian regularization γ used.
    gamma: jnp.ndarray
    #: Whether a factorization with ideal inertia was obtained.
    ok: jnp.ndarray


def regularized_ldlt(
    lhs: jnp.ndarray,
    num_decision_variables: int,
    num_equality_constraints: int,
    prev_delta: jnp.ndarray,
    gamma_min: float,
) -> RegularizedFactor:
    """Factor the KKT lhs with inertia correction.

    `lhs` is the full symmetric (n+mₑ)x(n+mₑ) system. `prev_delta` is δ from
    the previous solver iteration (δ trends downward across iterations:
    reference sparse_regularized_ldlt.hpp:95-98). `gamma_min` is the minimum
    constraint regularization (forced to 0 in feasibility restoration:
    reference interior_point.hpp:352).
    """
    n = num_decision_variables
    me = num_equality_constraints
    dtype = lhs.dtype
    eps = float(np.finfo(np.dtype(dtype.name)).eps)

    reg_template = jnp.concatenate(
        [jnp.ones((n,), dtype), jnp.zeros((me,), dtype)]
    )
    reg_template_c = jnp.concatenate(
        [jnp.zeros((n,), dtype), -jnp.ones((me,), dtype)]
    )

    def factor_with(delta, gamma):
        reg = delta * reg_template + gamma * reg_template_c
        return ldlt_factor(lhs + jnp.diag(reg))

    def inertia_ideal(d):
        pos, neg, zero = inertia(d, eps)
        return (pos == n) & (neg == me) & (zero == 0)

    def factor_failed(d):
        return ~jnp.all(jnp.isfinite(d))

    # First attempt without regularization
    # (reference sparse_regularized_ldlt.hpp:67-87)
    L0, d0 = factor_with(jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
    unregularized_ok = (
        inertia_ideal(d0)
        & jnp.all(jnp.abs(d0) >= jnp.asarray(1e-4, dtype))
        & ~factor_failed(d0)
    )

    # Starting values for the escalation loop
    # (reference sparse_regularized_ldlt.hpp:95-102)
    delta0 = jnp.where(
        prev_delta == 0.0,
        jnp.asarray(1e-4, dtype),
        jnp.maximum(prev_delta / 2.0, eps),
    )
    gamma0 = jnp.asarray(gamma_min, dtype)

    class Carry(NamedTuple):
        L: jnp.ndarray
        d: jnp.ndarray
        delta: jnp.ndarray
        gamma: jnp.ndarray
        done: jnp.ndarray
        failed: jnp.ndarray

    def cond(c: Carry):
        return ~(c.done | c.failed)

    def body(c: Carry):
        L, d = factor_with(c.delta, c.gamma)
        pos, neg, _zero = inertia(d, eps)
        zero = d.shape[0] - pos - neg
        failed_factor = factor_failed(d)
        ideal = (pos == n) & (neg == me) & (zero == 0) & ~failed_factor

        # Escalation policy (reference sparse_regularized_ldlt.hpp:116-141)
        has_zero = (zero > 0) & ~failed_factor
        too_negative = (neg > me) & ~failed_factor & ~has_zero
        too_positive = (pos > n) & ~failed_factor & ~has_zero & ~too_negative

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
            L=jnp.where(ideal, L, c.L),
            d=jnp.where(ideal, d, c.d),
            delta=jnp.where(ideal, c.delta, new_delta),
            gamma=jnp.where(ideal, c.gamma, new_gamma),
            done=ideal,
            failed=overflow & ~ideal,
        )

    init = Carry(
        L=L0,
        d=d0,
        delta=delta0,
        gamma=gamma0,
        done=jnp.asarray(False),
        failed=jnp.asarray(False),
    )
    out = lax.while_loop(cond, body, init)

    L = jnp.where(unregularized_ok, L0, out.L)
    d = jnp.where(unregularized_ok, d0, out.d)
    delta = jnp.where(unregularized_ok, 0.0, out.delta)
    gamma = jnp.where(unregularized_ok, 0.0, out.gamma)
    ok = unregularized_ok | out.done
    return RegularizedFactor(L=L, d=d, delta=delta, gamma=gamma, ok=ok)


def regularized_solve(factor: RegularizedFactor, rhs: jnp.ndarray) -> jnp.ndarray:
    return ldlt_solve(factor.L, factor.d, rhs)
