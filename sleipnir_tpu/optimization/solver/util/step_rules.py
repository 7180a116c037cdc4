"""Small step-rule utilities: fraction-to-the-boundary and local
infeasibility detection."""

from __future__ import annotations

import jax.numpy as jnp


def fraction_to_the_boundary(x, p, tau):
    """α = max(α ∈ (0, 1] : x + αp ≥ (1−τ)x) for positive x
    (reference solver/util/fraction_to_the_boundary_rule.hpp:20-43)."""
    if x.shape[0] == 0:
        return jnp.asarray(1.0, x.dtype)
    ratios = jnp.where(p < 0.0, -tau * x / jnp.where(p < 0.0, p, -1.0), jnp.inf)
    return jnp.minimum(jnp.asarray(1.0, x.dtype), jnp.min(ratios))


def is_equality_locally_infeasible(A_e, c_e):
    """Aₑᵀcₑ → 0 while ‖cₑ‖ > ε
    (reference solver/util/is_locally_infeasible.hpp:18-30)."""
    if c_e.shape[0] == 0:
        return jnp.asarray(False)
    return (jnp.linalg.norm(A_e.T @ c_e) < 1e-6) & (
        jnp.linalg.norm(c_e) > 1e-2
    )


def is_inequality_locally_infeasible(A_i, c_i):
    """Aᵢᵀcᵢ⁺ → 0 while ‖cᵢ⁺‖ > ε where cᵢ⁺ = min(cᵢ, 0)
    (reference solver/util/is_locally_infeasible.hpp:33-61)."""
    if c_i.shape[0] == 0:
        return jnp.asarray(False)
    c_i_plus = jnp.minimum(c_i, 0.0)
    return (jnp.linalg.norm(A_i.T @ c_i_plus) < 1e-6) & (
        jnp.linalg.norm(c_i_plus) > 1e-6
    )
