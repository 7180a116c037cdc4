"""Device-resident step filter (Wächter–Biegler).

Port of the behavior of reference solver/util/filter.hpp:19-212 to a
fixed-size JAX representation: the reference keeps a dynamic vector of
(cost, constraint-violation) pairs; under jit we keep a fixed-size array
with a validity mask (capped — see SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

MAX_FILTER_ENTRIES = 128

# Reference filter.hpp:184-185
GAMMA_COST = 1e-8
GAMMA_CONSTRAINT = 1e-5
# Reference filter.hpp:121-122
S_PHI = 2.3
S_THETA = 1.1
# Reference filter.hpp:128
ETA_PHI = 1e-8


class FilterState(NamedTuple):
    """Filter entries plus bookkeeping scalars."""

    costs: jnp.ndarray  # (MAX,)
    viols: jnp.ndarray  # (MAX,)
    valid: jnp.ndarray  # (MAX,) bool
    min_viol: jnp.ndarray  # scalar
    max_viol: jnp.ndarray  # scalar
    last_rejection_due_to_filter: jnp.ndarray  # scalar bool


def make_filter(initial_constraint_violation, dtype) -> FilterState:
    """Construct an empty filter (reference filter.hpp:87-94)."""
    v0 = jnp.maximum(jnp.asarray(1.0, dtype), initial_constraint_violation)
    return FilterState(
        costs=jnp.zeros((MAX_FILTER_ENTRIES,), dtype),
        viols=jnp.zeros((MAX_FILTER_ENTRIES,), dtype),
        valid=jnp.zeros((MAX_FILTER_ENTRIES,), bool),
        min_viol=jnp.asarray(1e-4, dtype) * v0,
        max_viol=jnp.asarray(1e4, dtype) * v0,
        last_rejection_due_to_filter=jnp.asarray(False),
    )


def reset_filter(f: FilterState) -> FilterState:
    """Clear all entries (reference filter.hpp:97-100)."""
    return f._replace(
        valid=jnp.zeros_like(f.valid),
        last_rejection_due_to_filter=jnp.asarray(False),
    )


def _add_entry(f: FilterState, cost, viol) -> FilterState:
    """Add an entry, evicting entries it dominates
    (reference filter.hpp:194-200)."""
    dominated = f.valid & (f.costs >= cost) & (f.viols >= viol)
    valid = f.valid & ~dominated
    # First free slot; if full, overwrite the worst (largest violation) slot.
    # The reference's vector is unbounded; overflow here is benign (the
    # filter only blocks cycling).
    free = ~valid
    any_free = jnp.any(free)
    first_free = jnp.argmax(free)
    worst = jnp.argmax(jnp.where(valid, f.viols, -jnp.inf))
    slot = jnp.where(any_free, first_free, worst)
    return f._replace(
        costs=f.costs.at[slot].set(cost),
        viols=f.viols.at[slot].set(viol),
        valid=valid.at[slot].set(True),
    )


def check_acceptance(f: FilterState, current_cost, current_viol, trial_cost,
                     trial_viol, D_phi, alpha):
    """Pure acceptance predicate for a trial iterate against this filter —
    the decision half of try_add, with no state mutation. Returns
    (accepted, rejected_pre_filter, in_filter, finite, switching, armijo).

    Shared by try_add and the batched line-search ladder (which evaluates
    every backtracking candidate against the same filter entries in one
    shot — valid because filter entries only change on acceptance, which
    terminates the backtracking). Port of reference filter.hpp:109-158.
    """
    finite = jnp.isfinite(trial_cost) & (trial_viol <= f.max_viol)

    # Switching condition (reference filter.hpp:121-125)
    switching = (D_phi < 0.0) & (
        alpha * (-D_phi) ** S_PHI > current_viol**S_THETA
    )

    # Armijo condition (reference filter.hpp:128-130)
    armijo = trial_cost <= current_cost + ETA_PHI * alpha * D_phi

    # Sufficient decrease (reference filter.hpp:133-141, eq (2.13) of Gu&Zhu)
    phi = alpha**1.5
    sufficient_decrease = (
        trial_cost <= current_cost - phi * GAMMA_COST * current_viol
    ) | (trial_viol <= (1.0 - phi * GAMMA_CONSTRAINT) * current_viol)

    # Rejection causes (reference filter.hpp:146-155)
    use_armijo_path = (current_viol <= f.min_viol) & switching
    rejected_pre_filter = jnp.where(
        use_armijo_path, ~armijo, ~sufficient_decrease
    )

    # In-filter check: dominated by any valid entry (reference filter.hpp:206-211)
    in_filter = jnp.any(
        f.valid & (f.costs <= trial_cost) & (f.viols <= trial_viol)
    )

    accepted = finite & ~rejected_pre_filter & ~in_filter
    return accepted, rejected_pre_filter, in_filter, finite, switching, armijo


def try_add(f: FilterState, current_cost, current_viol, trial_cost, trial_viol,
            D_phi, alpha):
    """Check whether the trial iterate is acceptable, adding a filter entry
    when appropriate. Returns (accepted: bool, new_filter_state).

    Port of reference filter.hpp:109-172.
    """
    accepted, rejected_pre_filter, in_filter, finite, switching, armijo = (
        check_acceptance(
            f, current_cost, current_viol, trial_cost, trial_viol, D_phi,
            alpha,
        )
    )
    phi = alpha**1.5

    # Augment filter if switching or Armijo condition are false
    # (reference filter.hpp:163-169)
    augment = accepted & (~switching | ~armijo)
    augmented = _add_entry(
        f,
        current_cost - phi * GAMMA_COST * current_viol,
        (1.0 - phi * GAMMA_CONSTRAINT) * current_viol,
    )
    new_f = FilterState(
        costs=jnp.where(augment, augmented.costs, f.costs),
        viols=jnp.where(augment, augmented.viols, f.viols),
        valid=jnp.where(augment, augmented.valid, f.valid),
        min_viol=f.min_viol,
        max_viol=f.max_viol,
        # The reference leaves the flag untouched on nonfinite rejection
        # (filter.hpp:114-118) and on acceptance.
        last_rejection_due_to_filter=jnp.where(
            accepted | ~finite,
            f.last_rejection_due_to_filter,
            ~rejected_pre_filter & in_filter,
        ),
    )
    return accepted, new_f
