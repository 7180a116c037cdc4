"""Blocked dense LDLᵀ factorization in JAX.

Replaces Eigen::SimplicialLDLT (reference
solver/util/sparse_regularized_ldlt.hpp:183) as the KKT-system factorizer.
The factorization is *unpivoted*: the interior-point/SQP callers regularize
the KKT matrix toward quasi-definiteness (reference :91-151) whenever the
inertia is wrong, which is exactly the regime in which unpivoted LDLᵀ is
well-posed. Like Eigen's LDLT, the D vector exposes the matrix inertia via
Sylvester's law (reference solver/util/inertia.hpp:40-50).

The blocked right-looking algorithm maps to the TPU:
  - diagonal-block factorization: 128 sequential rank-1 updates on a
    128x128 VMEM-resident tile (lax.fori_loop),
  - panel solve: triangular solve (XLA),
  - trailing update: one big matmul per step (MXU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular


def _ldlt_unblocked(A):
    """Unpivoted LDLᵀ of a small symmetric block. Returns (L unit-lower, d)."""
    b = A.shape[0]
    idx = jnp.arange(b)

    def body(j, carry):
        A, L, d = carry
        dj = A[j, j]
        dj_safe = jnp.where(dj == 0.0, 1.0, dj)
        col = A[:, j]
        lcol = jnp.where(idx > j, col / dj_safe, 0.0)
        L = L.at[:, j].set(lcol + (idx == j))
        d = d.at[j].set(dj)
        A = A - dj * jnp.outer(lcol, lcol)
        return A, L, d

    L0 = jnp.zeros_like(A)
    d0 = jnp.zeros((b,), A.dtype)
    _, L, d = lax.fori_loop(0, b, body, (A, L0, d0))
    return L, d


@functools.partial(jax.jit, static_argnames=("block",))
def ldlt_factor(A, block: int = 128):
    """Factor symmetric A = L·diag(d)·Lᵀ with L unit-lower-triangular.

    Returns (L, d). No pivoting — see module docstring.
    """
    n = A.shape[0]
    if n == 0:
        return A, jnp.zeros((0,), A.dtype)
    if n <= block:
        return _ldlt_unblocked(A)

    L = jnp.zeros_like(A)
    d = jnp.zeros((n,), A.dtype)
    # Unrolled Python loop over block columns: static shapes per step, one
    # MXU matmul per trailing update.
    trailing = A
    for k in range(0, n, block):
        kb = min(block, n - k)
        Akk = trailing[:kb, :kb]
        Lkk, dk = _ldlt_unblocked(Akk)
        d = lax.dynamic_update_slice(d, dk, (k,))
        L = lax.dynamic_update_slice(L, Lkk, (k, k))
        if k + kb < n:
            Apanel = trailing[kb:, :kb]  # (n-k-kb, kb)
            # Solve L_kk Xᵀ = A_panelᵀ  =>  X = A_panel L_kkᵀ⁻¹; L21 = X D⁻¹
            X = solve_triangular(Lkk, Apanel.T, lower=True).T
            dk_safe = jnp.where(dk == 0.0, 1.0, dk)
            L21 = X / dk_safe[None, :]
            L = lax.dynamic_update_slice(L, L21, (k + kb, k))
            trailing = trailing[kb:, kb:] - (L21 * dk[None, :]) @ L21.T
    return L, d


@jax.jit
def ldlt_solve(L, d, b):
    """Solve L·diag(d)·Lᵀ x = b given an ldlt_factor result."""
    if L.shape[0] == 0:
        return b
    y = solve_triangular(L, b, lower=True)
    d_safe = jnp.where(d == 0.0, 1.0, d)
    y = y / (d_safe if y.ndim == 1 else d_safe[:, None])
    return solve_triangular(L.T, y, lower=False)


def inertia(d, eps: float):
    """Count (positive, negative, zero) entries of the LDLᵀ D vector
    (reference solver/util/inertia.hpp:40-50)."""
    positive = jnp.sum(d > eps)
    negative = jnp.sum(d < -eps)
    zero = d.shape[0] - positive - negative
    return positive, negative, zero
