"""Block-tridiagonal symmetric LDLᵀ factorization (block-Thomas).

The TPU-native replacement for general sparse LDLT on direct-transcription
OCP KKT systems (SURVEY.md §7 step 3): with variables ordered by stage
[z₀, λ₀, z₁, λ₁, …], the reduced KKT matrix [H + AᵢᵀΣAᵢ, Aₑᵀ; Aₑ, −γI] is
block tridiagonal with one (w × w) diagonal block per stage. The
factorization is a `lax.scan` over stages:

    S₀ = D₀
    Sₖ = LₖDₖLₖᵀ           (small unpivoted LDLᵀ per stage)
    Sₖ₊₁ = Dₖ₊₁ − Eₖ Sₖ⁻¹ Eₖᵀ

giving O(N·w³) work and O(N·w²) memory versus O((Nw)³)/O((Nw)²) dense.
The D-block pivots expose the full matrix inertia by Sylvester's law, which
drives the same δ/γ regularization escalation as the dense path
(reference solver/util/sparse_regularized_ldlt.hpp:104-151).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from sleipnir_tpu.ops.ldlt import _ldlt_unblocked


class BlockTridiagFactor(NamedTuple):
    """Factor of a block-tridiagonal symmetric matrix.

    L_diag[k] is the unit-lower LDLᵀ factor of the k-th Schur complement,
    d[k] its pivot vector, and W[k] = E_k (L D Lᵀ)⁻¹ the lower coupling
    factor, so the full matrix factors as (I + W̃) blkdiag(LDLᵀ) (I + W̃)ᵀ.
    """

    L_diag: jnp.ndarray  # (N, w, w)
    d: jnp.ndarray  # (N, w)
    W: jnp.ndarray  # (N-1, w, w)


def block_tridiag_factor(D: jnp.ndarray, E: jnp.ndarray) -> BlockTridiagFactor:
    """Factor the block-tridiagonal matrix with diagonal blocks D (N, w, w)
    and sub-diagonal blocks E (N-1, w, w) (block (k+1, k))."""
    nblocks, w, _ = D.shape

    def step(S, inputs):
        Dk1, Ek = inputs
        Lk, dk = _ldlt_unblocked(S)
        d_safe = jnp.where(dk == 0.0, 1.0, dk)
        # Y = Lₖ⁻¹ Eₖᵀ, so Eₖ Sₖ⁻¹ Eₖᵀ = Yᵀ D⁻¹ Y
        Y = solve_triangular(Lk, Ek.T, lower=True)
        S_next = Dk1 - (Y / d_safe[:, None]).T @ Y
        # Wₖ = Eₖ Sₖ⁻¹ = (Lₖ⁻ᵀ D⁻¹ Y)ᵀ, used by the solve phase
        Wk = solve_triangular(Lk.T, Y / d_safe[:, None], lower=False).T
        return S_next, (Lk, dk, Wk)

    if nblocks == 1:
        L0, d0 = _ldlt_unblocked(D[0])
        return BlockTridiagFactor(
            L_diag=L0[None], d=d0[None], W=jnp.zeros((0, w, w), D.dtype)
        )

    S_last, (Ls, ds, Ws) = lax.scan(step, D[0], (D[1:], E))
    L_last, d_last = _ldlt_unblocked(S_last)
    L_diag = jnp.concatenate([Ls, L_last[None]], axis=0)
    d = jnp.concatenate([ds, d_last[None]], axis=0)
    return BlockTridiagFactor(L_diag=L_diag, d=d, W=Ws)


def block_tridiag_solve(fac: BlockTridiagFactor, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the factored system for b of shape (N, w)."""
    nblocks, w = b.shape
    if nblocks == 1:
        Lk, dk = fac.L_diag[0], fac.d[0]
        y = solve_triangular(Lk, b[0], lower=True)
        y = y / jnp.where(dk == 0.0, 1.0, dk)
        return solve_triangular(Lk.T, y, lower=False)[None]

    # Forward: y_0 = b_0; y_{k+1} = b_{k+1} − W_k y_k
    def fwd(y_prev, inputs):
        bk1, Wk = inputs
        yk1 = bk1 - Wk @ y_prev
        return yk1, y_prev

    y_last, ys = lax.scan(fwd, b[0], (b[1:], fac.W))
    y = jnp.concatenate([ys, y_last[None]], axis=0)

    # Diagonal solves: z_k = (L D Lᵀ)⁻¹ y_k (batched)
    def diag_solve(Lk, dk, yk):
        t = solve_triangular(Lk, yk, lower=True)
        t = t / jnp.where(dk == 0.0, 1.0, dk)
        return solve_triangular(Lk.T, t, lower=False)

    z = jax.vmap(diag_solve)(fac.L_diag, fac.d, y)

    # Backward: x_N = z_N; x_k = z_k − (S_k⁻¹ E_kᵀ) x_{k+1} = z_k − W_kᵀ x_{k+1}
    def bwd(x_next, inputs):
        zk, Wk = inputs
        xk = zk - Wk.T @ x_next
        return xk, x_next

    x_first, xs_rev = lax.scan(
        bwd, z[-1], (z[:-1][::-1], fac.W[::-1])
    )
    xs = jnp.concatenate([x_first[None], xs_rev[::-1]], axis=0)
    return xs


def block_tridiag_inertia(fac: BlockTridiagFactor, eps: float):
    """Inertia from all stage pivots (Sylvester's law)."""
    d = fac.d
    positive = jnp.sum(d > eps)
    negative = jnp.sum(d < -eps)
    zero = d.size - positive - negative
    return positive, negative, zero
