"""Block-tridiagonal symmetric LDLᵀ factorization (block-Thomas).

The TPU-native replacement for general sparse LDLT on direct-transcription
OCP KKT systems (SURVEY.md §7 step 3): with variables ordered by stage
[z₀, λ₀, z₁, λ₁, …], the reduced KKT matrix [H + AᵢᵀΣAᵢ, Aₑᵀ; Aₑ, −γI] is
block tridiagonal with one (w × w) diagonal block per stage. The
factorization is a `lax.scan` over stages:

    S₀ = D₀
    Sₖ₊₁ = Dₖ₊₁ − Eₖ Sₖ⁻¹ Eₖᵀ      (one pivoted LU solve per stage)

with the per-stage LU factors (solve phase) and unpivoted-LDLᵀ pivots
(inertia only) computed for all stages at once afterwards,

giving O(N·w³) work and O(N·w²) memory versus O((Nw)³)/O((Nw)²) dense.
The D-block pivots expose the full matrix inertia by Sylvester's law, which
drives the same δ/γ regularization escalation as the dense path
(reference solver/util/sparse_regularized_ldlt.hpp:104-151).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.linalg import solve_triangular

from sleipnir_tpu.ops.ldlt import _ldlt_unblocked


def _lu_pivoted(A):
    """Row-pivoted LU in LAPACK lu_factor convention (LU packed, piv[k] =
    row swapped with k at step k), built from pure elementwise/matmul ops.

    XLA:TPU has no f64 LuDecomposition custom call, so the accelerator
    path cannot use jax.scipy.linalg.lu_factor; this compiles to plain
    arithmetic on any backend. O(w) sequential steps for a (w, w) block —
    w is the small stage width, not the horizon."""
    n = A.shape[0]
    idx = jnp.arange(n)

    def body(k, carry):
        LU, piv = carry
        col = jnp.where(idx < k, -jnp.inf, jnp.abs(LU[:, k]))
        p = jnp.argmax(col)
        piv = piv.at[k].set(p.astype(jnp.int32))
        row_k = LU[k]
        row_p = LU[p]
        LU = LU.at[k].set(row_p).at[p].set(row_k)
        pivot = LU[k, k]
        pivot_safe = jnp.where(pivot == 0.0, 1.0, pivot)
        factors = jnp.where(idx > k, LU[:, k] / pivot_safe, 0.0)
        # Update only the trailing columns (> k): earlier columns hold
        # finished L factors and the pivot column becomes the factors.
        row_vals = jnp.where(idx > k, LU[k], 0.0)
        LU = LU - jnp.outer(factors, row_vals)
        LU = LU.at[:, k].set(jnp.where(idx > k, factors, LU[:, k]))
        return LU, piv

    piv0 = jnp.zeros((n,), jnp.int32)
    return lax.fori_loop(0, n, body, (A, piv0))


def _block_factor(S):
    """Pivoted LU of one (w, w) block: LAPACK on CPU, handmade on TPU."""
    if jax.default_backend() == "cpu":
        from jax.scipy.linalg import lu_factor  # noqa: PLC0415

        return lu_factor(S)
    return _lu_pivoted(S)


def _block_solve_fresh(S, B):
    """Solve S X = B for one block without keeping the factorization."""
    if jax.default_backend() == "cpu":
        return jnp.linalg.solve(S, B)
    from jax.scipy.linalg import lu_solve  # noqa: PLC0415

    return lu_solve(_lu_pivoted(S), B)


class BlockTridiagFactor(NamedTuple):
    """Factor of a block-tridiagonal symmetric matrix.

    The k-th Schur complement Sₖ is held as a row-pivoted LU factorization
    (`lu`, `piv` — the Schur blocks are indefinite saddle blocks, so the
    solve phase needs pivoting for stability); `d` is the pivot vector of
    its *unpivoted* LDLᵀ, used only for inertia counting (a congruence, so
    Sylvester applies); W[k] = Eₖ Sₖ⁻¹ is the lower coupling factor.
    """

    lu: jnp.ndarray  # (N, w, w)
    piv: jnp.ndarray  # (N, w) int32
    d: jnp.ndarray  # (N, w)
    W: jnp.ndarray  # (N-1, w, w)


def block_tridiag_factor(D: jnp.ndarray, E: jnp.ndarray) -> BlockTridiagFactor:
    """Factor the block-tridiagonal matrix with diagonal blocks D (N, w, w)
    and sub-diagonal blocks E (N-1, w, w) (block (k+1, k)).

    The sequential Schur-complement recursion Sₖ₊₁ = Dₖ₊₁ − Eₖ Sₖ⁻¹ Eₖᵀ
    carries only Sₖ and uses one LAPACK/LU solve per step (≈5× faster on
    CPU than eliminating through a per-step scalar-loop LDLᵀ); the
    per-stage LDLᵀ factors needed for pivots (inertia) and the diagonal
    solves are then computed for ALL stages at once with a vmapped
    unblocked LDLᵀ — data-parallel, not sequential."""
    nblocks, w, _ = D.shape

    if nblocks == 1:
        _l0, d0 = _ldlt_unblocked(D[0])
        lu0, piv0 = _block_factor(D[0])
        return BlockTridiagFactor(
            lu=lu0[None],
            piv=piv0[None],
            d=d0[None],
            W=jnp.zeros((0, w, w), D.dtype),
        )

    def step(S, inputs):
        Dk1, Ek = inputs
        # X = Sₖ⁻¹ Eₖᵀ; Wₖ = Eₖ Sₖ⁻¹ = Xᵀ
        X = _block_solve_fresh(S, Ek.T)
        S_next = Dk1 - Ek @ X
        return S_next, (S, X)

    S_last, (Ss, Xs) = lax.scan(step, D[0], (D[1:], E))
    S_all = jnp.concatenate([Ss, S_last[None]], axis=0)
    _l_all, d = jax.vmap(_ldlt_unblocked)(S_all)
    lu, piv = jax.vmap(_block_factor)(S_all)
    return BlockTridiagFactor(
        lu=lu, piv=piv, d=d, W=jnp.swapaxes(Xs, 1, 2)
    )


def block_tridiag_solve(fac: BlockTridiagFactor, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the factored system for b of shape (N, w)."""
    from jax.scipy.linalg import lu_solve  # noqa: PLC0415

    nblocks, w = b.shape
    if nblocks == 1:
        return lu_solve((fac.lu[0], fac.piv[0]), b[0])[None]

    # Forward: y_0 = b_0; y_{k+1} = b_{k+1} − W_k y_k
    def fwd(y_prev, inputs):
        bk1, Wk = inputs
        yk1 = bk1 - Wk @ y_prev
        return yk1, y_prev

    y_last, ys = lax.scan(fwd, b[0], (b[1:], fac.W))
    y = jnp.concatenate([ys, y_last[None]], axis=0)

    # Diagonal solves: z_k = Sₖ⁻¹ y_k (batched pivoted LU)
    z = jax.vmap(lambda lu_k, piv_k, yk: lu_solve((lu_k, piv_k), yk))(
        fac.lu, fac.piv, y
    )

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


# ---------------------------------------------------------------------------
# Block cyclic reduction: the parallel factorization
# ---------------------------------------------------------------------------


class BCRLevel(NamedTuple):
    Lo: jnp.ndarray  # (M, w, w) LDLT factors of eliminated odd blocks
    do: jnp.ndarray  # (M, w)
    X: jnp.ndarray  # (M, w, w) D_odd⁻¹ E_left
    Y: jnp.ndarray  # (M, w, w) D_odd⁻¹ E_rightᵀ
    Eleft: jnp.ndarray  # (M, w, w)
    Eright: jnp.ndarray  # (M, w, w)


class BCRFactor(NamedTuple):
    levels: tuple  # of BCRLevel, finest to coarsest
    final: BlockTridiagFactor  # Thomas factor of the coarsest (≤2) blocks


def _bcr_padded_blocks(fac: BCRFactor) -> int:
    """Static padded block count, inferred from the level shapes."""
    if not fac.levels:
        return fac.final.d.shape[0]
    return 2 * fac.levels[0].do.shape[0] + 1


def _batched_ldlt_solve(L, d, B):
    """Solve (L diag(d) Lᵀ) X = B batched over the leading axis."""
    def one(Lk, dk, Bk):
        y = solve_triangular(Lk, Bk, lower=True)
        y = y / jnp.where(dk == 0.0, 1.0, dk)[:, None]
        return solve_triangular(Lk.T, y, lower=False)

    return jax.vmap(one)(L, d, B)


def bcr_factor(D: jnp.ndarray, E: jnp.ndarray) -> BCRFactor:
    """Block cyclic reduction factorization of a block-tridiagonal matrix.

    log₂(N) levels; each level eliminates all odd-indexed blocks with one
    batch of small LDLᵀs, two batched triangular solves, and batched
    matmuls — depth-log parallelism for the TPU instead of the sequential
    block-Thomas scan. Eliminated pivots expose the exact inertia (block
    Gaussian elimination is a symmetric congruence), and padding blocks are
    identity so their +w pivots are accounted exactly.
    """
    nblocks, w, _ = D.shape
    if nblocks <= 2:
        return BCRFactor(levels=(), final=block_tridiag_factor(D, E))
    # Pad to 2^L + 1 blocks with identity diagonals / zero couplings; each
    # level reduces 2^l + 1 -> 2^(l-1) + 1, ending at a 2-block system.
    L_levels = int(np.ceil(np.log2(nblocks - 1)))
    P = 2**L_levels + 1
    pad = P - nblocks
    if pad:
        D = jnp.concatenate(
            [D, jnp.broadcast_to(jnp.eye(w, dtype=D.dtype), (pad, w, w))]
        )
        E = jnp.concatenate([E, jnp.zeros((P - 1 - E.shape[0], w, w), D.dtype)])

    levels = []
    while D.shape[0] >= 3:
        Dodd = D[1::2]
        Eleft = E[0::2]
        Eright = E[1::2]
        Lo, do = jax.vmap(_ldlt_unblocked)(Dodd)
        X = _batched_ldlt_solve(Lo, do, Eleft)
        Y = _batched_ldlt_solve(Lo, do, jnp.swapaxes(Eright, 1, 2))

        Dnew = D[0::2]
        # Right odd neighbor: D'_{2k} -= E_{2k}ᵀ X_k for k < M
        Dnew = Dnew.at[:-1].add(-jnp.einsum("kba,kbc->kac", Eleft, X))
        # Left odd neighbor: D'_{2k} -= E_{2k-1} Y_{k-1} for k >= 1
        Dnew = Dnew.at[1:].add(-jnp.einsum("kab,kbc->kac", Eright, Y))
        Enew = -jnp.einsum("kab,kbc->kac", Eright, X)

        levels.append(
            BCRLevel(Lo=Lo, do=do, X=X, Y=Y, Eleft=Eleft, Eright=Eright)
        )
        D, E = Dnew, Enew

    return BCRFactor(levels=tuple(levels), final=block_tridiag_factor(D, E))


def bcr_solve(fac: BCRFactor, b: jnp.ndarray) -> jnp.ndarray:
    """Solve with a bcr_factor result; b is (N, w)."""
    w = b.shape[1]
    nblocks = b.shape[0]
    pad = _bcr_padded_blocks(fac) - nblocks
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, w), b.dtype)])

    # Forward reduction
    b_stack = [b]
    for lv in fac.levels:
        b_odd = b[1::2]
        z = jax.vmap(
            lambda Lk, dk, bk: solve_triangular(
                Lk.T,
                solve_triangular(Lk, bk, lower=True)
                / jnp.where(dk == 0.0, 1.0, dk),
                lower=False,
            )
        )(lv.Lo, lv.do, b_odd)
        bnew = b[0::2]
        bnew = bnew.at[:-1].add(
            -jnp.einsum("kba,kb->ka", lv.Eleft, z)
        )
        bnew = bnew.at[1:].add(-jnp.einsum("kab,kb->ka", lv.Eright, z))
        b = bnew
        b_stack.append(b)

    # Coarsest solve (≤2 blocks, Thomas)
    x = block_tridiag_solve(fac.final, b)

    # Back substitution
    for lv, b_l in zip(reversed(fac.levels), reversed(b_stack[:-1])):
        b_odd = b_l[1::2]
        z = jax.vmap(
            lambda Lk, dk, bk: solve_triangular(
                Lk.T,
                solve_triangular(Lk, bk, lower=True)
                / jnp.where(dk == 0.0, 1.0, dk),
                lower=False,
            )
        )(lv.Lo, lv.do, b_odd)
        # x_odd_k = z_k − X_k x_even[k] − Y_k x_even[k+1]
        x_odd = (
            z
            - jnp.einsum("kab,kb->ka", lv.X, x[:-1])
            - jnp.einsum("kab,kb->ka", lv.Y, x[1:])
        )
        P_next = x.shape[0] + x_odd.shape[0]
        out = jnp.zeros((P_next, w), x.dtype)
        out = out.at[0::2].set(x)
        out = out.at[1::2].set(x_odd)
        x = out

    return x[:nblocks]


def bcr_inertia(fac: BCRFactor, eps: float, num_blocks: int):
    """Inertia from all eliminated pivots plus the coarsest factor, minus
    the identity padding's known +1 pivots."""
    pos = jnp.sum(fac.final.d > eps)
    neg = jnp.sum(fac.final.d < -eps)
    total = fac.final.d.size
    for lv in fac.levels:
        pos = pos + jnp.sum(lv.do > eps)
        neg = neg + jnp.sum(lv.do < -eps)
        total += lv.do.size
    w = fac.final.d.shape[-1]
    pad_pos = (_bcr_padded_blocks(fac) - num_blocks) * w
    pos = pos - pad_pos
    zero = (total - pad_pos) - pos - neg
    return pos, neg, zero
