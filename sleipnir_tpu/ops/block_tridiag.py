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
    arithmetic on any backend. O(w) sequential fori steps for a (w, w)
    block — w is the small stage width, not the horizon. (Measured on
    v5e at K=101, w=13: the fori form costs ~54 ms inside the stage scan
    vs ~76 ms fully unrolled — the unrolled body's extra per-op dispatch
    overhead outweighs the loop-control saving, so the loop stays.)"""
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


def _lu_solve_packed(LU, piv, b):
    """Solve with a LAPACK-convention packed LU (from _lu_pivoted or
    lu_factor), fully UNROLLED — the TPU-fast substitute for
    jax.scipy.linalg.lu_solve, whose TriangularSolve lowering runs a
    sequential device loop (~30 µs/step on v5e). b is (n,) or (n, k)."""
    n = LU.shape[0]
    idx = jnp.arange(n)
    for k in range(n):
        p = piv[k]
        bk = b[k]
        bp = b[p]
        b = b.at[k].set(bp).at[p].set(bk)
    # Forward substitution with the unit-lower factor (strict lower of LU)
    for k in range(1, n):
        row = jnp.where(idx < k, LU[k], 0.0)
        b = b.at[k].add(-(row @ b))
    # Back substitution with the upper factor
    for k in range(n - 1, -1, -1):
        row = jnp.where(idx > k, LU[k], 0.0)
        b = b.at[k].set((b[k] - row @ b) / LU[k, k])
    return b


#: Test hook: force the accelerator (Linv, U, perm) block factorization
#: on CPU so its numerics are covered by the CPU test suite.
import os as _os  # noqa: E402

_FORCE_PLU = _os.environ.get("SLEIPNIR_TPU_PLU") == "1"


def _lu_pivoted_perm(A):
    """Row-pivoted LU like _lu_pivoted, additionally tracking the FINAL
    row permutation as a vector so solves apply it with one gather
    instead of a w-step swap loop: (PA) = LU with (PA)[i] = A[perm[i]]."""
    n = A.shape[0]
    idx = jnp.arange(n)

    def body(k, carry):
        LU, perm = carry
        col = jnp.where(idx < k, -jnp.inf, jnp.abs(LU[:, k]))
        p = jnp.argmax(col)
        row_k = LU[k]
        row_p = LU[p]
        LU = LU.at[k].set(row_p).at[p].set(row_k)
        pk = perm[k]
        pp = perm[p]
        perm = perm.at[k].set(pp).at[p].set(pk)
        pivot = LU[k, k]
        pivot_safe = jnp.where(pivot == 0.0, 1.0, pivot)
        factors = jnp.where(idx > k, LU[:, k] / pivot_safe, 0.0)
        row_vals = jnp.where(idx > k, LU[k], 0.0)
        LU = LU - jnp.outer(factors, row_vals)
        LU = LU.at[:, k].set(jnp.where(idx > k, factors, LU[:, k]))
        return LU, perm

    perm0 = jnp.arange(n, dtype=jnp.int32)
    return lax.fori_loop(0, n, body, (A, perm0))


def _unit_lower_inv(L_strict):
    """Explicit inverse of I + N (N strictly lower) by nilpotent doubling:
    (I + N)⁻¹ = ∏ⱼ (I + M^(2^j)) with M = −N — 2·log₂(w) matmuls, no
    sequential substitution. Stable here because partial pivoting bounds
    N's entries by 1 (the conditioning of the block lives in U, which
    keeps a backward-stable substitution solve)."""
    n = L_strict.shape[-1]
    M = -L_strict
    acc = jnp.eye(n, dtype=L_strict.dtype) + M
    P = M
    levels = int(np.ceil(np.log2(max(n, 2))))
    for _ in range(levels - 1):
        P = P @ P
        acc = acc + acc @ P
    return acc


def _u_substitute(U, b):
    """Back substitution with the upper factor; b is (n,) or (n, k).
    The sequential part that stays a loop: U carries the block's
    conditioning, and explicit triangular inverses of it are only
    forward-stable (see the Explicit-inverse section's stability note)."""
    n = U.shape[0]
    idx = jnp.arange(n)
    for k in range(n - 1, -1, -1):
        row = jnp.where(idx > k, U[k], 0.0)
        b = b.at[k].set((b[k] - row @ b) / U[k, k])
    return b


def _block_factor(S):
    """Pivoted LU of one (w, w) block: LAPACK on CPU; on accelerators a
    handmade pivoted LU stored as (Linv, U) + permutation vector so every
    solve is one gather + one matmul + one U-substitution (the w-step
    row-swap and forward-substitution loops are paid once at factor
    time; measured round 5: the per-application kernel count drops
    ~3.5x, which is the latency currency on the TPU)."""
    if jax.default_backend() == "cpu" and not _FORCE_PLU:
        from jax.scipy.linalg import lu_factor  # noqa: PLC0415

        return lu_factor(S)
    LU, perm = _lu_pivoted_perm(S)
    Linv = _unit_lower_inv(jnp.tril(LU, -1))
    U = jnp.triu(LU)
    return (Linv, U), perm


def _block_lu_solve(lu, piv, b):
    """Solve with a _block_factor result: LAPACK getrs on CPU; gather +
    Linv matmul + U substitution on accelerators."""
    if not isinstance(lu, tuple):
        from jax.scipy.linalg import lu_solve  # noqa: PLC0415

        return lu_solve((lu, piv), b)
    Linv, U = lu
    y = Linv @ b[piv]
    return _u_substitute(U, y)


def _block_solve_fresh(S, B):
    """Solve S X = B for one block without keeping the factorization."""
    if jax.default_backend() == "cpu":
        return jnp.linalg.solve(S, B)
    lu, piv = _block_factor(S)
    return _block_lu_solve(lu, piv, B)


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
            lu=jax.tree.map(lambda a: a[None], lu0),
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
    nblocks, w = b.shape
    if nblocks == 1:
        return _block_lu_solve(
            jax.tree.map(lambda a: a[0], fac.lu), fac.piv[0], b[0]
        )[None]

    # Forward: y_0 = b_0; y_{k+1} = b_{k+1} − W_k y_k
    def fwd(y_prev, inputs):
        bk1, Wk = inputs
        yk1 = bk1 - Wk @ y_prev
        return yk1, y_prev

    y_last, ys = lax.scan(fwd, b[0], (b[1:], fac.W))
    y = jnp.concatenate([ys, y_last[None]], axis=0)

    # Diagonal solves: z_k = Sₖ⁻¹ y_k (batched pivoted LU)
    z = jax.vmap(_block_lu_solve)(fac.lu, fac.piv, y)

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
# Partitioned (SPIKE/Schur) factorization: the TPU-fast path
# ---------------------------------------------------------------------------
#
# The sequential block-Thomas scan costs ~(K · ops-per-step) · ~10-30 µs of
# device control overhead per tiny f64 op on the TPU (measured ~54 ms at
# K=101, w=13 on v5e — two orders above the arithmetic cost). The
# partitioned factorization eliminates the interiors of P contiguous
# partitions IN PARALLEL (one batched scan of L-1 steps over the P-wide
# batch axis), then factors the P-block reduced interface system
# (recursively partitioned again while it stays large). Sequential depth
# drops from K to ~2·sqrt(K) per level. Block elimination is a symmetric
# congruence, so interior pivots + reduced pivots expose the exact
# inertia (Sylvester), exactly as in the plain scan.
#
# This is also the communication structure of the multi-device time-axis
# partition (SURVEY.md §7 step 5): each device owns partitions, the
# reduced interface system is the only cross-device coupling.


@jax.tree_util.register_pytree_node_class
class PartitionedFactor:
    """Factor from partitioned Schur elimination.

    Interior data is stacked (L-1, P, w, w): step-major so the batched
    forward/backward scans read contiguous slices. `red` is the factor of
    the P-block reduced interface system (recursively a PartitionedFactor
    or a BlockTridiagFactor). The partition geometry (nblocks, L, P) is
    static pytree aux data so it survives tree.map merges under jit.
    """

    def __init__(self, int_lu, int_piv, int_d, U, E_in, red, nblocks, L, P):
        self.int_lu = int_lu  # (L-1, P, w, w) pivoted-LU of interior S_i
        self.int_piv = int_piv  # (L-1, P, w) int32
        self.int_d = int_d  # (L-1, P, w) unpivoted-LDLT pivots (inertia)
        self.U = U  # (L-1, P, w, w) fill A(b_i, I_{p-1})
        self.E_in = E_in  # (L-1, P, w, w) within-partition couplings
        self.red = red  # factor of the reduced (P, w, w) system
        self.nblocks = nblocks  # original (unpadded) block count
        self.L = L
        self.P = P

    def tree_flatten(self):
        return (
            (self.int_lu, self.int_piv, self.int_d, self.U, self.E_in,
             self.red),
            (self.nblocks, self.L, self.P),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _choose_partitions(nblocks: int) -> tuple[int, int]:
    """Pick (P, L) with P·L ≥ nblocks, L ≈ √K (minimizes L+P depth)."""
    L = max(2, int(np.ceil(np.sqrt(nblocks))))
    P = int(np.ceil(nblocks / L))
    return P, L


#: Below this size the reduced system uses the sequential scan.
_PART_MIN_BLOCKS = 48


def block_tridiag_factor_part(D: jnp.ndarray, E: jnp.ndarray):
    """Partitioned factorization of a block-tridiagonal matrix.

    Same contract as block_tridiag_factor (diagonal blocks D (K, w, w),
    sub-diagonal E (K-1, w, w)); returns a PartitionedFactor.
    """
    K, w, _ = D.shape
    if K < _PART_MIN_BLOCKS:
        return block_tridiag_factor(D, E)
    P, L = _choose_partitions(K)
    pad = P * L - K
    if pad:
        D = jnp.concatenate(
            [D, jnp.broadcast_to(jnp.eye(w, dtype=D.dtype), (pad, w, w))]
        )
        E = jnp.concatenate(
            [E, jnp.zeros((P * L - 1 - E.shape[0], w, w), D.dtype)]
        )

    # Partition p owns global blocks [pL, (p+1)L); its INTERFACE is the
    # last block (p+1)L-1; the L-1 interior blocks come first.
    Dp = D.reshape(P, L, w, w)
    D_int = jnp.swapaxes(Dp[:, : L - 1], 0, 1)  # (L-1, P, w, w)
    D_ifc = Dp[:, L - 1]  # (P, w, w)
    # Within-partition couplings E_global[pL + i], i = 0..L-2
    idx_in = (jnp.arange(P)[:, None] * L + jnp.arange(L - 1)[None, :])
    E_in = jnp.swapaxes(E[idx_in], 0, 1)  # (L-1, P, w, w)
    # Boundary couplings A(b_0^{(p)}, I_{p-1}) = E_global[pL-1] (p >= 1)
    U0 = jnp.concatenate(
        [jnp.zeros((1, w, w), D.dtype), E[jnp.arange(1, P) * L - 1]]
    )  # (P, w, w)

    def step(carry, inputs):
        S, U, dDl = carry  # S: (P,w,w) current interior Schur;
        # U: (P,w,w) fill A(b_i, I_{p-1}); dDl: accumulated -U^T S^{-1} U
        D_next, E_i = inputs
        lu, piv = jax.vmap(_block_factor)(S)
        _l, dpiv = jax.vmap(_ldlt_unblocked)(S)
        SinvEt = jax.vmap(_block_lu_solve)(lu, piv, jnp.swapaxes(E_i, 1, 2))
        SinvU = jax.vmap(_block_lu_solve)(lu, piv, U)
        S_next = D_next - jnp.einsum("pab,pbc->pac", E_i, SinvEt)
        U_next = -jnp.einsum("pab,pbc->pac", E_i, SinvU)
        dDl_next = dDl - jnp.einsum("pba,pbc->pac", U, SinvU)
        return (S_next, U_next, dDl_next), (lu, piv, dpiv, U)

    init = (D_int[0], U0, jnp.zeros((P, w, w), D.dtype))
    inputs = (
        jnp.concatenate([D_int[1:], D_ifc[None]], axis=0),
        E_in,
    )
    (S_last, U_last, dDl), (int_lu, int_piv, int_d, U_stack) = lax.scan(
        step, init, inputs
    )
    # After eliminating all L-1 interiors: S_last is the condensed OWN
    # interface diagonal D(I_p) - fills; U_last the condensed coupling
    # A(I_p, I_{p-1}); dDl the correction to D(I_{p-1}).
    D_red = S_last + jnp.concatenate(
        [dDl[1:], jnp.zeros((1, w, w), D.dtype)], axis=0
    )
    E_red = U_last[1:]  # A(I_p, I_{p-1}) for p >= 1

    red = block_tridiag_factor_part(D_red, E_red)
    return PartitionedFactor(
        int_lu=int_lu,
        int_piv=int_piv,
        int_d=int_d,
        U=U_stack,
        E_in=E_in,
        red=red,
        nblocks=K,
        L=L,
        P=P,
    )


def block_tridiag_solve_part(fac, b: jnp.ndarray) -> jnp.ndarray:
    """Solve with a block_tridiag_factor_part result; b is (K, w)."""
    if not isinstance(fac, PartitionedFactor):
        return block_tridiag_solve(fac, b)
    K, w = fac.nblocks, b.shape[1]
    P, L = fac.P, fac.L
    pad = P * L - K
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, w), b.dtype)])
    bp = b.reshape(P, L, w)
    y0 = jnp.swapaxes(bp[:, : L - 1], 0, 1)  # (L-1, P, w)
    b_ifc = bp[:, L - 1]  # (P, w)

    # Forward: z_i = S_i^{-1} y_i; y_{i+1} -= E_i z_i; b(I_{p-1}) -= U_i^T z_i
    def fwd(carry, inputs):
        y_next_corr, dbl = carry  # correction flowing to the next block
        y_i, lu, piv, E_i, U_i = inputs
        y_i = y_i + y_next_corr
        z = jax.vmap(_block_lu_solve)(lu, piv, y_i)
        corr = -jnp.einsum("pab,pb->pa", E_i, z)
        dbl_next = dbl - jnp.einsum("pba,pb->pa", U_i, z)
        return (corr, dbl_next), y_i

    (last_corr, dbl), y_eff = lax.scan(
        fwd,
        (jnp.zeros((P, w), b.dtype), jnp.zeros((P, w), b.dtype)),
        (y0, fac.int_lu, fac.int_piv, fac.E_in, fac.U),
    )
    b_red = (
        b_ifc
        + last_corr
        + jnp.concatenate([dbl[1:], jnp.zeros((1, w), b.dtype)], axis=0)
    )
    x_ifc = block_tridiag_solve_part(fac.red, b_red)  # (P, w)

    # Backward: x_i = S_i^{-1} (y_i - E_i^T x_{i+1} - U_i x_{I_{p-1}})
    x_left = jnp.concatenate(
        [jnp.zeros((1, w), b.dtype), x_ifc[:-1]], axis=0
    )  # (P, w) interface left of each partition

    def bwd(x_next, inputs):
        y_i, lu, piv, E_i, U_i = inputs
        rhs = (
            y_i
            - jnp.einsum("pba,pb->pa", E_i, x_next)
            - jnp.einsum("pab,pb->pa", U_i, x_left)
        )
        x_i = jax.vmap(_block_lu_solve)(lu, piv, rhs)
        return x_i, x_i

    _, xs_rev = lax.scan(
        bwd,
        x_ifc,
        (
            y_eff[::-1],
            # int_lu may be a (Linv, U) tuple on the accelerator path:
            # reverse the ARRAYS, not the container.
            jax.tree.map(lambda a: a[::-1], fac.int_lu),
            fac.int_piv[::-1],
            fac.E_in[::-1],
            fac.U[::-1],
        ),
    )
    x_int = jnp.swapaxes(xs_rev[::-1], 0, 1)  # (P, L-1, w)
    x = jnp.concatenate([x_int, x_ifc[:, None]], axis=1).reshape(P * L, w)
    return x[:K]


def part_inertia(fac, eps: float):
    """Inertia from interior + reduced pivots (congruence; identity
    padding contributes exactly +w each, subtracted here)."""
    if not isinstance(fac, PartitionedFactor):
        return block_tridiag_inertia(fac, eps)
    pos = jnp.sum(fac.int_d > eps)
    neg = jnp.sum(fac.int_d < -eps)
    total = fac.int_d.size
    rpos, rneg, rzero = part_inertia(fac.red, eps)
    pos = pos + rpos
    neg = neg + rneg
    total += rpos + rneg + rzero
    pad_pos = (fac.P * fac.L - fac.nblocks) * fac.int_d.shape[-1]
    pos = pos - pad_pos
    zero = (total - pad_pos) - pos - neg
    return pos, neg, zero


def part_pivots(fac) -> list:
    """All pivot arrays of a (possibly recursive) partitioned factor."""
    if not isinstance(fac, PartitionedFactor):
        return [fac.d]
    return [fac.int_d] + part_pivots(fac.red)


# ---------------------------------------------------------------------------
# Explicit-inverse (substitution-free) factorization: the TPU latency path
# ---------------------------------------------------------------------------
#
# Round-4 measurements (docs/tpu_numerics.md, docs/round4_notes.md) located
# the TPU per-iteration latency floor in the *op count of the sequential
# region*: every tiny emulated-f64 op inside the factorization's sequential
# steps pays device control overhead, so the pivoted-LU + unrolled
# triangular substitution (~190 ops per elimination step) dominated the
# 109 ms/iteration factorization cost. The fix is to carry EXPLICIT block
# inverses: each Schur complement Sₖ is inverted once (closed form for
# w ≤ 3; an O(w)-step symmetric Gauss-Jordan "sweep" otherwise — each
# sweep step is ~4 fused ops) and every subsequent use of Sₖ⁻¹ becomes one
# batched matmul. The sweep pivots are exactly the unpivoted-LDLᵀ pivots
# (after sweeping 0..k−1 the trailing block is the Schur complement of the
# leading block), so the inertia extraction is unchanged.
#
# Stability: the sweep is unpivoted, the same class as the unpivoted LDLᵀ
# the inertia extraction (and the reference's Eigen SimplicialLDLT) already
# trusts; the callers Ruiz-equilibrate the KKT system to O(1) pivots and
# run fixed-count iterative refinement against the exact KKT matvec, which
# was measured to recover ~1e-13 relative solve error even on μ-floor
# systems with cond ≈ 5e29 (docs/tpu_numerics.md "Linear-solve accuracy").
# A Newton polish of each inverse (X ← X + X(I − S X), two batched
# matmuls) squares the local residual at negligible cost.


def _inv_pivots_sweep(A):
    """Symmetric explicit inverse + LDLᵀ pivots via the sweep operator.

    One fori step per row: ~4 fused ops on the full (w, w) block, versus
    ~8 ops/row for pivoted LU *plus* ~6 ops/row for each later unrolled
    substitution. Returns (A⁻¹, d) with d the unpivoted-LDLᵀ pivots.
    """
    w = A.shape[0]
    idx = jnp.arange(w)

    def body(k, carry):
        A, d = carry
        row = lax.dynamic_slice_in_dim(A, k, 1, 0)[0]  # (w,)
        akk = row[k]
        d = d.at[k].set(akk)
        akk_safe = jnp.where(akk == 0.0, 1.0, akk)
        r = row / akk_safe
        ek = (idx == k).astype(A.dtype)
        rk = row[k] / akk_safe
        corr = rk + rk + 1.0 / akk_safe
        A = (
            A
            - jnp.outer(row, r)
            + jnp.outer(ek, r)
            + jnp.outer(r, ek)
            - corr * jnp.outer(ek, ek)
        )
        return A, d

    A_swept, d = lax.fori_loop(0, w, body, (A, jnp.zeros((w,), A.dtype)))
    return -A_swept, d


def _inv_pivots_1(A):
    a = A[0, 0]
    return 1.0 / jnp.where(a == 0.0, 1.0, a)[None, None], A[0]


def _inv_pivots_2(A):
    a, b, c = A[0, 0], A[0, 1], A[1, 1]
    det = a * c - b * b
    det_safe = jnp.where(det == 0.0, 1.0, det)
    T = jnp.stack([jnp.stack([c, -b]), jnp.stack([-b, a])]) / det_safe
    d = jnp.stack([a, det / jnp.where(a == 0.0, 1.0, a)])
    return T, d


def _inv_pivots_3(A):
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    dd, e, f = A[1, 1], A[1, 2], A[2, 2]
    C00 = dd * f - e * e
    C01 = -(b * f - c * e)
    C02 = b * e - c * dd
    C11 = a * f - c * c
    C12 = -(a * e - b * c)
    C22 = a * dd - b * b
    det = a * C00 + b * C01 + c * C02
    det_safe = jnp.where(det == 0.0, 1.0, det)
    T = (
        jnp.stack(
            [
                jnp.stack([C00, C01, C02]),
                jnp.stack([C01, C11, C12]),
                jnp.stack([C02, C12, C22]),
            ]
        )
        / det_safe
    )
    m2 = C22
    d = jnp.stack(
        [
            a,
            m2 / jnp.where(a == 0.0, 1.0, a),
            det / jnp.where(m2 == 0.0, 1.0, m2),
        ]
    )
    return T, d


def _inv_pivots(A, polish: int = 1):
    """Explicit inverse + unpivoted-LDLᵀ pivots of one symmetric block.

    Closed-form adjugate for w ≤ 3 (zero sequential loop — the flywheel
    OCP's entire stage block), sweep loop otherwise; `polish` Newton steps
    (2 matmuls each) square the inversion residual."""
    w = A.shape[0]
    if w == 1:
        T, d = _inv_pivots_1(A)
    elif w == 2:
        T, d = _inv_pivots_2(A)
    elif w == 3:
        T, d = _inv_pivots_3(A)
    else:
        T, d = _inv_pivots_sweep(A)
    for _ in range(polish):
        T = T + T @ (jnp.eye(w, dtype=A.dtype) - A @ T)
        T = 0.5 * (T + T.T)
    return T, d


class BlockTridiagFactorInv(NamedTuple):
    """Explicit-inverse factor of a block-tridiagonal symmetric matrix:
    T[k] = Sₖ⁻¹ (Schur complements of the block-Thomas recursion), d the
    unpivoted-LDLᵀ pivots of every Sₖ (inertia), W[k] = Eₖ Sₖ⁻¹."""

    T: jnp.ndarray  # (N, w, w)
    d: jnp.ndarray  # (N, w)
    W: jnp.ndarray  # (N-1, w, w)


def block_tridiag_factor_inv(D: jnp.ndarray, E: jnp.ndarray):
    """Sequential block-Thomas factorization carrying explicit inverses.

    Same contract as block_tridiag_factor; each scan step is one sweep
    inversion + two matmuls (no LU, no substitutions)."""
    nblocks, w, _ = D.shape
    if nblocks == 1:
        T0, d0 = _inv_pivots(D[0])
        return BlockTridiagFactorInv(
            T=T0[None], d=d0[None], W=jnp.zeros((0, w, w), D.dtype)
        )

    def step(S, inputs):
        Dk1, Ek = inputs
        T, d = _inv_pivots(S)
        X = T @ Ek.T  # Sₖ⁻¹ Eₖᵀ
        S_next = Dk1 - Ek @ X
        return S_next, (T, d, X)

    S_last, (Ts, ds, Xs) = lax.scan(step, D[0], (D[1:], E))
    T_last, d_last = _inv_pivots(S_last)
    return BlockTridiagFactorInv(
        T=jnp.concatenate([Ts, T_last[None]], axis=0),
        d=jnp.concatenate([ds, d_last[None]], axis=0),
        W=jnp.swapaxes(Xs, 1, 2),
    )


def block_tridiag_solve_inv(fac: BlockTridiagFactorInv, b: jnp.ndarray):
    """Solve with a block_tridiag_factor_inv result; b is (N, w).

    Forward/backward scans are one matmul per step; the diagonal solves
    are ONE batched einsum over all stages."""
    nblocks, w = b.shape
    if nblocks == 1:
        return (fac.T[0] @ b[0])[None]

    def fwd(y_prev, inputs):
        bk1, Wk = inputs
        yk1 = bk1 - Wk @ y_prev
        return yk1, y_prev

    y_last, ys = lax.scan(fwd, b[0], (b[1:], fac.W))
    y = jnp.concatenate([ys, y_last[None]], axis=0)
    z = jnp.einsum("kab,kb->ka", fac.T, y)

    def bwd(x_next, inputs):
        zk, Wk = inputs
        xk = zk - Wk.T @ x_next
        return xk, x_next

    x_first, xs_rev = lax.scan(bwd, z[-1], (z[:-1][::-1], fac.W[::-1]))
    return jnp.concatenate([x_first[None], xs_rev[::-1]], axis=0)


@jax.tree_util.register_pytree_node_class
class PartitionedFactorInv:
    """Partitioned (SPIKE/Schur) factor carrying explicit interior
    inverses — the substitution-free analog of PartitionedFactor. Interior
    solves are batched matmuls against int_T; `red` is recursively a
    PartitionedFactorInv or a BlockTridiagFactorInv."""

    def __init__(self, int_T, int_d, U, E_in, red, nblocks, L, P):
        self.int_T = int_T  # (L-1, P, w, w) explicit interior inverses
        self.int_d = int_d  # (L-1, P, w) LDLT pivots (inertia)
        self.U = U  # (L-1, P, w, w) fill A(b_i, I_{p-1})
        self.E_in = E_in  # (L-1, P, w, w) within-partition couplings
        self.red = red
        self.nblocks = nblocks
        self.L = L
        self.P = P

    def tree_flatten(self):
        return (
            (self.int_T, self.int_d, self.U, self.E_in, self.red),
            (self.nblocks, self.L, self.P),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


#: Below this block count the explicit-inverse path uses the sequential
#: scan (the partition's batching can't pay for its padding/2-phase
#: overhead on a handful of blocks).
_PART_INV_MIN_BLOCKS = 24

#: Partition length cap: keeps the recursion at 2-3 levels while bounding
#: the sequential depth at long horizons (K=5000: 31+12+13 = 56 batched
#: steps instead of the uncapped sqrt-K's 86).
_PART_INV_MAX_L = 32


def _choose_partitions_inv(nblocks: int) -> tuple[int, int]:
    L = max(2, min(int(np.ceil(np.sqrt(nblocks))), _PART_INV_MAX_L))
    P = int(np.ceil(nblocks / L))
    return P, L


def block_tridiag_factor_part_inv(D: jnp.ndarray, E: jnp.ndarray):
    """Partitioned factorization with explicit-inverse interior blocks.

    Same contract as block_tridiag_factor_part. Each batched elimination
    step is one batched sweep inversion + five batched matmuls (~1/6 the
    op count of the LU+substitution step it replaces)."""
    K, w, _ = D.shape
    if K < _PART_INV_MIN_BLOCKS:
        return block_tridiag_factor_inv(D, E)
    P, L = _choose_partitions_inv(K)
    pad = P * L - K
    if pad:
        D = jnp.concatenate(
            [D, jnp.broadcast_to(jnp.eye(w, dtype=D.dtype), (pad, w, w))]
        )
        E = jnp.concatenate(
            [E, jnp.zeros((P * L - 1 - E.shape[0], w, w), D.dtype)]
        )

    Dp = D.reshape(P, L, w, w)
    D_int = jnp.swapaxes(Dp[:, : L - 1], 0, 1)  # (L-1, P, w, w)
    D_ifc = Dp[:, L - 1]  # (P, w, w)
    idx_in = jnp.arange(P)[:, None] * L + jnp.arange(L - 1)[None, :]
    E_in = jnp.swapaxes(E[idx_in], 0, 1)  # (L-1, P, w, w)
    U0 = jnp.concatenate(
        [jnp.zeros((1, w, w), D.dtype), E[jnp.arange(1, P) * L - 1]]
    )  # (P, w, w)

    def step(carry, inputs):
        S, U, dDl = carry
        D_next, E_i = inputs
        T, dpiv = jax.vmap(_inv_pivots)(S)
        TEt = jnp.einsum("pab,pcb->pac", T, E_i)  # Sᵢ⁻¹ Eᵢᵀ
        TU = jnp.einsum("pab,pbc->pac", T, U)
        S_next = D_next - jnp.einsum("pab,pbc->pac", E_i, TEt)
        U_next = -jnp.einsum("pab,pbc->pac", E_i, TU)
        dDl_next = dDl - jnp.einsum("pba,pbc->pac", U, TU)
        return (S_next, U_next, dDl_next), (T, dpiv, U)

    init = (D_int[0], U0, jnp.zeros((P, w, w), D.dtype))
    inputs = (
        jnp.concatenate([D_int[1:], D_ifc[None]], axis=0),
        E_in,
    )
    (S_last, U_last, dDl), (int_T, int_d, U_stack) = lax.scan(
        step, init, inputs
    )
    D_red = S_last + jnp.concatenate(
        [dDl[1:], jnp.zeros((1, w, w), D.dtype)], axis=0
    )
    E_red = U_last[1:]
    red = block_tridiag_factor_part_inv(D_red, E_red)
    return PartitionedFactorInv(
        int_T=int_T,
        int_d=int_d,
        U=U_stack,
        E_in=E_in,
        red=red,
        nblocks=K,
        L=L,
        P=P,
    )


def block_tridiag_solve_part_inv(fac, b: jnp.ndarray) -> jnp.ndarray:
    """Solve with a block_tridiag_factor_part_inv result; b is (K, w)."""
    if isinstance(fac, BlockTridiagFactorInv):
        return block_tridiag_solve_inv(fac, b)
    K, w = fac.nblocks, b.shape[1]
    P, L = fac.P, fac.L
    pad = P * L - K
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, w), b.dtype)])
    bp = b.reshape(P, L, w)
    y0 = jnp.swapaxes(bp[:, : L - 1], 0, 1)  # (L-1, P, w)
    b_ifc = bp[:, L - 1]  # (P, w)

    def fwd(carry, inputs):
        y_next_corr, dbl = carry
        y_i, T_i, E_i, U_i = inputs
        y_i = y_i + y_next_corr
        z = jnp.einsum("pab,pb->pa", T_i, y_i)
        corr = -jnp.einsum("pab,pb->pa", E_i, z)
        dbl_next = dbl - jnp.einsum("pba,pb->pa", U_i, z)
        return (corr, dbl_next), y_i

    (last_corr, dbl), y_eff = lax.scan(
        fwd,
        (jnp.zeros((P, w), b.dtype), jnp.zeros((P, w), b.dtype)),
        (y0, fac.int_T, fac.E_in, fac.U),
    )
    b_red = (
        b_ifc
        + last_corr
        + jnp.concatenate([dbl[1:], jnp.zeros((1, w), b.dtype)], axis=0)
    )
    x_ifc = block_tridiag_solve_part_inv(fac.red, b_red)  # (P, w)

    x_left = jnp.concatenate(
        [jnp.zeros((1, w), b.dtype), x_ifc[:-1]], axis=0
    )

    def bwd(x_next, inputs):
        y_i, T_i, E_i, U_i = inputs
        rhs = (
            y_i
            - jnp.einsum("pba,pb->pa", E_i, x_next)
            - jnp.einsum("pab,pb->pa", U_i, x_left)
        )
        x_i = jnp.einsum("pab,pb->pa", T_i, rhs)
        return x_i, x_i

    _, xs_rev = lax.scan(
        bwd,
        x_ifc,
        (y_eff[::-1], fac.int_T[::-1], fac.E_in[::-1], fac.U[::-1]),
    )
    x_int = jnp.swapaxes(xs_rev[::-1], 0, 1)  # (P, L-1, w)
    x = jnp.concatenate([x_int, x_ifc[:, None]], axis=1).reshape(P * L, w)
    return x[:K]


def inv_part_inertia(fac, eps: float):
    """Inertia of an explicit-inverse factor (scan or partitioned)."""
    if isinstance(fac, BlockTridiagFactorInv):
        d = fac.d
        positive = jnp.sum(d > eps)
        negative = jnp.sum(d < -eps)
        return positive, negative, d.size - positive - negative
    pos = jnp.sum(fac.int_d > eps)
    neg = jnp.sum(fac.int_d < -eps)
    total = fac.int_d.size
    rpos, rneg, rzero = inv_part_inertia(fac.red, eps)
    pos = pos + rpos
    neg = neg + rneg
    total += rpos + rneg + rzero
    pad_pos = (fac.P * fac.L - fac.nblocks) * fac.int_d.shape[-1]
    pos = pos - pad_pos
    zero = (total - pad_pos) - pos - neg
    return pos, neg, zero


def inv_part_pivots(fac) -> list:
    """All pivot arrays of an explicit-inverse factor."""
    if isinstance(fac, BlockTridiagFactorInv):
        return [fac.d]
    return [fac.int_d] + inv_part_pivots(fac.red)


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
