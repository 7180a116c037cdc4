"""Block-tridiagonal factor/solve as single Pallas TPU kernels.

THE latency lever for the IPM on TPU (SURVEY.md §7 step 3's "Pallas
blocked factorization"): XLA's emulated-f64 factorization pays ~0.25-0.35
ms of device overhead per sequential loop trip and ~30-80 µs per fused
kernel (docs/tpu_numerics.md round-5 measurements), so a K-stage
block-Thomas scan is floored at ~K/3 ms regardless of arithmetic. These
kernels run the ENTIRE factorization (and solve) inside one Pallas
program in double-float (2xf32, ops/dd.py) at ~2^-46 effective precision
— the same class as the emulation — with per-stage cost measured in
microseconds instead of a third of a millisecond.

Design notes:
  - Per-stage pivoted LU uses a SWAP-FREE one-hot formulation: the pivot
    row is selected by argmax, extracted and eliminated with exact {0,1}
    mask multiplies, and the row permutation is accumulated as a one-hot
    matrix P (one-hot matmuls are exact in f32 — single-term sums). No
    dynamic indexing inside the kernel.
  - All double-float operations are 2D elementwise or rank-1 updates
    (column-oriented substitution/matmul), never dd reductions.
  - Backward stability matches the pivoted-LU XLA path: L entries are
    bounded by partial pivoting, U keeps a substitution solve — the
    Schur chain stays backward stable (see ops/block_tridiag.py
    "Explicit-inverse" stability note for why that is load-bearing).
  - Inertia: unpivoted-LDLT pivots of every Schur complement are computed
    in dd alongside the LU (Sylvester congruence, exactly as the XLA
    paths do).

Reference being replaced: the Eigen SimplicialLDLT factorization inside
reference/include/sleipnir/optimization/solver/util/regularized_ldlt.hpp
and the serial elimination loop of interior_point.hpp:426-465.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sleipnir_tpu.ops import dd


def _f32(x):
    return x.astype(jnp.float32)



def _perm_apply_idx(perm, M, w):
    """Exact (P @ M)[i] = M[perm[i]] from the (1, w) i32 permutation
    vector: w-step masked accumulation on the VPU. (The MXU's f32 matmul
    truncates through bf16 passes at default precision — measured 5.5e-3
    error on a one-hot product on the v5e — so permutations must NEVER
    go through jnp.dot, and a one-hot matrix would cost a full (K, w, w)
    f32 array of VMEM; the index vector costs (K, w) i32.)"""
    rows = jax.lax.broadcasted_iota(jnp.int32, (M.shape[0], 1), 0)
    out = jnp.zeros_like(M)
    for k in range(w):
        pk = perm[0, k]  # static column index -> i32 scalar
        src_row = jnp.sum(
            M * (rows == pk).astype(jnp.float32), axis=0, keepdims=True
        )
        out = out + (rows == k).astype(jnp.float32) * src_row
    return out

def _lu_factor_dd(Sh, Sl, w):
    """Swap-free pivoted LU of one (w, w) dd block.

    Returns (LUh, LUl, perm) with (PA) = LU, where perm is the (1, w)
    i32 row-permutation vector ((PA)[i] = A[perm[i]]) and LU packs the
    strict lower unit-L multipliers with the upper factor (LAPACK
    convention) — halving the factor storage, which is the VMEM
    bottleneck for long horizons (small trailing dims pad to 128
    lanes)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    Lh = jnp.zeros((w, w), jnp.float32)
    Ll = jnp.zeros((w, w), jnp.float32)
    Uh = jnp.zeros((w, w), jnp.float32)
    Ul = jnp.zeros((w, w), jnp.float32)
    perm = jnp.zeros((1, w), jnp.int32)
    pcols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    active = jnp.ones((w, 1), jnp.float32)
    Ah, Al = Sh, Sl
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    for k in range(w):
        ek_col = (cols == k).astype(jnp.float32)  # (1, w)
        ckh = jnp.sum(Ah * ek_col, axis=1, keepdims=True)  # exact gather
        ckl = jnp.sum(Al * ek_col, axis=1, keepdims=True)
        score = jnp.abs(ckh) * active - (1.0 - active)
        # int32 index dtype: Mosaic's argmax lowering requires it.
        p = jax.lax.argmax(score[:, 0], 0, jnp.int32)
        op = (rows == p).astype(jnp.float32)  # (w, 1)
        pivot_h = jnp.sum(op * ckh)
        pivot_l = jnp.sum(op * ckl)
        # multipliers for the remaining active rows
        fh, fl = dd.div2(ckh, ckl, pivot_h, pivot_l)
        mask_f = active * (1.0 - op)
        fh = fh * mask_f
        fl = fl * mask_f
        rowp_h = jnp.sum(op * Ah, axis=0, keepdims=True)  # (1, w) exact
        rowp_l = jnp.sum(op * Al, axis=0, keepdims=True)
        # A <- A - f ⊗ rowp (only affects active non-pivot rows)
        th, tl = dd.mul2(fh, fl, rowp_h, rowp_l)
        Ah, Al = dd.sub2(Ah, Al, th, tl)
        ek_row = (rows == k).astype(jnp.float32)  # (w, 1) step index
        Lh = Lh + fh * ek_col
        Ll = Ll + fl * ek_col
        Uh = Uh + ek_row * rowp_h
        Ul = Ul + ek_row * rowp_l
        perm = perm + p * (pcols == k).astype(jnp.int32)
        active = active * (1.0 - op)
    # L to step space (L' = P @ L) and pack: LU = tril(L', -1) + triu(U)
    Lh = _perm_apply_idx(perm, Lh, w)
    Ll = _perm_apply_idx(perm, Ll, w)
    LUh = jnp.tril(Lh, -1) + jnp.triu(Uh)
    LUl = jnp.tril(Ll, -1) + jnp.triu(Ul)
    return LUh, LUl, perm


def _ldlt_pivots_dd(Sh, Sl, w):
    """Unpivoted-LDLT pivots of one (w, w) dd block (inertia only).
    Returns (dh, dl) of shape (1, w)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    dh = jnp.zeros((1, w), jnp.float32)
    dl = jnp.zeros((1, w), jnp.float32)
    Ah, Al = Sh, Sl
    for j in range(w):
        ej_col = (cols == j).astype(jnp.float32)
        ej_row = (rows == j).astype(jnp.float32)
        djh = jnp.sum(Ah * ej_col * ej_row[:, 0][:, None])
        djl = jnp.sum(Al * ej_col * ej_row[:, 0][:, None])
        dh = dh + djh * ej_col
        dl = dl + djl * ej_col
        colh = jnp.sum(Ah * ej_col, axis=1, keepdims=True)
        coll = jnp.sum(Al * ej_col, axis=1, keepdims=True)
        mask = (rows > j).astype(jnp.float32)
        lh, ll = dd.div2(colh * mask, coll * mask, djh, djl)
        # A <- A - d_j * l lᵀ
        oh, ol = dd.mul2(lh, ll, lh[:, 0][None, :], ll[:, 0][None, :])
        th, tl = dd.mul2(oh, ol, djh, djl)
        Ah, Al = dd.sub2(Ah, Al, th, tl)
    return dh, dl


def _tri_solve_dd(LUh, LUl, perm, bh, bl, w):
    """Solve (P⁻¹ L U) x = b for one block; b is (w, r) dd; LU packed."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    lower = (rows > cols).astype(jnp.float32)
    upper = (rows <= cols).astype(jnp.float32)
    Lh = LUh * lower
    Ll = LUl * lower
    Uh = LUh * upper
    Ul = LUl * upper
    # y = P b (exact index-based application)
    yh = _perm_apply_idx(perm, bh, w)
    yl = _perm_apply_idx(perm, bl, w)
    # forward substitution, column-oriented: y[j+1:] -= L[:, j] * y[j]
    for j in range(w - 1):
        ej = (cols == j).astype(jnp.float32)
        cjh = jnp.sum(Lh * ej, axis=1, keepdims=True) * (
            rows > j
        ).astype(jnp.float32)
        cjl = jnp.sum(Ll * ej, axis=1, keepdims=True) * (
            rows > j
        ).astype(jnp.float32)
        yjh = jnp.sum(yh * (rows == j), axis=0, keepdims=True)
        yjl = jnp.sum(yl * (rows == j), axis=0, keepdims=True)
        th, tl = dd.mul2(cjh, cjl, yjh, yjl)
        yh, yl = dd.sub2(yh, yl, th, tl)
    # back substitution with U
    for k in range(w - 1, -1, -1):
        ek_col = (cols == k).astype(jnp.float32)
        ek_row = (rows == k).astype(jnp.float32)
        ukkh = jnp.sum(Uh * ek_col * ek_row[:, 0][:, None])
        ukkl = jnp.sum(Ul * ek_col * ek_row[:, 0][:, None])
        ykh = jnp.sum(yh * ek_row, axis=0, keepdims=True)
        ykl = jnp.sum(yl * ek_row, axis=0, keepdims=True)
        zh, zl = dd.div2(ykh, ykl, ukkh, ukkl)
        # write back row k
        yh = yh * (1.0 - ek_row) + zh * ek_row
        yl = yl * (1.0 - ek_row) + zl * ek_row
        # eliminate from rows above: y[:k] -= U[:k, k] * z
        ckh = jnp.sum(Uh * ek_col, axis=1, keepdims=True) * (
            rows < k
        ).astype(jnp.float32)
        ckl = jnp.sum(Ul * ek_col, axis=1, keepdims=True) * (
            rows < k
        ).astype(jnp.float32)
        th, tl = dd.mul2(ckh, ckl, zh, zl)
        yh, yl = dd.sub2(yh, yl, th, tl)
    return yh, yl


def _matmul_dd(Ah, Al, Bh, Bl, w):
    """C = A @ B for (w, w) dd blocks, column-rank-1 accumulation."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    Ch = jnp.zeros((w, w), jnp.float32)
    Cl = jnp.zeros((w, w), jnp.float32)
    for k in range(w):
        ek_col = (cols == k).astype(jnp.float32)
        ek_row = (rows == k).astype(jnp.float32)
        ach = jnp.sum(Ah * ek_col, axis=1, keepdims=True)
        acl = jnp.sum(Al * ek_col, axis=1, keepdims=True)
        brh = jnp.sum(Bh * ek_row, axis=0, keepdims=True)
        brl = jnp.sum(Bl * ek_row, axis=0, keepdims=True)
        th, tl = dd.mul2(ach, acl, brh, brl)
        Ch, Cl = dd.add2(Ch, Cl, th, tl)
    return Ch, Cl


class PallasBandedFactor(NamedTuple):
    """Factor produced by pallas_banded_factor.

    LU is LAPACK-packed (strict-lower unit-L + upper U) and the row
    permutations are index vectors; the LU/X arrays alias the kernel's
    D/E inputs (input_output_aliases), so a factorization's live VMEM is
    four (K, w, w) f32 arrays total."""

    LUh: jnp.ndarray  # (K, w, w) packed LU per Schur block
    LUl: jnp.ndarray
    perm: jnp.ndarray  # (K, w) i32 row permutations
    dh: jnp.ndarray  # (K, w) LDLT pivots of the Schur chain (inertia)
    dl: jnp.ndarray
    Xh: jnp.ndarray  # (K-1, w, w) X_k = S_k⁻¹ E_kᵀ
    Xl: jnp.ndarray


def _factor_kernel(w, K, Dh_ref, Dl_ref, Eh_ref, El_ref,
                   LUh_ref, LUl_ref, Xh_ref, Xl_ref, perm_ref,
                   dh_ref, dl_ref):
    from jax.experimental import pallas as pl  # noqa: PLC0415

    # ALIASING ORDER CONTRACT: LUh/LUl alias Dh/Dl and Xh/Xl alias Eh/El
    # (input_output_aliases). Stage k reads D[k+1] and E[k] BEFORE
    # writing LU[k] and X[k], and never reads D[<=k] or E[<k] again.
    def stage(k, carry):
        Sh, Sl = carry
        # Read next-stage inputs FIRST (they share storage with this
        # stage's outputs).
        kk = jnp.minimum(k, np.int32(K - 2))
        k1 = jnp.minimum(k + 1, np.int32(K - 1))
        Eh = Eh_ref[kk]
        El = El_ref[kk]
        Dh1 = Dh_ref[k1]
        Dl1 = Dl_ref[k1]

        dh, dl = _ldlt_pivots_dd(Sh, Sl, w)
        dh_ref[k] = dh[0]
        dl_ref[k] = dl[0]
        LUh, LUl, perm = _lu_factor_dd(Sh, Sl, w)
        LUh_ref[k] = LUh
        LUl_ref[k] = LUl
        perm_ref[k] = perm[0]
        # X = S⁻¹ Eₖᵀ ; S_next = D_{k+1} − Eₖ X. The coupling work is
        # computed unconditionally (the k = K-1 result is discarded by
        # the select below) so only the ref WRITE is predicated.
        Xh, Xl = _tri_solve_dd(LUh, LUl, perm, Eh.T, El.T, w)

        @pl.when(k < K - 1)
        def _():
            Xh_ref[kk] = Xh
            Xl_ref[kk] = Xl

        Th, Tl = _matmul_dd(Eh, El, Xh, Xl, w)
        Sh_next, Sl_next = dd.sub2(Dh1, Dl1, Th, Tl)
        last = k >= K - 1
        Sh_next = jnp.where(last, Sh, Sh_next)
        Sl_next = jnp.where(last, Sl, Sl_next)
        return Sh_next, Sl_next

    jax.lax.fori_loop(
        np.int32(0), np.int32(K), stage, (Dh_ref[0], Dl_ref[0])
    )


def _matvec_T_dd(Mh, Ml, vh, vl, w, transpose):
    """(Mᵀ v) if transpose else (M v), column-rank-1 in dd; v is (w, 1)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    acch = jnp.zeros((w, 1), jnp.float32)
    accl = jnp.zeros((w, 1), jnp.float32)
    for j in range(w):
        ej = (rows == j).astype(jnp.float32)
        vjh = jnp.sum(vh * ej)
        vjl = jnp.sum(vl * ej)
        if transpose:
            # column j of Mᵀ = row j of M
            cjh = jnp.sum(Mh * ej, axis=0)[:, None]
            cjl = jnp.sum(Ml * ej, axis=0)[:, None]
        else:
            cjh = jnp.sum(Mh * ej[:, 0][None, :], axis=1)[:, None]
            cjl = jnp.sum(Ml * ej[:, 0][None, :], axis=1)[:, None]
        th, tl = dd.mul2(cjh, cjl, vjh, vjl)
        acch, accl = dd.add2(acch, accl, th, tl)
    return acch, accl


def _solve_kernel(w, K, LUh_ref, LUl_ref, Xh_ref, Xl_ref, perm_ref,
                  bh_ref, bl_ref, xh_ref, xl_ref):
    # Forward: y_{k+1} = b_{k+1} − W_k y_k with W_k = X_kᵀ; y_k is stored
    # into the output refs (reused as scratch) at each step, including
    # the final y_{K-1}.
    def fwd(k, carry):
        yh, yl = carry  # (w, 1) current y_k
        xh_ref[k] = yh[:, 0]
        xl_ref[k] = yl[:, 0]
        kk = jnp.minimum(k, np.int32(K - 2))
        acch, accl = _matvec_T_dd(
            Xh_ref[kk], Xl_ref[kk], yh, yl, w, transpose=True
        )
        k1 = jnp.minimum(k + 1, np.int32(K - 1))
        bh1 = bh_ref[k1][:, None]
        bl1 = bl_ref[k1][:, None]
        return dd.sub2(bh1, bl1, acch, accl)

    jax.lax.fori_loop(
        np.int32(0), np.int32(K), fwd,
        (bh_ref[0][:, None], bl_ref[0][:, None]),
    )

    # Top stage: x_{K-1} = S_{K-1}⁻¹ y_{K-1}
    yh = xh_ref[K - 1][:, None]
    yl = xl_ref[K - 1][:, None]
    zh, zl = _tri_solve_dd(
        LUh_ref[K - 1], LUl_ref[K - 1], perm_ref[K - 1][None, :],
        yh, yl, w,
    )
    xh_ref[K - 1] = zh[:, 0]
    xl_ref[K - 1] = zl[:, 0]

    # Backward: x_k = S_k⁻¹ y_k − (S_k⁻¹ E_kᵀ) x_{k+1} = z_k − X_k x_{k+1}
    def bwd(i, carry):
        xh_next, xl_next = carry  # (w, 1) solution at stage k+1
        k = np.int32(K - 2) - i
        yh = xh_ref[k][:, None]
        yl = xl_ref[k][:, None]
        zh, zl = _tri_solve_dd(
            LUh_ref[k], LUl_ref[k], perm_ref[k][None, :], yh, yl, w,
        )
        acch, accl = _matvec_T_dd(
            Xh_ref[k], Xl_ref[k], xh_next, xl_next, w, transpose=False
        )
        xkh, xkl = dd.sub2(zh, zl, acch, accl)
        xh_ref[k] = xkh[:, 0]
        xl_ref[k] = xkl[:, 0]
        return xkh, xkl

    jax.lax.fori_loop(np.int32(0), np.int32(K - 1), bwd, (zh, zl))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=())
def pallas_banded_factor(D, E):
    """Factor a block-tridiagonal system (f64 in) with the Pallas dd
    kernel. Returns a PallasBandedFactor."""
    from jax.experimental import pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    K, w, _ = D.shape
    Dh, Dl = dd.from_f64(D)
    if E.shape[0] == K - 1 and K > 1:
        Eh, El = dd.from_f64(E)
    else:
        Eh = jnp.zeros((max(K - 1, 1), w, w), jnp.float32)
        El = jnp.zeros((max(K - 1, 1), w, w), jnp.float32)
    if K == 1:
        Eh = jnp.zeros((1, w, w), jnp.float32)
        El = jnp.zeros((1, w, w), jnp.float32)

    KE = max(K - 1, 1)
    # Pad E so its leading dim matches D's: required for the D->LU /
    # E->X input_output_aliases below (aliased pairs must have
    # identical shapes), and the kernel ignores the pad row.
    if Eh.shape[0] != K:
        Eh = jnp.concatenate(
            [Eh, jnp.zeros((K - Eh.shape[0], w, w), jnp.float32)]
        )
        El = jnp.concatenate(
            [El, jnp.zeros((K - El.shape[0], w, w), jnp.float32)]
        )
    if pallas_is_chunked(K, w):
        return _pallas_factor_chunked(Dh, Dl, Eh, El, K, w)
    out_shapes = (
        jax.ShapeDtypeStruct((K, w, w), jnp.float32),  # LUh (aliases Dh)
        jax.ShapeDtypeStruct((K, w, w), jnp.float32),  # LUl (aliases Dl)
        jax.ShapeDtypeStruct((K, w, w), jnp.float32),  # Xh (aliases Eh)
        jax.ShapeDtypeStruct((K, w, w), jnp.float32),  # Xl (aliases El)
        jax.ShapeDtypeStruct((K, w), jnp.int32),  # perm
        jax.ShapeDtypeStruct((K, w), jnp.float32),  # dh
        jax.ShapeDtypeStruct((K, w), jnp.float32),  # dl
    )
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kern = functools.partial(_factor_kernel, w, K)
    # Trace the kernel with x64 disabled: the kernel body is pure
    # f32/i32, and under jax_enable_x64 stray weak-int64 constants send
    # Mosaic's int conversion helper into infinite recursion.
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            out_shape=out_shapes,
            in_specs=[spec] * 4,
            out_specs=(spec,) * 7,
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            interpret=_interpret(),
        )(Dh, Dl, Eh, El)
    LUh, LUl, Xh, Xl, perm, dh, dl = outs
    return PallasBandedFactor(
        LUh=LUh, LUl=LUl, perm=perm, dh=dh, dl=dl,
        Xh=Xh[: KE], Xl=Xl[: KE],
    )


@jax.jit
def pallas_banded_solve(fac: PallasBandedFactor, b):
    """Solve with a pallas_banded_factor result; b (K, w) f64."""
    from jax.experimental import pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    K, w = b.shape
    bh, bl = dd.from_f64(b)
    if pallas_is_chunked(K, w):
        return _pallas_solve_chunked(fac, bh, bl, K, w)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kern = functools.partial(_solve_kernel, w, K)
    with jax.enable_x64(False):
        xh, xl = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((K, w), jnp.float32),
                jax.ShapeDtypeStruct((K, w), jnp.float32),
            ),
            in_specs=[spec] * 7,
            out_specs=(spec, spec),
            # b is consumed stage-by-stage ahead of the x writes
            input_output_aliases={5: 0, 6: 1},
            interpret=_interpret(),
        )(
            fac.LUh, fac.LUl, fac.Xh, fac.Xl, fac.perm, bh, bl
        )
    return dd.to_f64(xh, xl)


def pallas_pivots(fac: PallasBandedFactor):
    """LDLT pivots of the Schur chain, recombined to f64."""
    return dd.to_f64(fac.dh, fac.dl)


# ---------------------------------------------------------------------------
# Chunked-grid variants: horizons whose factor arrays exceed VMEM
# ---------------------------------------------------------------------------
#
# TPU grid steps execute sequentially on a core and scratch persists
# across them, so the Schur recursion's carry (and the solve's running
# y/x vectors) cross chunk boundaries through (w, w)/(w, 1) scratch while
# Pallas streams the (chunk, w, w) blocks HBM<->VMEM per grid step. The
# cross-chunk D[k+1] read is avoided by carrying T_k = E_k X_k instead
# of S_{k+1}: each chunk opens with S = D_loc[0] - T_scratch.

#: Per-array VMEM budget for the single-shot kernels; beyond this the
#: chunked-grid variants take over. The binding constraint on the v5e is
#: the ~16 MB SCOPED vmem limit for a kernel's operands (measured:
#: a vmapped 2-candidate K=5001 w=4 call was rejected at 78 MB scoped),
#: so a single-shot factorization's four arrays must stay well under it.
_SINGLE_SHOT_MAX_BYTES = 3_500_000

#: Stages per chunk in the chunked-grid kernels: Pallas double-buffers
#: every blocked operand (8 per kernel), so the per-chunk footprint is
#: ~16 x (C·w/8) x 4 KB and must stay under the ~16 MB scoped limit.
_CHUNK = 512


def _chunk_for(w: int) -> int:
    """Stages per grid step for the chunked kernels, sized so the call's
    scoped-VMEM footprint stays under the ~16 MB limit: the pipeline
    holds ~17 (C, w, w) f32 blocks (4 in + 7 out + double-buffering),
    each C·w sublanes × 128 lanes, so C·w ≈ 1408 keeps the footprint
    ≈ 12 MB at any width. The floor must stay small: a 64-stage floor
    overflowed scoped VMEM by 4.1 MB at w = 37 (the width of a
    feasibility-restoration system over a w = 13 parent — cart-pole
    N = 5000's restoration excursion was the first to hit it)."""
    return max(8, min(_CHUNK, (1408 // max(w, 1)) // 8 * 8))


def pallas_is_chunked(K: int, w: int) -> bool:
    tile_rows = -(-(K * w) // 8)
    return tile_rows * 8 * 128 * 4 > _SINGLE_SHOT_MAX_BYTES


def _factor_kernel_chunked(w, C, nc, Dh_ref, Dl_ref, Eh_ref, El_ref,
                           LUh_ref, LUl_ref, Xh_ref, Xl_ref, perm_ref,
                           dh_ref, dl_ref, Th_s, Tl_s):
    from jax.experimental import pallas as pl  # noqa: PLC0415

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        Th_s[:] = jnp.zeros((w, w), jnp.float32)
        Tl_s[:] = jnp.zeros((w, w), jnp.float32)

    Sh0, Sl0 = dd.sub2(Dh_ref[0], Dl_ref[0], Th_s[:], Tl_s[:])

    def stage(j, carry):
        Sh, Sl = carry
        j1 = jnp.minimum(j + 1, np.int32(C - 1))
        Eh = Eh_ref[j]
        El = El_ref[j]
        Dh1 = Dh_ref[j1]
        Dl1 = Dl_ref[j1]

        dh, dl = _ldlt_pivots_dd(Sh, Sl, w)
        dh_ref[j] = dh[0]
        dl_ref[j] = dl[0]
        LUh, LUl, perm = _lu_factor_dd(Sh, Sl, w)
        LUh_ref[j] = LUh
        LUl_ref[j] = LUl
        perm_ref[j] = perm[0]
        Xh, Xl = _tri_solve_dd(LUh, LUl, perm, Eh.T, El.T, w)
        Xh_ref[j] = Xh
        Xl_ref[j] = Xl
        Th, Tl = _matmul_dd(Eh, El, Xh, Xl, w)

        @pl.when(j >= C - 1)
        def _():
            Th_s[:] = Th
            Tl_s[:] = Tl

        Sh_next, Sl_next = dd.sub2(Dh1, Dl1, Th, Tl)
        keep = j >= C - 1
        Sh_next = jnp.where(keep, Sh, Sh_next)
        Sl_next = jnp.where(keep, Sl, Sl_next)
        return Sh_next, Sl_next

    jax.lax.fori_loop(np.int32(0), np.int32(C), stage, (Sh0, Sl0))


def _solve_fwd_kernel_chunked(w, C, nc, Xh_ref, Xl_ref, bh_ref, bl_ref,
                              yh_ref, yl_ref, ch_s, cl_s):
    from jax.experimental import pallas as pl  # noqa: PLC0415

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ch_s[:] = jnp.zeros((w, 1), jnp.float32)
        cl_s[:] = jnp.zeros((w, 1), jnp.float32)

    def fwd(j, carry):
        yh, yl = carry  # y at global stage iC+j
        yh_ref[j] = yh[:, 0]
        yl_ref[j] = yl[:, 0]
        th, tl = _matvec_T_dd(
            Xh_ref[j], Xl_ref[j], yh, yl, w, transpose=True
        )
        j1 = jnp.minimum(j + 1, np.int32(C - 1))
        bh1 = bh_ref[j1][:, None]
        bl1 = bl_ref[j1][:, None]
        yh_next, yl_next = dd.sub2(bh1, bl1, th, tl)

        @pl.when(j >= C - 1)
        def _():
            # carry -t for the next chunk: y = b_loc[0] - t
            ch_s[:] = th
            cl_s[:] = tl

        return yh_next, yl_next

    y0h, y0l = dd.sub2(
        bh_ref[0][:, None], bl_ref[0][:, None], ch_s[:], cl_s[:]
    )
    jax.lax.fori_loop(np.int32(0), np.int32(C), fwd, (y0h, y0l))


def _solve_bwd_kernel_chunked(w, C, nc, LUh_ref, LUl_ref, Xh_ref, Xl_ref,
                              perm_ref, yh_ref, yl_ref, xh_ref, xl_ref,
                              ch_s, cl_s):
    from jax.experimental import pallas as pl  # noqa: PLC0415

    i = pl.program_id(0)  # 0 = LAST chunk (reversed index_map)

    @pl.when(i == 0)
    def _():
        # x_{K} carry is irrelevant for the top stage because the padded
        # E row makes X[K-1] = 0; zeros keep it well-defined.
        ch_s[:] = jnp.zeros((w, 1), jnp.float32)
        cl_s[:] = jnp.zeros((w, 1), jnp.float32)

    def bwd(jj, carry):
        xh_next, xl_next = carry  # x at global stage iC+j+1
        j = np.int32(C - 1) - jj
        yh = yh_ref[j][:, None]
        yl = yl_ref[j][:, None]
        zh, zl = _tri_solve_dd(
            LUh_ref[j], LUl_ref[j], perm_ref[j][None, :], yh, yl, w
        )
        th, tl = _matvec_T_dd(
            Xh_ref[j], Xl_ref[j], xh_next, xl_next, w, transpose=False
        )
        xkh, xkl = dd.sub2(zh, zl, th, tl)
        xh_ref[j] = xkh[:, 0]
        xl_ref[j] = xkl[:, 0]
        return xkh, xkl

    xlast_h, xlast_l = jax.lax.fori_loop(
        np.int32(0), np.int32(C), bwd, (ch_s[:], cl_s[:])
    )
    ch_s[:] = xlast_h
    cl_s[:] = xlast_l


def _pad_stages(Dh, Dl, Eh, El, K, w, Kp):
    pad = Kp - K
    if pad == 0:
        return Dh, Dl, Eh, El
    eye = jnp.broadcast_to(jnp.eye(w, dtype=jnp.float32), (pad, w, w))
    z = jnp.zeros((pad, w, w), jnp.float32)
    Dh = jnp.concatenate([Dh, eye])
    Dl = jnp.concatenate([Dl, z])
    # E[K-1] (the coupling INTO the first padded stage) must be zero so
    # the padding decouples; callers already pass E_full[K-1] = 0.
    Eh = jnp.concatenate([Eh, z])
    El = jnp.concatenate([El, z])
    return Dh, Dl, Eh, El


def _pallas_factor_chunked(Dh, Dl, Eh, El, K, w):
    from jax.experimental import pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    C = _chunk_for(w)
    nc = -(-K // C)
    Kp = nc * C
    Dh, Dl, Eh, El = _pad_stages(Dh, Dl, Eh, El, K, w, Kp)

    blk = lambda: pl.BlockSpec(  # noqa: E731
        (C, w, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec = lambda: pl.BlockSpec(  # noqa: E731
        (C, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shapes = (
        jax.ShapeDtypeStruct((Kp, w, w), jnp.float32),  # LUh (aliases Dh)
        jax.ShapeDtypeStruct((Kp, w, w), jnp.float32),  # LUl (aliases Dl)
        jax.ShapeDtypeStruct((Kp, w, w), jnp.float32),  # Xh (aliases Eh)
        jax.ShapeDtypeStruct((Kp, w, w), jnp.float32),  # Xl (aliases El)
        jax.ShapeDtypeStruct((Kp, w), jnp.int32),
        jax.ShapeDtypeStruct((Kp, w), jnp.float32),
        jax.ShapeDtypeStruct((Kp, w), jnp.float32),
    )
    kern = functools.partial(_factor_kernel_chunked, w, C, nc)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid=(nc,),
            out_shape=out_shapes,
            in_specs=[blk(), blk(), blk(), blk()],
            out_specs=(blk(), blk(), blk(), blk(), vec(), vec(), vec()),
            scratch_shapes=[
                pltpu.VMEM((w, w), jnp.float32),
                pltpu.VMEM((w, w), jnp.float32),
            ],
            input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
            interpret=_interpret(),
        )(Dh, Dl, Eh, El)
    LUh, LUl, Xh, Xl, perm, dh, dl = outs
    # Pivots report only the REAL stages (identity padding would add a
    # spurious +w each); LU/X stay padded for the chunked solve.
    return PallasBandedFactor(
        LUh=LUh, LUl=LUl, perm=perm, dh=dh[:K], dl=dl[:K], Xh=Xh, Xl=Xl
    )


def _pallas_solve_chunked(fac: PallasBandedFactor, bh, bl, K, w):
    from jax.experimental import pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    C = _chunk_for(w)
    Kp = fac.LUh.shape[0]
    nc = Kp // C
    pad = Kp - K
    if pad:
        bh = jnp.concatenate([bh, jnp.zeros((pad, w), jnp.float32)])
        bl = jnp.concatenate([bl, jnp.zeros((pad, w), jnp.float32)])

    blk_f = lambda: pl.BlockSpec(  # noqa: E731
        (C, w, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_f = lambda: pl.BlockSpec(  # noqa: E731
        (C, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    blk_r = lambda: pl.BlockSpec(  # noqa: E731
        (C, w, w), lambda i: (nc - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_r = lambda: pl.BlockSpec(  # noqa: E731
        (C, w), lambda i: (nc - 1 - i, 0), memory_space=pltpu.VMEM
    )

    with jax.enable_x64(False):
        yh, yl = pl.pallas_call(
            functools.partial(_solve_fwd_kernel_chunked, w, C, nc),
            grid=(nc,),
            out_shape=(
                jax.ShapeDtypeStruct((Kp, w), jnp.float32),
                jax.ShapeDtypeStruct((Kp, w), jnp.float32),
            ),
            in_specs=[blk_f(), blk_f(), vec_f(), vec_f()],
            out_specs=(vec_f(), vec_f()),
            scratch_shapes=[
                pltpu.VMEM((w, 1), jnp.float32),
                pltpu.VMEM((w, 1), jnp.float32),
            ],
            input_output_aliases={2: 0, 3: 1},
            interpret=_interpret(),
        )(fac.Xh, fac.Xl, bh, bl)
        xh, xl = pl.pallas_call(
            functools.partial(_solve_bwd_kernel_chunked, w, C, nc),
            grid=(nc,),
            out_shape=(
                jax.ShapeDtypeStruct((Kp, w), jnp.float32),
                jax.ShapeDtypeStruct((Kp, w), jnp.float32),
            ),
            in_specs=[
                blk_r(), blk_r(), blk_r(), blk_r(), vec_r(), vec_r(),
                vec_r(),
            ],
            out_specs=(vec_r(), vec_r()),
            scratch_shapes=[
                pltpu.VMEM((w, 1), jnp.float32),
                pltpu.VMEM((w, 1), jnp.float32),
            ],
            input_output_aliases={5: 0, 6: 1},
            interpret=_interpret(),
        )(
            fac.LUh, fac.LUl, fac.Xh, fac.Xl, fac.perm, yh, yl
        )
    return dd.to_f64(xh[:K], xl[:K])
