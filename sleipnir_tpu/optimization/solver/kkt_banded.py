"""Block-tridiagonal (banded) KKT backend for direct-transcription OCPs.

The TPU-native replacement for sparse LDLT on trajectory problems
(SURVEY.md §7 step 3; the reference instead relies on Eigen SimplicialLDLT
with AMD ordering to keep the banded factorization near-linear in the
horizon, reference solver/util/sparse_regularized_ldlt.hpp:64-75 and
SURVEY.md §5 "Long-context").

Variables are ordered by stage zₖ = (xₖ, uₖ); equality-constraint rows are
assigned to the stage they're anchored at, padded to a uniform count per
stage (padded rows carry a fixed −1 pivot so the expected inertia stays
exact). The reduced KKT matrix is then block tridiagonal and factors with
ops.block_tridiag in O(N·w³) time and O(N·w²) memory.

Derivatives are never materialized densely. Banded blocks are extracted
with *colored* AD probes:
  - Aₑ: 2·m JVPs of cₑ (adjacent stages alias-free under mod-2 coloring),
  - Lagrangian Hessian: 3·m HVPs (mod-3 coloring covers the k−1/k/k+1
    row blocks unambiguously),
  - Aᵢ: m JVPs (each inequality row touches a single stage).
Probes batch under vmap on CPU and run sequentially under lax.map on
accelerators (see _probe_map), so the per-iteration derivative cost is
O(stage-width) evaluations of the constraint program instead of O(n).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sleipnir_tpu.ops.block_tridiag import (
    bcr_factor,
    bcr_inertia,
    bcr_solve,
    block_tridiag_factor,
    block_tridiag_factor_part,
    block_tridiag_factor_part_inv,
    block_tridiag_inertia,
    block_tridiag_solve,
    block_tridiag_solve_part,
    block_tridiag_solve_part_inv,
    inv_part_inertia,
    inv_part_pivots,
    part_inertia,
    part_pivots,
)
from sleipnir_tpu.optimization.solver.kkt_backend import (
    RegLoopResult,
    regularization_loop,
)


def _probe_map(fn, probes):
    """Evaluate a batch of tangent probes: vmap on CPU, sequential
    lax.map on accelerators.

    vmapping the probe batch on TPU lets XLA route the batched tangent
    arithmetic through the MXU's multi-pass-f32 f64 emulation. Measured at
    cart-pole N=100's converged duals (TPU v5e, state captured at the μ
    floor): vmapped probes put ~6e-8 absolute error into the A_e blocks
    and ~7e-9 relative error into the Hessian blocks, while a single
    (unbatched) JVP/HVP of the same program is bit-identical to CPU f64.
    That Jacobian noise capped the attainable KKT error at ~3e-5 — above
    the 1e-8 tolerance — and stalled the solver at the μ floor until its
    δ/γ regularization loop detonated (BENCH_r03 FACTORIZATION_FAILED at
    iteration 254; see docs/tpu_numerics.md). Sequential lax.map keeps
    every probe on the exact scalar path at identical wall time on the
    TPU (26.5 ms vs 26.7 ms per derivative batch — latency-bound)."""
    if jax.default_backend() == "cpu":
        return jax.vmap(fn)(probes)
    from jax import lax  # noqa: PLC0415

    return lax.map(fn, probes)


def _equilibrate(D, E, rounds: int = 2):
    """Symmetric Ruiz equilibration of a block-tridiagonal matrix.

    Returns (D', E', s) with M' = S M S, S = blockdiag(diag(s_k)). The
    scaling is a congruence, so the inertia is exactly preserved
    (Sylvester), while the row/column magnitudes are compressed to O(1).

    Why: mid-solve KKT systems mix Lagrangian-Hessian rows of magnitude
    ~|y|·curvature (observed ~1e9 on cart-pole N=100 while the duals peak
    near 1e8) with equality-Schur pivots of magnitude ~|A|²/|H| (~1e-7).
    Unscaled, those small pivots sit below the factorization's absolute
    noise floor (~|H|·u_eff; u_eff ≈ 1e-14 under TPU f64 emulation), so
    their SIGNS are noise and the δ/γ inertia-correction loop escalates
    to overflow (BENCH FACTORIZATION_FAILED mid-phase). Equilibrated,
    pivots are O(1) against noise ~1e-13 and both the inertia count and
    the reference's small-pivot gate (sparse_regularized_ldlt.hpp:82-83,
    |pivot| < 1e-4) become scale-meaningful."""
    K = D.shape[0]
    s = jnp.ones((K, D.shape[1]), D.dtype)
    for _ in range(rounds):
        rn = jnp.max(jnp.abs(D), axis=2)  # (K, w)
        if E.shape[0] > 0:
            # block row k+1 contains E_k; block row k contains E_kᵀ
            rn = rn.at[1:].max(jnp.max(jnp.abs(E), axis=2))
            rn = rn.at[:-1].max(jnp.max(jnp.abs(E), axis=1))
        f = jnp.where(rn > 0.0, 1.0 / jnp.sqrt(rn), 1.0)
        D = D * f[:, :, None] * f[:, None, :]
        if E.shape[0] > 0:
            E = E * f[1:, :, None] * f[:-1, None, :]
        s = s * f
    return D, E, s


_EMPTY_BORDER = np.zeros(0, dtype=np.int64)


class StageStructure(NamedTuple):
    """Static stage metadata (host-side numpy)."""

    num_stages: int  # K
    stage_width: int  # m variables per stage
    var_perm: np.ndarray  # (K·m,) staged order -> flat index
    ce_stage: np.ndarray  # (me,) stage of each equality row
    ce_slot: np.ndarray  # (me,) slot within the stage's padded block
    eq_pad: int  # p: max equality rows per stage
    ci_stage: np.ndarray  # (mi,)
    ci_slot: np.ndarray  # (mi,)
    ineq_pad: int  # q: max inequality rows per stage
    #: Flat indices of BORDER decision variables: columns that couple to
    #: every stage (e.g. the shared dt of a TimestepMethod.VARIABLE_SINGLE
    #: minimum-time OCP, reference ocp.hpp:129-134). The KKT system is
    #: then band + low-rank border (arrowhead) and factors via a Schur
    #: complement on the border — still O(N·w³). Inequality rows touching
    #: ONLY border variables are assigned stage 0 with an all-zero staged
    #: row; their Jacobian entries live in the dense border column.
    border: np.ndarray = _EMPTY_BORDER


class BandedDerivs(NamedTuple):
    """Per-stage scaled derivative blocks (+ dense border columns)."""

    Hd: jnp.ndarray  # (K, m, m) stage-diagonal Lagrangian Hessian
    Hc: jnp.ndarray  # (K-1, m, m) coupling H[k+1, k]
    Aloc: jnp.ndarray  # (K, p, m) eq rows of stage k wrt z_k
    Anext: jnp.ndarray  # (K, p, m) eq rows of stage k wrt z_{k+1} (last 0)
    Ailoc: jnp.ndarray  # (K, q, m) ineq rows of stage k wrt z_k
    Hb: jnp.ndarray  # (nb, K, m) Hessian border columns against staged vars
    Hbb: jnp.ndarray  # (nb, nb) border-border Hessian block
    Aeb: jnp.ndarray  # (me, nb) eq-row border entries
    Aib: jnp.ndarray  # (mi, nb) ineq-row border entries


class BandedFactor(NamedTuple):
    fac: object  # BlockTridiagFactor (sequential) or BCRFactor (parallel)
    #: Ruiz equilibration scale (K, w): the factor is of S M S, so solves
    #: are x = S · solve(fac, S · b).
    s: jnp.ndarray
    #: Border (arrowhead) data: assembled border columns in staged layout
    #: (nb, K, w), T⁻¹·col (nb, K, w), the δ-free border block e₀ (nb, nb),
    #: and the LDLᵀ of the border Schur complement e − colᵀT⁻¹col.
    col: jnp.ndarray
    Xcols: jnp.ndarray
    e0: jnp.ndarray
    Sb_L: jnp.ndarray
    Sb_d: jnp.ndarray
    delta: jnp.ndarray
    gamma: jnp.ndarray
    ok: jnp.ndarray


def _use_pallas() -> bool:
    """Pallas double-float factor/solve kernels (ops/pallas_banded.py).

    The whole block-Thomas factorization runs inside ONE Pallas program
    in 2xf32 double-float arithmetic (~2^-46 effective precision, the
    same class as XLA's f64 emulation), sidestepping the ~0.25-0.35 ms
    per-sequential-trip device overhead that floors the XLA scan at
    ~K/3 ms. Backward-stable (pivoted LU per Schur block), exact inertia
    (dd LDLT pivots). SLEIPNIR_TPU_PALLAS=0/1 overrides; default ON for
    TPU."""
    import os  # noqa: PLC0415

    override = os.environ.get("SLEIPNIR_TPU_PALLAS")
    if override is not None:
        return override != "0"
    return jax.default_backend() == "tpu"


def _use_inv() -> bool:
    """Explicit-inverse (substitution-free) factorization path.

    Default OFF: explicit inverses are only forward-stable, and the
    Schur-complement chain of a mid-solve IPM KKT system passes through
    blocks with cond ~1e9-1e10 (measured on cart-pole N=100 at the
    starting state, round 5) — a forward-error block inverse corrupts
    every downstream Schur complement multiplicatively (observed residual
    1e15 vs the pivoted-LU chain's 0.1, which iterative refinement then
    polishes to 1e-13; backward stability is what propagates through
    block elimination). The path remains available for well-conditioned
    systems (SLEIPNIR_TPU_INV=1) and for the time-axis dryrun kernels."""
    import os  # noqa: PLC0415

    override = os.environ.get("SLEIPNIR_TPU_INV")
    if override is not None:
        return override != "0"
    return False


def _use_bcr(num_stages: int) -> bool:
    """Parallel block cyclic reduction is the depth-log alternative to the
    sequential stage scan for accelerators. It is currently OPT-IN
    (SLEIPNIR_TPU_BCR=1): BCR unrolls log2(K) levels of distinct-shape
    batched code and the resulting program exceeded a 1-hour XLA:TPU
    compile at cart-pole N=100 on the available toolchain, while the scan
    path compiles O(1) in the horizon and is measured end-to-end on
    hardware. On CPU the scan's lower flop count wins at every size
    measured regardless."""
    import os  # noqa: PLC0415

    override = os.environ.get("SLEIPNIR_TPU_BCR")
    if override is not None:
        return override != "0"
    return False


class BandedBackend:
    """KKT backend exploiting OCP stage structure."""

    def __init__(
        self,
        structure: StageStructure,
        f_raw: Callable,  # f(x, params) -> scalar (unscaled)
        ce_raw: Callable,  # c_e(x, params) -> (me,)
        ci_raw: Callable,  # c_i(x, params) -> (mi,)
        n: int,
        me: int,
        mi: int,
        dtype,
        mesh=None,
        mesh_axis: str = "t",
    ) -> None:
        st = structure
        self.structure = st
        self.n = n
        self.me = me
        self.mi = mi
        self.dtype = dtype
        self.f_raw = f_raw
        self.ce_raw = ce_raw
        self.ci_raw = ci_raw
        #: Optional jax.sharding.Mesh: shard the stage (time) axis of the
        #: KKT factorization/solves over `mesh[mesh_axis]` (SURVEY §7
        #: step 5). The factor is the SPIKE split in parallel/time_axis —
        #: per-device explicit-inverse interior elimination, one
        #: all_gather + ppermute for the interface system — and exposes
        #: pivots, so the same δ/γ inertia-correction ladder drives it.
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.use_pallas = mesh is None and _use_pallas()
        self.use_bcr = (
            mesh is None
            and not self.use_pallas
            and _use_bcr(structure.num_stages)
        )
        self.use_inv = (
            not self.use_pallas and not self.use_bcr and _use_inv()
        )
        # On accelerators, the partitioned (SPIKE/Schur) factorization
        # replaces the sequential block-Thomas scan at long horizons:
        # sequential depth ~2·sqrt(K) of BATCHED steps instead of K.
        # Measured on v5e at w=13: the scan costs ~0.5 ms per stage
        # (~54 ms/attempt at K=101) while a partitioned batched step costs
        # ~8 ms (substitution-dominated), so the crossover sits near
        # K≈256; below it the scan wins, above it the partitioned depth
        # advantage dominates (K=5000: ~140 batched steps vs 5000
        # sequential ones). CPU keeps the scan (LAPACK per-block is fast;
        # lower flop count wins there at every size measured).
        self.use_partitioned = (
            not self.use_bcr
            and jax.default_backend() != "cpu"
            and structure.num_stages >= 256
        )

        K, m, p, q = st.num_stages, st.stage_width, st.eq_pad, st.ineq_pad
        nb = int(np.asarray(st.border).shape[0])
        assert n == K * m + nb, (n, K, m, nb)
        self.K, self.m, self.p, self.q, self.nb = K, m, p, q, nb
        self.w = m + p
        self._border_pos = jnp.asarray(
            np.asarray(st.border, dtype=np.int64).reshape(nb)
        )
        probes_b = np.zeros((nb, n))
        probes_b[np.arange(nb), np.asarray(st.border, dtype=np.int64)] = 1.0
        self._probes_b = jnp.asarray(probes_b, dtype)

        # Probe matrices (static constants)
        staged = st.var_perm.reshape(K, m)
        probes_e = np.zeros((2 * m, n))
        for c in range(2):
            for j in range(m):
                probes_e[c * m + j, staged[np.arange(K) % 2 == c, j]] = 1.0
        self._probes_e = jnp.asarray(probes_e, dtype)

        probes_h = np.zeros((3 * m, n))
        for c in range(3):
            for j in range(m):
                probes_h[c * m + j, staged[np.arange(K) % 3 == c, j]] = 1.0
        self._probes_h = jnp.asarray(probes_h, dtype)

        probes_i = np.zeros((m, n))
        for j in range(m):
            probes_i[j, staged[:, j]] = 1.0
        self._probes_i = jnp.asarray(probes_i, dtype)

        # Gather/scatter index constants
        self._var_perm = jnp.asarray(st.var_perm)
        self._kmod2 = jnp.asarray(np.arange(K) % 2)
        self._kmod3 = jnp.asarray(np.arange(K) % 3)
        self._ce_stage = jnp.asarray(st.ce_stage)
        self._ce_slot = jnp.asarray(st.ce_slot)
        self._ci_stage = jnp.asarray(st.ci_stage)
        self._ci_slot = jnp.asarray(st.ci_slot)
        # Real (non-pad) equality slots per stage
        eq_count = np.zeros(K, dtype=np.int64)
        for s_ in st.ce_stage:
            eq_count[s_] += 1
        slot_real = (
            np.arange(p)[None, :] < eq_count[:, None]
        )  # (K, p) bool
        self._eq_slot_real = jnp.asarray(slot_real)

    # -- helpers -----------------------------------------------------------

    def _stage_vec(self, v):
        """Flat (n,) -> staged (K, m)."""
        return v[self._var_perm].reshape(self.K, self.m)

    def _unstage_vec(self, staged):
        """Staged (K, m) -> flat (n,)."""
        out = jnp.zeros((self.n,), staged.dtype)
        return out.at[self._var_perm].set(staged.reshape(-1))

    # -- derivative evaluation --------------------------------------------

    def eval_derivs(self, F, x, y, z) -> BandedDerivs:
        params = F.params
        sc = F.scaling
        K, m, p, q = self.K, self.m, self.p, self.q

        # Scaled Lagrangian (constraint rows row-scaled like the reference's
        # callbacks, problem.hpp:618-660)
        def lag(xv):
            out = sc.f * self.f_raw(xv, params)
            if self.me > 0:
                out = out - (sc.c_e * y) @ self.ce_raw(xv, params)
            if self.mi > 0:
                out = out - (sc.c_i * z) @ self.ci_raw(xv, params)
            return out

        grad = jax.grad(lag)

        def hvp(v):
            return jax.jvp(grad, (x,), (v,))[1]

        # Compiled problem functions can carry float64 constants; keep the
        # banded blocks in the backend dtype.
        Hv = _probe_map(hvp, self._probes_h).astype(self.dtype)  # (3m, n)
        HvS = jax.vmap(self._stage_vec)(Hv).reshape(3, m, K, m)
        # Hd[k][i, j] = HvS[k%3, j, k, i]
        k_idx = jnp.arange(K)
        Hd = HvS[self._kmod3, :, k_idx, :]  # (K, j, i)
        Hd = jnp.swapaxes(Hd, 1, 2)  # (K, i, j)
        # Hc[k][i, j] = H[(k+1, i), (k, j)] = HvS[k%3, j, k+1, i]
        if K > 1:
            Hc = HvS[self._kmod3[:-1], :, k_idx[:-1] + 1, :]
            Hc = jnp.swapaxes(Hc, 1, 2)
        else:
            Hc = jnp.zeros((0, m, m), self.dtype)

        # A_e blocks via mod-2 colored JVPs
        if self.me > 0:
            def jvp_e(v):
                return jax.jvp(
                    lambda xv: sc.c_e * self.ce_raw(xv, params), (x,), (v,)
                )[1]

            Ue = _probe_map(jvp_e, self._probes_e).astype(self.dtype)
            r_idx = jnp.arange(self.me)
            j_idx = jnp.arange(m)
            # local columns: probe (s%2)*m + j
            loc_p = (self._ce_stage % 2)[:, None] * m + j_idx[None, :]
            rows_loc = Ue[loc_p, r_idx[:, None]]  # (me, m)
            next_p = ((self._ce_stage + 1) % 2)[:, None] * m + j_idx[None, :]
            rows_next = Ue[next_p, r_idx[:, None]]
            Aloc = jnp.zeros((K, p, m), self.dtype).at[
                self._ce_stage, self._ce_slot
            ].set(rows_loc)
            Anext = jnp.zeros((K, p, m), self.dtype).at[
                self._ce_stage, self._ce_slot
            ].set(rows_next)
        else:
            Aloc = jnp.zeros((K, p, m), self.dtype)
            Anext = jnp.zeros((K, p, m), self.dtype)

        # A_i blocks (single-stage rows)
        if self.mi > 0:
            def jvp_i(v):
                return jax.jvp(
                    lambda xv: sc.c_i * self.ci_raw(xv, params), (x,), (v,)
                )[1]

            Ui = _probe_map(jvp_i, self._probes_i).astype(self.dtype)
            rows_i = Ui.T  # (mi, m)
            Ailoc = jnp.zeros((K, q, m), self.dtype).at[
                self._ci_stage, self._ci_slot
            ].set(rows_i)
        else:
            Ailoc = jnp.zeros((K, q, m), self.dtype)

        # Border (arrowhead) columns: one exact HVP/JVP per border variable
        nb = self.nb
        if nb > 0:
            Hvb = _probe_map(hvp, self._probes_b).astype(self.dtype)  # (nb, n)
            Hb = jax.vmap(self._stage_vec)(Hvb)  # (nb, K, m)
            Hbb = Hvb[:, self._border_pos]  # (nb, nb)
            if self.me > 0:
                Aeb = jnp.swapaxes(
                    _probe_map(jvp_e, self._probes_b).astype(self.dtype), 0, 1
                )  # (me, nb)
            else:
                Aeb = jnp.zeros((0, nb), self.dtype)
            if self.mi > 0:
                Aib = jnp.swapaxes(
                    _probe_map(jvp_i, self._probes_b).astype(self.dtype), 0, 1
                )  # (mi, nb)
            else:
                Aib = jnp.zeros((0, nb), self.dtype)
        else:
            Hb = jnp.zeros((0, K, m), self.dtype)
            Hbb = jnp.zeros((0, 0), self.dtype)
            Aeb = jnp.zeros((self.me, 0), self.dtype)
            Aib = jnp.zeros((self.mi, 0), self.dtype)

        return BandedDerivs(
            Hd=Hd, Hc=Hc, Aloc=Aloc, Anext=Anext, Ailoc=Ailoc,
            Hb=Hb, Hbb=Hbb, Aeb=Aeb, Aib=Aib,
        )

    def setup_rows(self, x0, params):
        """Per-row Jacobian data at x0 for setup (scaling + bound
        detection), via the colored JVP probes — O(N·w) memory, never a
        dense (m, n) matrix (reference problem_scaling.hpp:58-110 computes
        row norms from sparse triplets the same way).

        Returns numpy arrays (unscaled):
          ce_rows_loc (me, m), ce_rows_next (me, m): equality row entries
            wrt the anchor stage's and next stage's variables;
          ci_rows (mi, m): inequality row entries wrt the row's stage;
          ci_cols (mi, m): global column index of each ci_rows entry.
        """
        x = jnp.asarray(x0, self.dtype)
        params = jnp.asarray(params, self.dtype)
        m = self.m
        staged_cols = np.asarray(self.structure.var_perm).reshape(
            self.K, m
        )

        if self.me > 0:
            def jvp_e(v):
                return jax.jvp(
                    lambda xv: self.ce_raw(xv, params), (x,), (v,)
                )[1]

            Ue = _probe_map(jvp_e, self._probes_e).astype(self.dtype)
            r_idx = jnp.arange(self.me)
            j_idx = jnp.arange(m)
            loc_p = (self._ce_stage % 2)[:, None] * m + j_idx[None, :]
            ce_rows_loc = np.asarray(Ue[loc_p, r_idx[:, None]])
            next_p = ((self._ce_stage + 1) % 2)[:, None] * m + j_idx[None, :]
            ce_rows_next = np.asarray(Ue[next_p, r_idx[:, None]])
            if self.nb > 0:
                # Append border-column entries so row ∞-norms (scaling)
                # see the full row.
                Ueb = np.asarray(
                    _probe_map(jvp_e, self._probes_b).astype(self.dtype)
                ).T  # (me, nb)
                ce_rows_loc = np.concatenate([ce_rows_loc, Ueb], axis=1)
        else:
            ce_rows_loc = np.zeros((0, m))
            ce_rows_next = np.zeros((0, m))

        if self.mi > 0:
            def jvp_i(v):
                return jax.jvp(
                    lambda xv: self.ci_raw(xv, params), (x,), (v,)
                )[1]

            Ui = _probe_map(jvp_i, self._probes_i).astype(self.dtype)
            ci_rows = np.asarray(Ui.T)
            ci_cols = staged_cols[np.asarray(self.structure.ci_stage)]
            if self.nb > 0:
                Uib = np.asarray(
                    _probe_map(jvp_i, self._probes_b).astype(self.dtype)
                ).T  # (mi, nb)
                ci_rows = np.concatenate([ci_rows, Uib], axis=1)
                border_cols = np.broadcast_to(
                    np.asarray(self._border_pos)[None, :],
                    (self.mi, self.nb),
                )
                ci_cols = np.concatenate([ci_cols, border_cols], axis=1)
        else:
            ci_rows = np.zeros((0, m))
            ci_cols = np.zeros((0, m), dtype=np.int64)

        return ce_rows_loc, ce_rows_next, ci_rows, ci_cols

    def all_finite(self, d: BandedDerivs):
        return (
            jnp.all(jnp.isfinite(d.Hd))
            & jnp.all(jnp.isfinite(d.Hc))
            & jnp.all(jnp.isfinite(d.Aloc))
            & jnp.all(jnp.isfinite(d.Anext))
            & jnp.all(jnp.isfinite(d.Ailoc))
            & jnp.all(jnp.isfinite(d.Hb))
            & jnp.all(jnp.isfinite(d.Hbb))
            & jnp.all(jnp.isfinite(d.Aeb))
            & jnp.all(jnp.isfinite(d.Aib))
        )

    # -- matvecs -----------------------------------------------------------

    def _stage_eq(self, v):
        """(me,) -> (K, p) padded per-stage layout."""
        out = jnp.zeros((self.K, self.p), v.dtype)
        return out.at[self._ce_stage, self._ce_slot].set(v)

    def _stage_ineq(self, v):
        out = jnp.zeros((self.K, self.q), v.dtype)
        return out.at[self._ci_stage, self._ci_slot].set(v)

    def AeT(self, d: BandedDerivs, v):
        if self.me == 0:
            return jnp.zeros((self.n,), self.dtype)
        vs = self._stage_eq(v)  # (K, p)
        t1 = jnp.einsum("kpm,kp->km", d.Aloc, vs)
        t2 = jnp.einsum("kpm,kp->km", d.Anext, vs)
        out = t1.at[1:].add(t2[:-1])
        res = self._unstage_vec(out)
        if self.nb > 0:
            res = res.at[self._border_pos].add(d.Aeb.T @ v)
        return res

    def Ae(self, d: BandedDerivs, u):
        us = self._stage_vec(u)  # (K, m)
        u_next = jnp.concatenate(
            [us[1:], jnp.zeros((1, self.m), us.dtype)], axis=0
        )
        r = jnp.einsum("kpm,km->kp", d.Aloc, us) + jnp.einsum(
            "kpm,km->kp", d.Anext, u_next
        )
        out = r[self._ce_stage, self._ce_slot]
        if self.nb > 0:
            out = out + d.Aeb @ u[self._border_pos]
        return out

    def AiT(self, d: BandedDerivs, v):
        if self.mi == 0:
            return jnp.zeros((self.n,), self.dtype)
        vs = self._stage_ineq(v)
        out = jnp.einsum("kqm,kq->km", d.Ailoc, vs)
        res = self._unstage_vec(out)
        if self.nb > 0:
            res = res.at[self._border_pos].add(d.Aib.T @ v)
        return res

    def Ai(self, d: BandedDerivs, u):
        us = self._stage_vec(u)
        r = jnp.einsum("kqm,km->kq", d.Ailoc, us)
        out = r[self._ci_stage, self._ci_slot]
        if self.nb > 0:
            out = out + d.Aib @ u[self._border_pos]
        return out

    # -- factorization -----------------------------------------------------

    def assemble_staged(self, d: BandedDerivs, sigma, delta, gamma):
        """Assemble the staged KKT blocks (D (K, w, w), E (K-1, w, w)) for
        a given regularization — the matrix the factorization works on.
        Used by the multi-device time-axis dryrun to drive the sharded
        factorization on a real system."""
        K, m, w = self.K, self.m, self.w
        if self.mi > 0:
            sig_st = self._stage_ineq(sigma)
            AiTSAi = jnp.einsum(
                "kqm,kq,kqn->kmn", d.Ailoc, sig_st, d.Ailoc
            )
        else:
            AiTSAi = jnp.zeros((K, m, m), self.dtype)
        D = jnp.zeros((K, w, w), self.dtype)
        D = D.at[:, :m, :m].set(
            d.Hd + AiTSAi + delta * jnp.eye(m, dtype=self.dtype)[None]
        )
        D = D.at[:, :m, m:].set(jnp.swapaxes(d.Aloc, 1, 2))
        D = D.at[:, m:, :m].set(d.Aloc)
        idx = jnp.arange(m, w)
        D = D.at[:, idx, idx].set(
            jnp.where(self._eq_slot_real, -gamma, -1.0)
        )
        E = jnp.zeros((max(K - 1, 0), w, w), self.dtype)
        if K > 1:
            E = E.at[:, :m, :m].set(d.Hc)
            E = E.at[:, :m, m:].set(jnp.swapaxes(d.Anext[:-1], 1, 2))
        return D, E

    def _max_ladder(self) -> int | None:
        """VMEM-aware cap on the regularization ladder depth for the
        Pallas path: a factorization's live footprint is ~4 (K, w, w)
        f32 arrays whose trailing dim pads to 128 lanes (tile rows merge
        K·w along sublanes), and the vmapped ladder multiplies that by
        the candidate count. ~128 MB VMEM on the v5e; budget 90 MB."""
        if not self.use_pallas:
            return None
        from sleipnir_tpu.ops.pallas_banded import (  # noqa: PLC0415
            pallas_is_chunked,
        )

        if pallas_is_chunked(self.K, self.w):
            # The chunked-grid kernels carry state in scratch across
            # sequential grid steps; vmapping them (the batched ladder)
            # is not exercised — escalate sequentially instead.
            return 1
        tile_rows = -(-(self.K * self.w) // 8)
        per_candidate = 4 * tile_rows * 8 * 128 * 4
        # ~16 MB scoped-vmem limit per kernel call on the v5e
        return max(1, int(16e6 // max(per_candidate, 1)))

    def _inner_factor(self, Ds, Es, eps_inertia):
        """Factor the equilibrated staged system with the selected
        factorization; returns (fac, (pos, neg, zero), pivots)."""
        K = self.K
        if self.mesh is not None:
            from sleipnir_tpu.parallel.time_axis import (  # noqa: PLC0415
                pad_to_devices,
                sharded_factor,
                sharded_inertia,
                sharded_pivots,
            )

            n_dev = self.mesh.shape[self.mesh_axis]
            w = Ds.shape[-1]
            Dp, Ep, _, _ = pad_to_devices(
                Ds, Es, jnp.zeros((K, w), self.dtype), n_dev
            )
            fac = sharded_factor(self.mesh, self.mesh_axis, Dp, Ep, k_orig=K)
            return (
                fac,
                sharded_inertia(fac, eps_inertia),
                sharded_pivots(fac),
            )
        if self.use_pallas:
            from sleipnir_tpu.ops.pallas_banded import (  # noqa: PLC0415
                pallas_banded_factor,
                pallas_pivots,
            )

            fac = pallas_banded_factor(Ds, Es)
            d = pallas_pivots(fac)
            pos = jnp.sum(d > eps_inertia)
            neg = jnp.sum(d < -eps_inertia)
            zero = d.size - pos - neg
            return fac, (pos, neg, zero), [d]
        if self.use_inv:
            fac = block_tridiag_factor_part_inv(Ds, Es)
            return (
                fac,
                inv_part_inertia(fac, eps_inertia),
                inv_part_pivots(fac),
            )
        if self.use_bcr:
            fac = bcr_factor(Ds, Es)
            return (
                fac,
                bcr_inertia(fac, eps_inertia, K),
                [fac.final.d] + [lv.do for lv in fac.levels],
            )
        if self.use_partitioned:
            fac = block_tridiag_factor_part(Ds, Es)
            return fac, part_inertia(fac, eps_inertia), part_pivots(fac)
        fac = block_tridiag_factor(Ds, Es)
        return fac, block_tridiag_inertia(fac, eps_inertia), [fac.d]

    def _inner_solve(self, fac, b):
        """Solve the factored (equilibrated) staged system for b (K, w)."""
        if self.mesh is not None:
            from sleipnir_tpu.parallel.time_axis import (  # noqa: PLC0415
                sharded_solve,
            )

            Kp = fac.n_dev * fac.L
            pad = Kp - self.K
            if pad:
                b = jnp.concatenate(
                    [b, jnp.zeros((pad, b.shape[1]), b.dtype)]
                )
            out = sharded_solve(self.mesh, self.mesh_axis, fac, b)
            return out[: self.K]
        if self.use_pallas:
            from sleipnir_tpu.ops.pallas_banded import (  # noqa: PLC0415
                pallas_banded_solve,
            )

            return pallas_banded_solve(fac, b)
        if self.use_inv:
            return block_tridiag_solve_part_inv(fac, b)
        if self.use_bcr:
            return bcr_solve(fac, b)
        return block_tridiag_solve_part(fac, b)

    def factor(self, d: BandedDerivs, sigma, prev_delta, gamma_min):
        K, m, p, q, w = self.K, self.m, self.p, self.q, self.w
        eps = float(np.finfo(np.dtype(self.dtype)).eps)

        # AᵢᵀΣAᵢ per stage
        if self.mi > 0:
            sig_st = self._stage_ineq(sigma)  # (K, q)
            AiTSAi = jnp.einsum(
                "kqm,kq,kqn->kmn", d.Ailoc, sig_st, d.Ailoc
            )
        else:
            AiTSAi = jnp.zeros((K, m, m), self.dtype)

        top_left = d.Hd + AiTSAi
        eye_m = jnp.eye(m, dtype=self.dtype)
        slot_real = self._eq_slot_real  # (K, p)

        E = jnp.zeros((max(K - 1, 0), w, w), self.dtype)
        if K > 1:
            E = E.at[:, :m, :m].set(d.Hc)
            E = E.at[:, :m, m:].set(jnp.swapaxes(d.Anext[:-1], 1, 2))

        # Pivot zero-threshold for inertia on the EQUILIBRATED system,
        # whose legitimate pivots are O(1): anything below eps^0.75
        # (f64: ~1e-12, above the TPU-emulation noise ~1e-13; f32: ~2e-5)
        # counts as zero and drives the δ/γ escalation.
        eps_inertia = float(eps**0.75)

        nb = self.nb
        col0, e0 = self._assemble_border(d, sigma)
        inner_solve = self._inner_solve
        from jax import lax  # noqa: PLC0415
        from sleipnir_tpu.ops.ldlt import _ldlt_unblocked  # noqa: PLC0415

        def factor_with(delta, gamma):
            D = jnp.zeros((K, w, w), self.dtype)
            D = D.at[:, :m, :m].set(top_left + delta * eye_m[None])
            D = D.at[:, :m, m:].set(jnp.swapaxes(d.Aloc, 1, 2))
            D = D.at[:, m:, :m].set(d.Aloc)
            # Real equality slots get −γ; padded slots a fixed −1 pivot
            diag_vals = jnp.where(slot_real, -gamma, -1.0)
            idx = jnp.arange(m, w)
            D = D.at[:, idx, idx].set(diag_vals)
            Ds, Es, s_eq = _equilibrate(D, E)
            fac, (pos, neg, zero), pivots = self._inner_factor(
                Ds, Es, eps_inertia
            )
            small_any = jnp.asarray(False)
            finite = jnp.asarray(True)
            for pv in pivots:
                small_any = small_any | jnp.any(jnp.abs(pv) < 1e-4)
                finite = finite & jnp.all(jnp.isfinite(pv))

            # Border (arrowhead) Schur complement: S_b = e − colᵀ T⁻¹ col.
            # The border solves run under sequential lax.map (not vmap),
            # and get one refinement pass, so the Schur pivot signs stay
            # trustworthy (see _probe_map / docs/tpu_numerics.md).
            if nb > 0:
                def tsolve(b_):
                    return s_eq * inner_solve(fac, s_eq * b_)

                X = lax.map(tsolve, col0)  # (nb, K, w)
                resid = col0 - lax.map(
                    lambda u: self._kkt_matvec_staged(
                        d, sigma, delta, gamma, u
                    ),
                    X,
                )
                X = X + lax.map(tsolve, resid)
                Sb = (
                    e0
                    + delta * jnp.eye(nb, dtype=self.dtype)
                    - jnp.einsum("akw,bkw->ab", col0, X)
                )
                Lb, db = _ldlt_unblocked(Sb)
                pos = pos + jnp.sum(db > eps_inertia)
                neg = neg + jnp.sum(db < -eps_inertia)
                zero = zero + nb - jnp.sum(db > eps_inertia) - jnp.sum(
                    db < -eps_inertia
                )
                small_any = small_any | jnp.any(jnp.abs(db) < 1e-4)
                finite = finite & jnp.all(jnp.isfinite(db))
            else:
                X = jnp.zeros((0, K, w), self.dtype)
                Lb = jnp.zeros((0, 0), self.dtype)
                db = jnp.zeros((0,), self.dtype)

            small = (delta == 0.0) & (gamma == 0.0) & small_any
            failed = ~finite | small
            return (fac, s_eq, X, Lb, db), pos, neg, zero, failed

        ideal_pos = self.n
        ideal_neg = K * p
        out: RegLoopResult = regularization_loop(
            factor_with, ideal_pos, ideal_neg, prev_delta, gamma_min,
            self.dtype, max_ladder=self._max_ladder(),
        )
        inner, s_eq, X, Lb, db = out.fac
        return BandedFactor(
            fac=inner, s=s_eq, col=col0, Xcols=X, e0=e0, Sb_L=Lb, Sb_d=db,
            delta=out.delta, gamma=out.gamma, ok=out.ok,
        )

    def _assemble_border(self, d: BandedDerivs, sigma):
        """Assemble the border columns in staged layout (nb, K, w) and the
        δ-free border block e₀ = H_bb + Σᵣ σᵣ a_b a_bᵀ (nb, nb)."""
        K, m, w, nb = self.K, self.m, self.w, self.nb
        col = jnp.zeros((nb, K, w), self.dtype)
        if nb == 0:
            return col, jnp.zeros((0, 0), self.dtype)
        colm = d.Hb  # (nb, K, m)
        e0 = d.Hbb
        if self.mi > 0:
            sig_st = self._stage_ineq(sigma)  # (K, q)
            Aib_st = jnp.zeros((K, self.q, nb), self.dtype).at[
                self._ci_stage, self._ci_slot
            ].set(d.Aib)
            colm = colm + jnp.einsum(
                "kq,kqm,kqb->bkm", sig_st, d.Ailoc, Aib_st
            )
            e0 = e0 + jnp.einsum("r,ra,rb->ab", sigma, d.Aib, d.Aib)
        col = col.at[:, :, :m].set(colm)
        if self.me > 0:
            col = col.at[:, self._ce_stage, m + self._ce_slot].set(
                jnp.swapaxes(d.Aeb, 0, 1)
            )
        return col, e0

    def _border_block_solve(self, fac: BandedFactor, r):
        """Solve S_b v = r with the border Schur LDLᵀ ((nb,) rhs)."""
        from jax.scipy.linalg import solve_triangular  # noqa: PLC0415

        y = solve_triangular(fac.Sb_L, r, lower=True)
        y = y / jnp.where(fac.Sb_d == 0.0, 1.0, fac.Sb_d)
        return solve_triangular(fac.Sb_L.T, y, lower=False)

    def _bordered_solve(self, fac: BandedFactor, b, b_b):
        """Solve the full arrowhead system given the factor: returns
        (staged solution (K, w), border solution (nb,))."""
        u0 = fac.s * self._inner_solve(fac.fac, fac.s * b)
        if self.nb == 0:
            return u0, b_b
        rhs_v = b_b - jnp.einsum("bkw,kw->b", fac.col, u0)
        v = self._border_block_solve(fac, rhs_v)
        u = u0 - jnp.einsum("bkw,b->kw", fac.Xcols, v)
        return u, v

    def _staged_rhs(self, rhs_top, rhs_bottom):
        """Split a flat rhs into staged (K, w) and border (nb,) parts."""
        b = jnp.zeros((self.K, self.w), self.dtype)
        b = b.at[:, : self.m].set(self._stage_vec(rhs_top))
        if self.me > 0:
            b = b.at[
                self._ce_stage, self.m + self._ce_slot
            ].set(rhs_bottom)
        b_b = (
            rhs_top[self._border_pos]
            if self.nb > 0
            else jnp.zeros((0,), self.dtype)
        )
        return b, b_b

    def _unpack_solution(self, sol, v_b):
        p_x = self._unstage_vec(sol[:, : self.m])
        if self.nb > 0:
            p_x = p_x.at[self._border_pos].set(v_b)
        p_y = (
            -sol[self._ce_stage, self.m + self._ce_slot]
            if self.me > 0
            else jnp.zeros((0,), self.dtype)
        )
        return p_x, p_y

    def solve(self, fac: BandedFactor, rhs_top, rhs_bottom):
        b, b_b = self._staged_rhs(rhs_top, rhs_bottom)
        sol, v_b = self._bordered_solve(fac, b, b_b)
        return self._unpack_solution(sol, v_b)

    def _kkt_matvec_staged(self, d: BandedDerivs, sigma, delta, gamma, sol):
        """Apply the regularized staged KKT matrix to sol (K, w).

        Matches the matrix assembled in factor(): per-stage diagonal
        [Hd + AᵢᵀΣAᵢ + δI, Alocᵀ; Aloc, diag(−γ | −1 pad)] with
        sub-diagonal coupling [Hc, Anextᵀ; 0, 0]."""
        m = self.m
        u = sol[:, :m]  # (K, m)
        v = sol[:, m:]  # (K, p)
        top = jnp.einsum("kij,kj->ki", d.Hd, u) + delta * u
        if self.K > 1:
            top = top.at[1:].add(jnp.einsum("kij,kj->ki", d.Hc, u[:-1]))
            top = top.at[:-1].add(jnp.einsum("kji,kj->ki", d.Hc, u[1:]))
        if self.mi > 0:
            sig_st = self._stage_ineq(sigma)  # (K, q)
            t = jnp.einsum("kqm,km->kq", d.Ailoc, u) * sig_st
            top = top + jnp.einsum("kqm,kq->km", d.Ailoc, t)
        # Aₑᵀ v (staged): stage-local rows plus next-stage coupling
        top = top + jnp.einsum("kpm,kp->km", d.Aloc, v)
        if self.K > 1:
            top = top.at[1:].add(
                jnp.einsum("kpm,kp->km", d.Anext, v)[:-1]
            )
        # Aₑ u rows + regularization diagonal
        u_next = jnp.concatenate(
            [u[1:], jnp.zeros((1, m), u.dtype)], axis=0
        )
        bot = jnp.einsum("kpm,km->kp", d.Aloc, u) + jnp.einsum(
            "kpm,km->kp", d.Anext, u_next
        )
        bot = bot + jnp.where(self._eq_slot_real, -gamma, -1.0) * v
        return jnp.concatenate([top, bot], axis=1)

    def solve_refined(
        self, d: BandedDerivs, sigma, fac: BandedFactor, rhs_top, rhs_bottom,
        iterations: int = 2,
    ):
        """Solve + fixed-count iterative refinement (see
        DenseBackend.solve_refined; the stage-ordered unpivoted elimination
        needs it even more than the dense path)."""
        b, b_b = self._staged_rhs(rhs_top, rhs_bottom)
        sol, v_b = self._bordered_solve(fac, b, b_b)

        # fori_loop rather than Python-unrolled passes: the loop body is
        # emitted once into the HLO, which matters because this program is
        # inlined at several line-search/SOC call sites of the jitted IPM
        # step and XLA:TPU compile time scales with program size.
        def refine(_, carry):
            sol, v_b = carry
            r = b - self._kkt_matvec_staged(
                d, sigma, fac.delta, fac.gamma, sol
            )
            if self.nb > 0:
                r = r - jnp.einsum("bkw,b->kw", fac.col, v_b)
                r_b = (
                    b_b
                    - jnp.einsum("bkw,kw->b", fac.col, sol)
                    - fac.e0 @ v_b
                    - fac.delta * v_b
                )
            else:
                r_b = b_b
            du, dv = self._bordered_solve(fac, r, r_b)
            return sol + du, v_b + dv

        from jax import lax  # noqa: PLC0415

        sol, v_b = lax.fori_loop(0, iterations, refine, (sol, v_b))
        return self._unpack_solution(sol, v_b)

    # -- observability -----------------------------------------------------

    def dense(self, d: BandedDerivs):
        """Reconstruct dense H/A_e/A_i (observed/spy paths only)."""
        K, m = self.K, self.m
        n, me, mi = self.n, self.me, self.mi
        Hd = np.asarray(d.Hd)
        Hc = np.asarray(d.Hc)
        perm = np.asarray(self.structure.var_perm)
        H = np.zeros((n, n))
        for k in range(K):
            vk = perm.reshape(K, m)[k]
            H[np.ix_(vk, vk)] = Hd[k]
            if k + 1 < K:
                vk1 = perm.reshape(K, m)[k + 1]
                H[np.ix_(vk1, vk)] = Hc[k]
                H[np.ix_(vk, vk1)] = Hc[k].T
        if self.nb > 0:
            bp = np.asarray(self._border_pos)
            Hb = np.asarray(d.Hb)  # (nb, K, m)
            for bi in range(self.nb):
                H[bp[bi], perm] = Hb[bi].reshape(-1)
                H[perm, bp[bi]] = Hb[bi].reshape(-1)
            H[np.ix_(bp, bp)] = np.asarray(d.Hbb)
        A_e = np.zeros((me, n))
        Aloc = np.asarray(d.Aloc)
        Anext = np.asarray(d.Anext)
        for r in range(me):
            s_, sl = self.structure.ce_stage[r], self.structure.ce_slot[r]
            A_e[r, perm.reshape(K, m)[s_]] = Aloc[s_, sl]
            if s_ + 1 < K:
                A_e[r, perm.reshape(K, m)[s_ + 1]] = Anext[s_, sl]
        if self.nb > 0 and me > 0:
            A_e[:, np.asarray(self._border_pos)] = np.asarray(d.Aeb)
        A_i = np.zeros((mi, n))
        Ailoc = np.asarray(d.Ailoc)
        for r in range(mi):
            s_, sl = self.structure.ci_stage[r], self.structure.ci_slot[r]
            A_i[r, perm.reshape(K, m)[s_]] = Ailoc[s_, sl]
        if self.nb > 0 and mi > 0:
            A_i[:, np.asarray(self._border_pos)] = np.asarray(d.Aib)
        return H, A_e, A_i
