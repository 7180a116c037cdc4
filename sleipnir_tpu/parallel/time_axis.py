"""Time-axis (horizon) sharding of the block-tridiagonal KKT solve.

The multi-device leg of SURVEY.md §7 step 5: the direct-transcription
KKT system's stage dimension is partitioned across a device mesh with
the same Schur-complement structure as the single-chip partitioned
factorization (ops/block_tridiag.block_tridiag_factor_part):

  - each device eliminates the interior blocks of its contiguous chunk
    locally (a per-device scan — zero communication),
  - the P-block reduced interface system is assembled with one
    `all_gather` (plus one `ppermute` for the chunk-boundary couplings)
    and factored redundantly on every device (P = #devices blocks — tiny),
  - back substitution is again local.

Communication is O(w²) per device per solve, independent of the horizon
length: the collectives ride ICI, the O(N) work stays on-device. There is
no NCCL/MPI analog in the reference — it is single-process
(reference optimization/multistart.hpp:54-56 is its only parallelism).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from sleipnir_tpu.ops.block_tridiag import (
    _block_factor,
    _block_lu_solve,
    block_tridiag_factor,
    block_tridiag_solve,
)


def pad_to_devices(D, E, b, n_dev: int):
    """Pad a (K, w, w) block-tridiagonal system with identity blocks so K
    is a multiple of n_dev; E is returned padded to (K, w, w) with
    E[k] = A(k+1, k) and E[K-1] = 0."""
    K, w, _ = D.shape
    L = -(-K // n_dev)
    Kp = L * n_dev
    pad = Kp - K
    if pad:
        D = jnp.concatenate(
            [D, jnp.broadcast_to(jnp.eye(w, dtype=D.dtype), (pad, w, w))]
        )
        b = jnp.concatenate([b, jnp.zeros((pad, b.shape[1]), b.dtype)])
    E_full = jnp.zeros((Kp, w, w), D.dtype)
    E_full = E_full.at[: E.shape[0]].set(E)
    return D, E_full, b, K


def sharded_block_tridiag_solve(mesh: Mesh, axis: str, D, E_full, b):
    """Solve the block-tridiagonal system with the stage axis sharded over
    `mesh[axis]`. D (K, w, w), E_full (K, w, w) with E_full[k] = A(k+1, k)
    (last entry zero), b (K, w); K must be a multiple of the mesh size.

    Returns the solution (K, w), sharded the same way.
    """
    n_dev = mesh.shape[axis]
    K, w, _ = D.shape
    assert K % n_dev == 0, (K, n_dev)
    L = K // n_dev
    spec = P(axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        # The library factor/solve helpers create replicated zero carries
        # inside their scans; skip the varying-manual-axes typechecking
        # rather than threading pcast through shared code.
        check_vma=False,
    )
    def run(D_loc, E_loc, b_loc):
        # Local chunk: interior blocks 0..L-2, interface block L-1.
        idx = lax.axis_index(axis)
        fwd_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        # Coupling from the left neighbor's interface into our first
        # block: the neighbor's E_loc[L-1] = A(our block 0, their last).
        U0 = lax.ppermute(E_loc[L - 1], axis, fwd_perm)
        U0 = jnp.where(idx == 0, jnp.zeros_like(U0), U0)

        def elim(carry, inputs):
            S, U, dDl = carry
            D_next, E_i = inputs
            lu, piv = _block_factor(S)
            SinvEt = _block_lu_solve(lu, piv, E_i.T)
            SinvU = _block_lu_solve(lu, piv, U)
            S_next = D_next - E_i @ SinvEt
            U_next = -(E_i @ SinvU)
            dDl_next = dDl - U.T @ SinvU
            return (S_next, U_next, dDl_next), (lu, piv, U)

        def vary(a):
            # scan carries must match the per-device (varying) type of
            # the scan outputs under shard_map's manual-axes checking
            return lax.pcast(a, (axis,), to="varying")

        (S_last, U_last, dDl), (int_lu, int_piv, U_stack) = lax.scan(
            elim,
            (D_loc[0], U0, vary(jnp.zeros((w, w), D_loc.dtype))),
            (D_loc[1:], E_loc[: L - 1]),
        )

        # Forward rhs elimination
        def fwd(carry, inputs):
            corr, dbl = carry
            y_i, lu, piv, E_i, U_i = inputs
            y_i = y_i + corr
            z = _block_lu_solve(lu, piv, y_i)
            return (-(E_i @ z), dbl - U_i.T @ z), y_i

        (last_corr, dbl), y_eff = lax.scan(
            fwd,
            (
                vary(jnp.zeros((w,), b_loc.dtype)),
                vary(jnp.zeros((w,), b_loc.dtype)),
            ),
            (b_loc[: L - 1], int_lu, int_piv, E_loc[: L - 1], U_stack),
        )

        # Reduced interface system: one all_gather of tiny per-device
        # blocks; factored redundantly on every device.
        S_g = lax.all_gather(S_last, axis)  # (P, w, w)
        dDl_g = lax.all_gather(dDl, axis)
        U_g = lax.all_gather(U_last, axis)
        br_g = lax.all_gather(b_loc[L - 1] + last_corr, axis)  # (P, w)
        dbl_g = lax.all_gather(dbl, axis)
        D_red = S_g + jnp.concatenate(
            [dDl_g[1:], jnp.zeros((1, w, w), S_g.dtype)], axis=0
        )
        E_red = U_g[1:]
        b_red = br_g + jnp.concatenate(
            [dbl_g[1:], jnp.zeros((1, w), br_g.dtype)], axis=0
        )
        fac_red = block_tridiag_factor(D_red, E_red)
        x_ifc_all = block_tridiag_solve(fac_red, b_red)  # (P, w)
        x_own = x_ifc_all[idx]
        x_left = jnp.where(
            idx == 0,
            jnp.zeros((w,), x_ifc_all.dtype),
            x_ifc_all[jnp.maximum(idx - 1, 0)],
        )

        # Local back substitution
        def bwd(x_next, inputs):
            y_i, lu, piv, E_i, U_i = inputs
            rhs = y_i - E_i.T @ x_next - U_i @ x_left
            x_i = _block_lu_solve(lu, piv, rhs)
            return x_i, x_i

        _, xs_rev = lax.scan(
            bwd,
            x_own,
            (
                y_eff[::-1],
                int_lu[::-1],
                int_piv[::-1],
                E_loc[: L - 1][::-1],
                U_stack[::-1],
            ),
        )
        x_loc = jnp.concatenate([xs_rev[::-1], x_own[None]], axis=0)
        return x_loc

    sh = NamedSharding(mesh, spec)
    constrain = lambda a: jax.lax.with_sharding_constraint(a, sh)  # noqa: E731
    return run(constrain(D), constrain(E_full), constrain(b))
