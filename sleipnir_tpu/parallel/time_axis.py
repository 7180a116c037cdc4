"""Time-axis (horizon) sharding of the block-tridiagonal KKT system.

The multi-device leg of SURVEY.md §7 step 5, restructured in round 5 as a
FACTOR/SOLVE SPLIT so the interior-point regularization loop can drive it
(round-4's fused kernel refactored on every solve and returned no pivots,
so inertia-corrected regularization — the heart of the method — could not
run on it; VERDICT r4 "What's weak" #5):

  - `sharded_factor`: each device runs the explicit-inverse partitioned
    factorization (ops/block_tridiag.block_tridiag_factor_part_inv) on its
    contiguous chunk's interior, condenses onto its interface block with
    two block-column solves, and the P-block reduced interface system
    (P = #devices) is assembled with one `all_gather` + one `ppermute`
    and factored redundantly on every device. Pivots (interior + reduced)
    are exposed for Sylvester inertia counting.
  - `sharded_solve`: one local solve + two (w,)-vector all_gathers + the
    tiny replicated reduced solve + a matmul back-substitution against the
    stored condensation columns. No refactorization, O(w) communication.

There is no NCCL/MPI analog in the reference — it is single-process
(reference optimization/multistart.hpp:54-56 is its only parallelism);
the serial hot loop being replaced is
reference/include/sleipnir/optimization/solver/interior_point.hpp:382-863.
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
    block_tridiag_factor_part_inv,
    block_tridiag_solve_part_inv,
    inv_part_inertia,
    inv_part_pivots,
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


@jax.tree_util.register_pytree_node_class
class ShardedFactor:
    """Factor of a device-sharded block-tridiagonal system.

    All `loc`-prefixed leaves carry a leading device axis (n_dev, ...)
    sharded over the mesh; `red` (the reduced interface factor) is
    replicated. `loc_fac` is the per-device PartitionedFactorInv /
    BlockTridiagFactorInv of the chunk interior with that extra leading
    axis on every leaf (stripped inside the solve kernel)."""

    def __init__(self, loc_fac, Xl, Xr, U0, E_last, red, K, n_dev, L):
        self.loc_fac = loc_fac
        self.Xl = Xl  # (n_dev, Lint, w, w): Tint⁻¹ [U0; 0; ...]
        self.Xr = Xr  # (n_dev, Lint, w, w): Tint⁻¹ [...; 0; E_lastᵀ]
        self.U0 = U0  # (n_dev, w, w) left-interface coupling
        self.E_last = E_last  # (n_dev, w, w) own-interface coupling
        self.red = red  # replicated reduced-interface factor
        self.K = K  # original (unpadded) block count
        self.n_dev = n_dev
        self.L = L  # blocks per device (padded)

    def tree_flatten(self):
        return (
            (self.loc_fac, self.Xl, self.Xr, self.U0, self.E_last, self.red),
            (self.K, self.n_dev, self.L),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _counted_pivots(fac) -> int:
    """Static pivot count of an explicit-inverse factor, incl. recursion."""
    total = 0
    for leaf in inv_part_pivots(fac):
        size = 1
        for s in leaf.shape:
            size *= int(s)
        total += size
    return total


def sharded_factor(mesh: Mesh, axis: str, D, E_full, k_orig=None):
    """Factor a block-tridiagonal system with the stage axis sharded over
    `mesh[axis]`. D (K, w, w), E_full (K, w, w) with E_full[k] = A(k+1, k)
    (last entry zero); K must be a multiple of the mesh size (use
    pad_to_devices). `k_orig` is the UNPADDED block count (defaults to K)
    so sharded_inertia can subtract the identity padding's +1 pivots."""
    n_dev = mesh.shape[axis]
    K, w, _ = D.shape
    if k_orig is None:
        k_orig = K
    assert K % n_dev == 0, (K, n_dev)
    L = K // n_dev
    Lint = L - 1
    spec = P(axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(
            jax.tree.map(lambda _: spec, _local_fac_structure(Lint, w)),
            spec,
            spec,
            spec,
            spec,
            P(),
        ),
        check_vma=False,
    )
    def run(D_loc, E_loc):
        idx = lax.axis_index(axis)
        fwd_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        # Left-neighbor coupling into our first block: the neighbor's
        # E_loc[L-1] = A(our block 0, their interface).
        U0 = lax.ppermute(E_loc[L - 1], axis, fwd_perm)
        U0 = jnp.where(idx == 0, jnp.zeros_like(U0), U0)

        if Lint > 0:
            loc_fac = block_tridiag_factor_part_inv(
                D_loc[:Lint], E_loc[: Lint - 1]
            )
            E_last = E_loc[Lint - 1]

            def solve_cols(cols):
                # cols (Lint, w, r): solve each column through the local
                # factor (vmapped over the r axis — batching is free on
                # the accelerator, the solve cost is sequential depth).
                return jax.vmap(
                    lambda c: block_tridiag_solve_part_inv(loc_fac, c),
                    in_axes=2,
                    out_axes=2,
                )(cols)

            col_l = jnp.zeros((Lint, w, w), D_loc.dtype).at[0].set(U0)
            col_r = (
                jnp.zeros((Lint, w, w), D_loc.dtype).at[Lint - 1].set(
                    E_last.T
                )
            )
            Xl = solve_cols(col_l)
            Xr = solve_cols(col_r)
            S_own = D_loc[Lint] - E_last @ Xr[Lint - 1]
            U_own = -(E_last @ Xl[Lint - 1])
            dDl = -(U0.T @ Xl[0])
        else:
            loc_fac = _empty_local_fac(w, D_loc.dtype)
            E_last = jnp.zeros((w, w), D_loc.dtype)
            Xl = jnp.zeros((0, w, w), D_loc.dtype)
            Xr = jnp.zeros((0, w, w), D_loc.dtype)
            S_own = D_loc[0]
            U_own = U0
            dDl = jnp.zeros((w, w), D_loc.dtype)

        # Reduced interface system: tiny, assembled from one all_gather,
        # factored redundantly on every device.
        S_g = lax.all_gather(S_own, axis)  # (P, w, w)
        dDl_g = lax.all_gather(dDl, axis)
        U_g = lax.all_gather(U_own, axis)
        D_red = S_g + jnp.concatenate(
            [dDl_g[1:], jnp.zeros((1, w, w), S_g.dtype)], axis=0
        )
        E_red = U_g[1:]
        red = block_tridiag_factor_part_inv(D_red, E_red)

        loc_out = jax.tree.map(lambda a: a[None], loc_fac)
        return loc_out, Xl[None], Xr[None], U0[None], E_last[None], red

    loc_fac, Xl, Xr, U0, E_last, red = run(D, E_full)
    return ShardedFactor(
        loc_fac=loc_fac,
        Xl=Xl,
        Xr=Xr,
        U0=U0,
        E_last=E_last,
        red=red,
        K=int(k_orig),
        n_dev=n_dev,
        L=L,
    )


def _local_fac_structure(Lint: int, w: int):
    """Pytree structure of the per-device interior factor (for out_specs)."""
    return _empty_local_fac_of(Lint, w)


def _empty_local_fac(w, dtype):
    from sleipnir_tpu.ops.block_tridiag import (  # noqa: PLC0415
        BlockTridiagFactorInv,
    )

    return BlockTridiagFactorInv(
        T=jnp.ones((1, w, w), dtype),
        d=jnp.ones((1, w), dtype),
        W=jnp.zeros((0, w, w), dtype),
    )


def _empty_local_fac_of(Lint, w):
    """Trace the local factorization on zeros to get its pytree structure
    (shapes depend on the partition geometry chosen for Lint)."""
    if Lint <= 0:
        return _empty_local_fac(w, jnp.float64)
    D = jnp.broadcast_to(jnp.eye(w), (Lint, w, w))
    E = jnp.zeros((max(Lint - 1, 0), w, w))
    return jax.eval_shape(block_tridiag_factor_part_inv, D, E)


def sharded_pivots(fac: ShardedFactor) -> list:
    """All pivot arrays (device-sharded interior + replicated reduced)."""
    out = []
    loc = fac.loc_fac
    # Walk the local factor's pivot leaves (they carry the device axis).
    from sleipnir_tpu.ops.block_tridiag import (  # noqa: PLC0415
        BlockTridiagFactorInv,
        PartitionedFactorInv,
    )

    node = loc
    while isinstance(node, PartitionedFactorInv):
        out.append(node.int_d)
        node = node.red
    assert isinstance(node, BlockTridiagFactorInv), type(node)
    out.append(node.d)
    out.extend(inv_part_pivots(fac.red))
    return out


def sharded_inertia(fac: ShardedFactor, eps: float):
    """Global inertia by Sylvester: interior pivots (all devices) +
    reduced pivots, with identity-padding (+1 pivots each) subtracted
    exactly. Padding enters at the device level (pad_to_devices), inside
    each device's partitioned interior factor, and inside the reduced
    factor; every padded pivot is exactly +1, so the static count
    `counted − K·w` removes them all."""
    pivots = sharded_pivots(fac)
    pos = sum(jnp.sum(p > eps) for p in pivots)
    neg = sum(jnp.sum(p < -eps) for p in pivots)
    counted = 0
    for p in pivots:
        size = 1
        for s in p.shape:
            size *= int(s)
        counted += size
    pad_pos = counted - fac.K * pivots[0].shape[-1]
    pos = pos - pad_pos
    zero = (counted - pad_pos) - pos - neg
    return pos, neg, zero


def sharded_solve(mesh: Mesh, axis: str, fac: ShardedFactor, b):
    """Solve with a sharded_factor result; b (K, w) sharded over the
    stage axis. One local solve, two (w,)-vector all_gathers, the
    replicated reduced solve, and a matmul back substitution."""
    n_dev = fac.n_dev
    L = fac.L
    Lint = L - 1
    spec = P(axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: spec, fac.loc_fac),
            spec,
            spec,
            spec,
            spec,
            P(),
            spec,
        ),
        out_specs=spec,
        check_vma=False,
    )
    def run(loc_fac_b, Xl, Xr, U0, E_last, red, b_loc):
        idx = lax.axis_index(axis)
        loc_fac = jax.tree.map(lambda a: a[0], loc_fac_b)
        Xl, Xr, U0, E_last = Xl[0], Xr[0], U0[0], E_last[0]
        if Lint > 0:
            b_int = b_loc[:Lint]
            z = block_tridiag_solve_part_inv(loc_fac, b_int)
            r_own = b_loc[Lint] - E_last @ z[Lint - 1]
            dbl = -(U0.T @ z[0])
        else:
            z = jnp.zeros((0, b_loc.shape[1]), b_loc.dtype)
            r_own = b_loc[0]
            dbl = jnp.zeros((b_loc.shape[1],), b_loc.dtype)

        r_g = lax.all_gather(r_own, axis)  # (P, w)
        dbl_g = lax.all_gather(dbl, axis)
        b_red = r_g + jnp.concatenate(
            [dbl_g[1:], jnp.zeros((1, r_g.shape[1]), r_g.dtype)], axis=0
        )
        x_ifc = block_tridiag_solve_part_inv(red, b_red)  # (P, w) replicated
        x_own = x_ifc[idx]
        x_left = jnp.where(
            idx == 0,
            jnp.zeros_like(x_own),
            x_ifc[jnp.maximum(idx - 1, 0)],
        )
        if Lint > 0:
            x_int = (
                z
                - jnp.einsum("kab,b->ka", Xr, x_own)
                - jnp.einsum("kab,b->ka", Xl, x_left)
            )
            return jnp.concatenate([x_int, x_own[None]], axis=0)
        return x_own[None]

    sh = NamedSharding(mesh, spec)
    b = jax.lax.with_sharding_constraint(b, sh)
    return run(
        fac.loc_fac, fac.Xl, fac.Xr, fac.U0, fac.E_last, fac.red, b
    )


def sharded_block_tridiag_solve(mesh: Mesh, axis: str, D, E_full, b):
    """Factor + solve in one call (kept for the dryrun/back-compat; the
    IPM uses the split sharded_factor/sharded_solve)."""
    fac = sharded_factor(mesh, axis, D, E_full)
    return sharded_solve(mesh, axis, fac, b)
