"""On-device microbenchmark: per-step cost of the block-elimination
primitives that set the IPM's per-iteration latency floor on the TPU.

Measures, inside ONE jitted computation with a lax.fori_loop carrying a
real data dependence (host-side timing through the axon tunnel lies —
see docs/tpu_numerics.md), the per-step cost of:

  1. batched sweep-based explicit inversion        (P, w, w)
  2. unbatched sweep-based explicit inversion      (w, w)
  3. batched matmul chain (elimination-step body)  (P, w, w)
  4. the current pivoted-LU factor + unrolled substitution (for reference)
  5. closed-form 3x3 batched inversion             (P, 3, 3)

Usage:  python tools/micro_latency.py            # TPU (default device)
        TRACE_CPU=1 python tools/micro_latency.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("TRACE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from sleipnir_tpu.ops.block_tridiag import (
    _lu_pivoted,
    _lu_solve_packed,
)


def timed(name, fn, *args, trips=50):
    fn_j = jax.jit(fn, static_argnums=(1,))
    out = fn_j(*args, trips)
    jax.block_until_ready(out)
    reps = 3
    best = np.inf
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn_j(*args, trips)
        jax.block_until_ready(out)
        # fold to scalar and pull to host: forces the value to exist
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, time.monotonic() - t0)
    per = best / trips * 1e3
    print(f"{name:55s} {per:9.4f} ms/step  ({best * 1e3:8.2f} ms / {trips})")
    return per


def sweep_inv(A):
    w = A.shape[-1]
    idx = jnp.arange(w)

    def body(k, carry):
        A, d = carry
        row = lax.dynamic_slice_in_dim(A, k, 1, 0)[0]
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

    A_swept, d = lax.fori_loop(
        0, w, body, (A, jnp.zeros((w,), A.dtype))
    )
    return -A_swept, d


def inv3(A):
    """Closed-form symmetric 3x3 inverse + LDLT pivots."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d_, e = A[1, 1], A[1, 2]
    f = A[2, 2]
    C00 = d_ * f - e * e
    C01 = -(b * f - c * e)
    C02 = b * e - c * d_
    C11 = a * f - c * c
    C12 = -(a * e - b * c)
    C22 = a * d_ - b * b
    det = a * C00 + b * C01 + c * C02
    det_safe = jnp.where(det == 0.0, 1.0, det)
    T = (
        jnp.array([[C00, C01, C02], [C01, C11, C12], [C02, C12, C22]])
        / det_safe
    )
    m1 = a
    m2 = C22  # a*d - b^2
    p1 = m1
    p2 = m2 / jnp.where(m1 == 0.0, 1.0, m1)
    p3 = det / jnp.where(m2 == 0.0, 1.0, m2)
    return T, jnp.stack([p1, p2, p3])


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    w, P = 13, 11
    S1 = jnp.asarray(rng.standard_normal((w, w)))
    S1 = S1 + S1.T + 5.0 * jnp.eye(w)
    SP = jnp.asarray(rng.standard_normal((P, w, w)))
    SP = SP + jnp.swapaxes(SP, 1, 2) + 5.0 * jnp.eye(w)[None]
    S3 = jnp.asarray(rng.standard_normal((P, 3, 3)))
    S3 = S3 + jnp.swapaxes(S3, 1, 2) + 5.0 * jnp.eye(3)[None]

    # correctness spot checks first
    T, d = sweep_inv(S1)
    err = float(jnp.max(jnp.abs(T @ S1 - jnp.eye(w))))
    from numpy.linalg import eigvalsh
    print(f"sweep inv err {err:.2e}; pivots pos={int((d > 0).sum())} "
          f"(eig pos={int((eigvalsh(np.asarray(S1)) > 0).sum())})")
    T3, d3 = inv3(S3[0])
    err3 = float(jnp.max(jnp.abs(T3 @ S3[0] - jnp.eye(3))))
    print(f"inv3 err {err3:.2e}")

    def chain_batched_sweep(S, trips):
        def body(_, carry):
            S, acc = carry
            T, d = jax.vmap(sweep_inv)(S)
            # data dependence: feed T back in (plus keep it regular)
            S2 = S + 1e-12 * T
            return S2, acc + jnp.sum(d)

        return lax.fori_loop(0, trips, body, (S, 0.0))

    def chain_unbatched_sweep(S, trips):
        def body(_, carry):
            S, acc = carry
            T, d = sweep_inv(S)
            return S + 1e-12 * T, acc + jnp.sum(d)

        return lax.fori_loop(0, trips, body, (S, 0.0))

    def chain_matmul5(S, trips):
        def body(_, carry):
            S, acc = carry
            X = jnp.einsum("pab,pbc->pac", S, S)
            Y = jnp.einsum("pab,pbc->pac", S, X)
            Z = S - 1e-3 * jnp.einsum("pab,pbc->pac", X, Y)
            W = jnp.einsum("pab,pbc->pac", Z, S)
            V = jnp.einsum("pba,pbc->pac", S, W)
            return S + 1e-12 * V, acc + jnp.sum(V)

        return lax.fori_loop(0, trips, body, (S, 0.0))

    def chain_lu(S, trips):
        def body(_, carry):
            S, acc = carry
            lu, piv = jax.vmap(_lu_pivoted)(S)
            X = jax.vmap(_lu_solve_packed)(lu, piv, S)
            return S + 1e-12 * X, acc + jnp.sum(X)

        return lax.fori_loop(0, trips, body, (S, 0.0))

    def chain_inv3(S, trips):
        def body(_, carry):
            S, acc = carry
            T, d = jax.vmap(inv3)(S)
            return S + 1e-12 * T, acc + jnp.sum(d)

        return lax.fori_loop(0, trips, body, (S, 0.0))

    def chain_elim_step(S, trips):
        """Full elimination-step body: inversion + 5 matmul-class ops."""
        E = S * 0.1

        def body(_, carry):
            S, acc = carry
            T, d = jax.vmap(sweep_inv)(S)
            TEt = jnp.einsum("pab,pcb->pac", T, E)
            TU = jnp.einsum("pab,pbc->pac", T, E)
            S_next = S - jnp.einsum("pab,pbc->pac", E, TEt) * 1e-3
            U_next = -jnp.einsum("pab,pbc->pac", E, TU)
            dDl = jnp.einsum("pba,pbc->pac", E, TU)
            return S_next + 1e-12 * (U_next + dDl), acc + jnp.sum(d)

        return lax.fori_loop(0, trips, body, (S, 0.0))

    timed("batched sweep inv (11,13,13)", chain_batched_sweep, SP)
    timed("unbatched sweep inv (13,13)", chain_unbatched_sweep, S1)
    timed("5 batched matmuls (11,13,13)", chain_matmul5, SP)
    timed("batched pivoted LU + unrolled solve (11,13,13)", chain_lu, SP)
    timed("closed-form inv3 (11,3,3)", chain_inv3, S3)
    timed("full elim step: sweep+5 matmul (11,13,13)", chain_elim_step, SP)
    # wider batch: does batching cost anything?
    SP64 = jnp.asarray(rng.standard_normal((64, w, w)))
    SP64 = SP64 + jnp.swapaxes(SP64, 1, 2) + 5.0 * jnp.eye(w)[None]
    timed("batched sweep inv (64,13,13)", chain_batched_sweep, SP64)
    S3w = jnp.asarray(rng.standard_normal((256, 3, 3)))
    S3w = S3w + jnp.swapaxes(S3w, 1, 2) + 5.0 * jnp.eye(3)[None]
    timed("closed-form inv3 (256,3,3)", chain_inv3, S3w)


if __name__ == "__main__":
    main()
