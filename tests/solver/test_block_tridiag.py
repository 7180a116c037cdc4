"""Unit tests for the block-tridiagonal KKT linear algebra.

These exercise the TPU-only code paths (block cyclic reduction is what the
real accelerator runs; block-Thomas is the CPU default) against dense
oracles, mirroring the reference's factorization unit tests
(reference test/src/optimization/solver/util/inertia_test.cpp) but over the
structured algorithms the reference gets for free from Eigen SimplicialLDLT.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sleipnir_tpu.ops.block_tridiag import (
    bcr_factor,
    bcr_inertia,
    bcr_solve,
    block_tridiag_factor,
    block_tridiag_inertia,
    block_tridiag_solve,
)


def random_block_tridiag(rng, nblocks, w, definite=False):
    """Random symmetric block-tridiagonal (D, E) plus its dense form."""
    D = rng.standard_normal((nblocks, w, w))
    D = (D + np.swapaxes(D, 1, 2)) / 2
    if definite:
        D = D + (w + 2) * np.eye(w)[None]
    E = rng.standard_normal((max(nblocks - 1, 0), w, w)) * 0.3
    n = nblocks * w
    dense = np.zeros((n, n))
    for k in range(nblocks):
        dense[k * w : (k + 1) * w, k * w : (k + 1) * w] = D[k]
        if k + 1 < nblocks:
            dense[(k + 1) * w : (k + 2) * w, k * w : (k + 1) * w] = E[k]
            dense[k * w : (k + 1) * w, (k + 1) * w : (k + 2) * w] = E[k].T
    return jnp.asarray(D), jnp.asarray(E), dense


def kkt_like_block_tridiag(rng, nstages, m, p):
    """An indefinite saddle-point block tridiagonal system shaped like the
    reduced KKT matrix of a direct-transcription OCP: per stage
    [Hₖ, Aₖᵀ; Aₖ, −γI] with cross-stage dynamics coupling."""
    w = m + p
    gamma = 1e-8
    D = np.zeros((nstages, w, w))
    E = np.zeros((nstages - 1, w, w))
    for k in range(nstages):
        Hk = rng.standard_normal((m, m))
        Hk = Hk @ Hk.T + 0.5 * np.eye(m)  # SPD Hessian block
        Ak = rng.standard_normal((p, m))
        D[k, :m, :m] = Hk
        D[k, m:, :m] = Ak
        D[k, :m, m:] = Ak.T
        D[k, m:, m:] = -gamma * np.eye(p)
    for k in range(nstages - 1):
        E[k, :m, m:] = rng.standard_normal((m, p))  # A_next^T coupling
    n = nstages * w
    dense = np.zeros((n, n))
    for k in range(nstages):
        dense[k * w : (k + 1) * w, k * w : (k + 1) * w] = D[k]
        if k + 1 < nstages:
            dense[(k + 1) * w : (k + 2) * w, k * w : (k + 1) * w] = E[k]
            dense[k * w : (k + 1) * w, (k + 1) * w : (k + 2) * w] = E[k].T
    return jnp.asarray(D), jnp.asarray(E), dense


# sizes deliberately include non-powers-of-2 and the 1/2/3-block edge cases
SIZES = [(1, 3), (2, 2), (3, 4), (5, 3), (8, 2), (13, 5), (33, 3)]


@pytest.mark.parametrize("nblocks,w", SIZES)
@pytest.mark.parametrize(
    "factor,solve",
    [
        (block_tridiag_factor, block_tridiag_solve),
        (bcr_factor, bcr_solve),
    ],
    ids=["thomas", "bcr"],
)
def test_solve_matches_dense(nblocks, w, factor, solve):
    rng = np.random.default_rng(nblocks * 100 + w)
    D, E, dense = random_block_tridiag(rng, nblocks, w, definite=True)
    b = rng.standard_normal((nblocks, w))
    fac = factor(D, E)
    x = np.asarray(solve(fac, jnp.asarray(b)))
    x_dense = np.linalg.solve(dense, b.reshape(-1)).reshape(nblocks, w)
    np.testing.assert_allclose(x, x_dense, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("nblocks,w", SIZES)
def test_inertia_matches_eigvals_indefinite(nblocks, w):
    rng = np.random.default_rng(nblocks * 17 + w)
    # Indefinite but well-conditioned: shift a definite matrix's spectrum
    D, E, dense = random_block_tridiag(rng, nblocks, w, definite=True)
    shift = 2.0 * (w + 2)
    D = D - shift * jnp.eye(w)[None]
    dense = dense - shift * np.eye(dense.shape[0])
    eig = np.linalg.eigvalsh(dense)
    want_pos = int(np.sum(eig > 1e-10))
    want_neg = int(np.sum(eig < -1e-10))
    eps = np.finfo(np.float64).eps

    fac_t = block_tridiag_factor(D, E)
    pos, neg, zero = block_tridiag_inertia(fac_t, eps)
    assert (int(pos), int(neg), int(zero)) == (want_pos, want_neg, 0)

    fac_b = bcr_factor(D, E)
    pos, neg, zero = bcr_inertia(fac_b, eps, nblocks)
    assert (int(pos), int(neg), int(zero)) == (want_pos, want_neg, 0)


@pytest.mark.parametrize("nstages,m,p", [(4, 3, 2), (7, 2, 2), (16, 4, 3)])
def test_kkt_saddle_point_system(nstages, m, p):
    """The actual shape the IPM factors: indefinite with exactly
    nstages*p negative pivots when the constraint blocks have full rank."""
    rng = np.random.default_rng(nstages * m + p)
    D, E, dense = kkt_like_block_tridiag(rng, nstages, m, p)
    eig = np.linalg.eigvalsh(dense)
    want_pos = int(np.sum(eig > 0))
    want_neg = int(np.sum(eig < 0))
    b = rng.standard_normal((nstages, m + p))
    eps = np.finfo(np.float64).eps

    for factor, solve, inert in [
        (
            block_tridiag_factor,
            block_tridiag_solve,
            lambda f: block_tridiag_inertia(f, eps),
        ),
        (bcr_factor, bcr_solve, lambda f: bcr_inertia(f, eps, nstages)),
    ]:
        fac = factor(D, E)
        x = np.asarray(solve(fac, jnp.asarray(b)))
        x_dense = np.linalg.solve(dense, b.reshape(-1)).reshape(nstages, -1)
        np.testing.assert_allclose(x, x_dense, rtol=1e-7, atol=1e-7)
        pos, neg, zero = inert(fac)
        assert (int(pos), int(neg), int(zero)) == (want_pos, want_neg, 0)


def test_bcr_matches_thomas_factor_solve():
    """BCR and block-Thomas agree on the same random systems bit-tight."""
    rng = np.random.default_rng(7)
    for nblocks in [3, 4, 6, 9, 17, 40]:
        D, E, _ = random_block_tridiag(rng, nblocks, 3, definite=True)
        b = jnp.asarray(rng.standard_normal((nblocks, 3)))
        xt = np.asarray(block_tridiag_solve(block_tridiag_factor(D, E), b))
        xb = np.asarray(bcr_solve(bcr_factor(D, E), b))
        np.testing.assert_allclose(xb, xt, rtol=1e-10, atol=1e-10)


def test_handmade_pivoted_lu_matches_lapack():
    """The TPU block-solve path (XLA:TPU has no f64 LuDecomposition custom
    call) must match LAPACK's lu_factor packing and pivot convention."""
    import jax.numpy as jnp
    from jax.scipy.linalg import lu_factor, lu_solve

    from sleipnir_tpu.ops.block_tridiag import _lu_pivoted

    rng = np.random.default_rng(17)
    for w in (1, 2, 5, 9, 13, 21):
        A = jnp.asarray(rng.standard_normal((w, w)))
        b = jnp.asarray(rng.standard_normal((w,)))
        lu, piv = _lu_pivoted(A)
        lu2, piv2 = lu_factor(A)
        np.testing.assert_array_equal(np.asarray(piv), np.asarray(piv2))
        np.testing.assert_allclose(
            np.asarray(lu), np.asarray(lu2), rtol=1e-12, atol=1e-12
        )
        x = lu_solve((lu, piv), b)
        np.testing.assert_allclose(
            np.asarray(x),
            np.linalg.solve(np.asarray(A), np.asarray(b)),
            rtol=1e-10,
            atol=1e-12,
        )
