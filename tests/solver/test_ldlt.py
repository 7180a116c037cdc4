"""Unit tests for the blocked dense LDLT and inertia
(mirrors reference test/src/optimization/solver/util/inertia_test.cpp plus
factorization correctness checks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sleipnir_tpu.ops.ldlt import inertia, ldlt_factor, ldlt_solve
from sleipnir_tpu.optimization.solver.util.regularized_ldlt import (
    regularized_ldlt,
    regularized_solve,
)


def _random_sym(n, rng):
    A = rng.standard_normal((n, n))
    return (A + A.T) / 2 + n * np.eye(n)


@pytest.mark.parametrize("n", [1, 4, 17, 128, 200, 300])
def test_ldlt_reconstruction(n):
    rng = np.random.default_rng(n)
    A = _random_sym(n, rng)
    L, d = ldlt_factor(jnp.asarray(A))
    L, d = np.asarray(L), np.asarray(d)
    np.testing.assert_allclose(L @ np.diag(d) @ L.T, A, atol=1e-8)
    # Unit lower triangular
    np.testing.assert_allclose(np.diag(L), 1.0, atol=1e-12)
    assert np.allclose(np.triu(L, 1), 0.0)


@pytest.mark.parametrize("n", [5, 64, 190])
def test_ldlt_solve(n):
    rng = np.random.default_rng(n)
    A = _random_sym(n, rng)
    b = rng.standard_normal(n)
    L, d = ldlt_factor(jnp.asarray(A))
    x = np.asarray(ldlt_solve(L, d, jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, atol=1e-7)


def test_inertia_of_saddle_matrix():
    # KKT-style saddle matrix: n positive, me negative eigenvalues
    rng = np.random.default_rng(7)
    n, me = 20, 8
    H = _random_sym(n, rng)
    A = rng.standard_normal((me, n))
    K = np.zeros((n + me, n + me))
    K[:n, :n] = H
    K[:n, n:] = A.T
    K[n:, :n] = A
    L, d = ldlt_factor(jnp.asarray(K))
    pos, neg, zero = inertia(d, float(np.finfo(np.float64).eps))
    eig = np.linalg.eigvalsh(K)
    assert int(pos) == int(np.sum(eig > 0))
    assert int(neg) == int(np.sum(eig < 0))
    assert int(zero) == 0


def test_regularized_ldlt_corrects_inertia():
    # Indefinite Hessian block: unregularized inertia is wrong, the
    # escalation loop must fix it (reference
    # sparse_regularized_ldlt.hpp:104-151).
    n, me = 3, 1
    H = np.diag([1.0, -2.0, 1.0])
    A = np.array([[1.0, 1.0, 1.0]])
    K = np.zeros((4, 4))
    K[:n, :n] = H
    K[:n, n:] = A.T
    K[n:, :n] = A
    fac = regularized_ldlt(jnp.asarray(K), n, me, jnp.asarray(0.0), 1e-10)
    assert bool(fac.ok)
    assert float(fac.delta) > 0.0
    pos, neg, zero = inertia(fac.d, float(np.finfo(np.float64).eps))
    assert (int(pos), int(neg), int(zero)) == (n, me, 0)

    # Solving with the regularized factorization is consistent
    rhs = jnp.asarray(np.ones(4))
    x = regularized_solve(fac, rhs)
    reg = np.diag([float(fac.delta)] * n + [-float(fac.gamma)])
    np.testing.assert_allclose((K + reg) @ np.asarray(x), 1.0, atol=1e-8)


def test_regularized_ldlt_identity_passthrough():
    # A well-conditioned positive definite system needs no regularization
    n = 6
    rng = np.random.default_rng(3)
    A = _random_sym(n, rng)
    fac = regularized_ldlt(jnp.asarray(A), n, 0, jnp.asarray(0.0), 1e-10)
    assert bool(fac.ok)
    assert float(fac.delta) == 0.0
    assert float(fac.gamma) == 0.0
