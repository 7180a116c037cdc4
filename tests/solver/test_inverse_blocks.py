"""Explicit-inverse (substitution-free) factorization tests.

The round-5 TPU latency path: sweep-operator block inverses with
LDLT-equivalent pivots, the inverse-carrying scan, and the partitioned
factorization whose solves are pure batched matmuls
(ops/block_tridiag.py "Explicit-inverse" section). Must agree with the
dense solve and expose the exact inertia."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sleipnir_tpu.ops import block_tridiag as bt



def _dense(D, E):
    K, w, _ = D.shape
    M = np.zeros((K * w, K * w))
    for k in range(K):
        M[k * w:(k + 1) * w, k * w:(k + 1) * w] = D[k]
        if k + 1 < K:
            M[(k + 1) * w:(k + 2) * w, k * w:(k + 1) * w] = E[k]
            M[k * w:(k + 1) * w, (k + 1) * w:(k + 2) * w] = E[k].T
    return M


@pytest.mark.parametrize("w", [1, 2, 3, 5, 13])
def test_inv_pivots_matches_inverse_and_ldlt(w):
    rng = np.random.default_rng(3)
    A = rng.standard_normal((w, w))
    A = A + A.T + 4.0 * np.eye(w)
    if w >= 3:
        A[1, 1] -= 9.0  # indefinite
    T, d = jax.jit(bt._inv_pivots)(jnp.asarray(A))
    np.testing.assert_allclose(
        np.asarray(T), np.linalg.inv(A), rtol=0, atol=1e-11
    )
    # Pivots are the unpivoted-LDLT pivots: ratios of leading minors
    minors = [np.linalg.det(A[: k + 1, : k + 1]) for k in range(w)]
    expect = [minors[0]] + [
        minors[k] / minors[k - 1] for k in range(1, w)
    ]
    np.testing.assert_allclose(np.asarray(d), expect, rtol=1e-9)
    ev = np.linalg.eigvalsh(A)
    assert int((np.asarray(d) > 0).sum()) == int((ev > 0).sum())


@pytest.mark.parametrize("K,w", [(5, 3), (23, 4), (50, 3), (101, 13)])
def test_factor_inv_scan_solve_and_inertia(K, w):
    rng = np.random.default_rng(42)
    D = rng.standard_normal((K, w, w))
    D = D + np.swapaxes(D, 1, 2) + 10 * np.eye(w)
    D[::3] -= 18 * np.eye(w)
    E = rng.standard_normal((K - 1, w, w))
    b = rng.standard_normal((K, w))

    fac = jax.jit(bt.block_tridiag_factor_inv)(jnp.asarray(D), jnp.asarray(E))
    x = np.asarray(
        jax.jit(bt.block_tridiag_solve_inv)(fac, jnp.asarray(b))
    )
    M = _dense(D, E)
    xd = np.linalg.solve(M, b.reshape(-1))
    assert np.abs(x.reshape(-1) - xd).max() / np.abs(xd).max() < 1e-9

    ev = np.linalg.eigvalsh(M)
    pos, neg, zero = jax.jit(lambda f: bt.inv_part_inertia(f, 1e-12))(fac)
    assert int(pos) == int((ev > 0).sum())
    assert int(neg) == int((ev < 0).sum())
    assert int(zero) == 0


@pytest.mark.parametrize("K,w", [(50, 3), (64, 5), (101, 13), (1000, 9)])
def test_partitioned_inv_solve_and_inertia(K, w):
    rng = np.random.default_rng(42)
    D = rng.standard_normal((K, w, w))
    D = D + np.swapaxes(D, 1, 2) + 10 * np.eye(w)
    D[::3] -= 18 * np.eye(w)
    E = rng.standard_normal((K - 1, w, w))
    b = rng.standard_normal((K, w))

    fac = jax.jit(bt.block_tridiag_factor_part_inv)(
        jnp.asarray(D), jnp.asarray(E)
    )
    if K >= bt._PART_INV_MIN_BLOCKS:
        assert isinstance(fac, bt.PartitionedFactorInv)
    x = np.asarray(
        jax.jit(bt.block_tridiag_solve_part_inv)(fac, jnp.asarray(b))
    )
    M = _dense(D, E)
    xd = np.linalg.solve(M, b.reshape(-1))
    assert np.abs(x.reshape(-1) - xd).max() / np.abs(xd).max() < 1e-9

    ev = np.linalg.eigvalsh(M)
    pos, neg, zero = jax.jit(lambda f: bt.inv_part_inertia(f, 1e-12))(fac)
    assert int(pos) == int((ev > 0).sum())
    assert int(neg) == int((ev < 0).sum())
    assert int(zero) == 0


def test_partitioned_inv_multilevel_recursion():
    """K large enough that the reduced system partitions again."""
    rng = np.random.default_rng(0)
    K, w = 5000, 3
    D = rng.standard_normal((K, w, w))
    D = D + np.swapaxes(D, 1, 2) + 8 * np.eye(w)
    E = 0.1 * rng.standard_normal((K - 1, w, w))
    b = rng.standard_normal((K, w))
    fac = bt.block_tridiag_factor_part_inv(jnp.asarray(D), jnp.asarray(E))
    assert isinstance(fac, bt.PartitionedFactorInv)
    assert isinstance(fac.red, bt.PartitionedFactorInv)  # 157 blocks
    x = np.asarray(bt.block_tridiag_solve_part_inv(fac, jnp.asarray(b)))
    # residual check (dense solve at 15000x15000 is too slow for the tier)
    r = np.array(
        jnp.einsum("kab,kb->ka", jnp.asarray(D), jnp.asarray(x))
    )
    r[1:] += np.einsum("kab,kb->ka", E, x[:-1])
    r[:-1] += np.einsum("kba,kb->ka", E, x[1:])
    assert np.abs(r - b).max() / np.abs(b).max() < 1e-8

    pivots = bt.inv_part_pivots(fac)
    assert sum(int(np.asarray(p).size) for p in pivots) >= K * w


def test_sweep_inv_zero_pivot_graceful():
    """A singular block must produce finite output and a ~zero pivot, not
    NaNs (the regularization loop keys off pivot magnitudes)."""
    A = jnp.asarray(np.diag([1.0, 0.0, 2.0]))
    T, d = bt._inv_pivots_sweep(A)
    assert np.all(np.isfinite(np.asarray(T)))
    assert abs(float(d[1])) < 1e-12
