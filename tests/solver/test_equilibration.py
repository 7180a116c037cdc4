"""Ruiz equilibration invariants (kkt_banded._equilibrate): it is a
congruence, so inertia is preserved exactly, solutions are recoverable
through the scaling, and row/col magnitudes compress to O(1)."""

import numpy as np

import jax
import jax.numpy as jnp

from sleipnir_tpu.optimization.solver.kkt_banded import _equilibrate


def _dense(D, E):
    K, w, _ = D.shape
    M = np.zeros((K * w, K * w))
    for k in range(K):
        M[k * w:(k + 1) * w, k * w:(k + 1) * w] = D[k]
        if k + 1 < K:
            M[(k + 1) * w:(k + 2) * w, k * w:(k + 1) * w] = E[k]
            M[k * w:(k + 1) * w, (k + 1) * w:(k + 2) * w] = E[k].T
    return M


def test_equilibrate_congruence_and_range():
    rng = np.random.default_rng(7)
    K, w = 20, 6
    # Badly scaled rows (milder than the 1e12-spread mid-solve regime so
    # the f64 eigensolver used as the inertia oracle stays trustworthy on
    # the UNSCALED matrix; the production-scale robustness is covered by
    # the solver-level tests)
    scales = 10.0 ** rng.uniform(-2, 2, (K, w))
    D = rng.standard_normal((K, w, w))
    D = (D + np.swapaxes(D, 1, 2)) * scales[:, :, None] * scales[:, None, :]
    E = rng.standard_normal((K - 1, w, w)) * (
        scales[1:, :, None] * scales[:-1, None, :]
    )
    Ds, Es, s = jax.jit(_equilibrate)(jnp.asarray(D), jnp.asarray(E))
    Ds, Es, s = np.asarray(Ds), np.asarray(Es), np.asarray(s)

    # 1. The scaled matrix is exactly S M S
    M = _dense(D, E)
    S = np.diag(s.reshape(-1))
    assert np.allclose(_dense(Ds, Es), S @ M @ S, rtol=1e-12, atol=1e-12)

    # 2. Inertia preserved (congruence)
    ev = np.linalg.eigvalsh(M)
    evs = np.linalg.eigvalsh(_dense(Ds, Es))
    assert (ev > 0).sum() == (evs > 0).sum()
    assert (ev < 0).sum() == (evs < 0).sum()

    # 3. Magnitudes compressed to O(1): every row's inf-norm in [1/16, 4]
    Ms = _dense(Ds, Es)
    rn = np.abs(Ms).max(axis=1)
    assert rn.max() <= 4.0
    assert rn.min() >= 1.0 / 16.0


def test_equilibrate_zero_rows_are_safe():
    D = jnp.zeros((3, 4, 4))
    E = jnp.zeros((2, 4, 4))
    Ds, Es, s = _equilibrate(D, E)
    assert np.all(np.asarray(s) == 1.0)
    assert np.all(np.asarray(Ds) == 0.0)


def test_variable_block_sum():
    import sleipnir_tpu as slp

    problem = slp.Problem()
    X = problem.decision_variable(2, 5)
    X.set_value(np.arange(10.0).reshape(2, 5))
    row_sum = X[0, :].sum()  # VariableBlock.sum
    assert float(row_sum.value()) == np.arange(5.0).sum()
