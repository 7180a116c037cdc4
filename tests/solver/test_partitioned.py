"""Partitioned (SPIKE/Schur) block-tridiagonal factorization tests.

The accelerator-fast replacement for the sequential block-Thomas scan:
batched interior elimination over P partitions + a recursively factored
interface system (ops/block_tridiag.py). Must agree with the dense solve
and expose the exact inertia (block elimination is a congruence)."""

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


@pytest.mark.parametrize("K,w", [(50, 3), (64, 5), (101, 13), (1000, 9)])
def test_partitioned_solve_and_inertia(K, w):
    rng = np.random.default_rng(42)
    D = rng.standard_normal((K, w, w))
    D = D + np.swapaxes(D, 1, 2) + 10 * np.eye(w)
    D[::3] -= 18 * np.eye(w)  # make a third of the blocks indefinite
    E = rng.standard_normal((K - 1, w, w))
    b = rng.standard_normal((K, w))

    fac = jax.jit(bt.block_tridiag_factor_part)(
        jnp.asarray(D), jnp.asarray(E)
    )
    if K >= bt._PART_MIN_BLOCKS:
        assert isinstance(fac, bt.PartitionedFactor)
    x = np.asarray(jax.jit(bt.block_tridiag_solve_part)(fac, jnp.asarray(b)))

    M = _dense(D, E)
    xd = np.linalg.solve(M, b.reshape(-1))
    assert np.abs(x.reshape(-1) - xd).max() / np.abs(xd).max() < 1e-10

    ev = np.linalg.eigvalsh(M)
    pos, neg, zero = jax.jit(lambda f: bt.part_inertia(f, 1e-12))(fac)
    assert int(pos) == int((ev > 0).sum())
    assert int(neg) == int((ev < 0).sum())
    assert int(zero) == 0


def test_partitioned_recursion_depth():
    """K=1000 partitions ~32x32; the reduced 32-block system must use the
    sequential scan (below _PART_MIN_BLOCKS)."""
    rng = np.random.default_rng(0)
    K, w = 1000, 4
    D = rng.standard_normal((K, w, w))
    D = D + np.swapaxes(D, 1, 2) + 8 * np.eye(w)
    E = 0.1 * rng.standard_normal((K - 1, w, w))
    fac = bt.block_tridiag_factor_part(jnp.asarray(D), jnp.asarray(E))
    assert isinstance(fac, bt.PartitionedFactor)
    assert isinstance(fac.red, bt.BlockTridiagFactor)


def test_ipm_solves_with_partitioned_backend():
    """Force the partitioned path inside the IPM on CPU (flywheel-style
    OCP, K=81 stages > _PART_MIN_BLOCKS): same optimum as the scan path."""
    import sleipnir_tpu as slp
    from sleipnir_tpu import ExitStatus
    from sleipnir_tpu.optimization.solver import kkt_banded

    N = 80

    def flywheel(x, u):
        return (-x[0, 0] / 5.0 + 2.0 * u[0, 0]).reshape(1, 1)

    def build():
        ocp = slp.OCP(
            1, 1, 0.05, N, flywheel,
            slp.DynamicsType.EXPLICIT_ODE,
            slp.TimestepMethod.FIXED,
            slp.TranscriptionMethod.DIRECT_TRANSCRIPTION,
        )
        ocp.constrain_initial_state(np.array([[0.0]]))
        ocp.subject_to(ocp.U() >= -12.0)
        ocp.subject_to(ocp.U() <= 12.0)
        r = 10.0
        cost = ((ocp.X() - r) ** 2).sum()
        ocp.minimize(cost)
        return ocp

    ocp_scan = build()
    status = ocp_scan.solve()
    assert status == ExitStatus.SUCCESS

    orig = kkt_banded.BandedBackend.__init__

    def patched(self, *a, **kw):
        orig(self, *a, **kw)
        self.use_partitioned = True

    kkt_banded.BandedBackend.__init__ = patched
    try:
        ocp_part = build()
        backend = ocp_part._make_kkt_backend(
            ocp_part._compile(),
            __import__(
                "sleipnir_tpu.optimization.solver.options",
                fromlist=["Options"],
            ).Options(),
            jnp.float64,
        )
        assert backend.use_partitioned
        status = ocp_part.solve()
    finally:
        kkt_banded.BandedBackend.__init__ = orig
    assert status == ExitStatus.SUCCESS
    np.testing.assert_allclose(
        ocp_part.X().value(), ocp_scan.X().value(), atol=1e-6
    )
