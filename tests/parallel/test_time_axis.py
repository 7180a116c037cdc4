"""Time-axis sharded KKT solve: correctness on an 8-device mesh and the
presence of real collectives in the compiled program (VERDICT r3 task 5:
the dryrun must exercise the sharded factorization itself, not a
device_put of inputs feeding a sequential solve)."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sleipnir_tpu.parallel.time_axis import (
    pad_to_devices,
    sharded_block_tridiag_solve,
)


def _system(K, w, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((K, w, w))
    D = D + np.swapaxes(D, 1, 2) + 10 * np.eye(w)
    D[::3] -= 18 * np.eye(w)
    E = rng.standard_normal((K - 1, w, w))
    b = rng.standard_normal((K, w))
    return D, E, b


def _dense_solution(D, E, b):
    K, w, _ = D.shape
    M = np.zeros((K * w, K * w))
    for k in range(K):
        M[k * w:(k + 1) * w, k * w:(k + 1) * w] = D[k]
        if k + 1 < K:
            M[(k + 1) * w:(k + 2) * w, k * w:(k + 1) * w] = E[k]
            M[k * w:(k + 1) * w, (k + 1) * w:(k + 2) * w] = E[k].T
    return np.linalg.solve(M, b.reshape(-1))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_solve_matches_dense(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    K, w = 101, 9
    D, E, b = _system(K, w)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("t",))
    Dp, Ep, bp, K0 = pad_to_devices(
        jnp.asarray(D), jnp.asarray(E), jnp.asarray(b), n_dev
    )
    x = np.asarray(sharded_block_tridiag_solve(mesh, "t", Dp, Ep, bp))[:K0]
    xd = _dense_solution(D, E, b)
    assert np.abs(x.reshape(-1) - xd).max() / np.abs(xd).max() < 1e-10


def test_sharded_solve_contains_collectives():
    """The compiled program must actually communicate — a solve that
    gathers everything to one device would pass the numeric check."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual device mesh")
    K, w = 64, 5
    D, E, b = _system(K, w)
    mesh = Mesh(np.array(jax.devices()[:8]), ("t",))
    Dp, Ep, bp, _ = pad_to_devices(
        jnp.asarray(D), jnp.asarray(E), jnp.asarray(b), 8
    )
    f = jax.jit(
        lambda D_, E_, b_: sharded_block_tridiag_solve(mesh, "t", D_, E_, b_)
    )
    txt = f.lower(Dp, Ep, bp).as_text()
    ops = set(re.findall(r"stablehlo\.(all_gather|collective_permute)", txt))
    assert "all_gather" in ops
    assert "collective_permute" in ops


def test_factor_solve_split_with_pivots():
    """Round-5 split: sharded_factor exposes pivots whose Sylvester count
    matches the dense eigenvalue signs; sharded_solve reuses the factor."""
    from sleipnir_tpu.parallel.time_axis import (
        sharded_factor,
        sharded_inertia,
        sharded_solve,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs virtual device mesh")
    K, w = 101, 9
    D, E, b = _system(K, w)
    mesh = Mesh(np.array(jax.devices()[:8]), ("t",))
    Dp, Ep, bp, K0 = pad_to_devices(
        jnp.asarray(D), jnp.asarray(E), jnp.asarray(b), 8
    )
    fac = sharded_factor(mesh, "t", Dp, Ep, k_orig=K0)
    x = np.asarray(sharded_solve(mesh, "t", fac, bp))[:K0]
    xd = _dense_solution(D, E, b)
    assert np.abs(x.reshape(-1) - xd).max() / np.abs(xd).max() < 1e-10

    M = np.zeros((K * w, K * w))
    for k in range(K):
        M[k * w:(k + 1) * w, k * w:(k + 1) * w] = D[k]
        if k + 1 < K:
            M[(k + 1) * w:(k + 2) * w, k * w:(k + 1) * w] = E[k]
            M[k * w:(k + 1) * w, (k + 1) * w:(k + 2) * w] = E[k].T
    ev = np.linalg.eigvalsh(M)
    pos, neg, zero = sharded_inertia(fac, 1e-12)
    assert int(pos) == int((ev > 0).sum())
    assert int(neg) == int((ev < 0).sum())
    assert int(zero) == 0


def test_ipm_solves_through_time_axis_mesh():
    """End-to-end: the IPM's banded backend runs its factorization and
    solves through the sharded SPIKE path when a time-axis mesh is set
    (VERDICT r4 task 3: the solver path, not a standalone kernel)."""
    import sleipnir_tpu as slp
    from sleipnir_tpu import ExitStatus

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    N = 40

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
        ocp.minimize(((ocp.X() - 10.0) ** 2).sum())
        return ocp

    ref = build()
    assert ref.solve() == ExitStatus.SUCCESS

    sharded = build()
    mesh = Mesh(np.array(jax.devices()[:4]), ("t",))
    sharded.set_time_axis_mesh(mesh, "t")
    backend = sharded._make_kkt_backend(
        sharded._compile(),
        __import__(
            "sleipnir_tpu.optimization.solver.options", fromlist=["Options"]
        ).Options(),
        jnp.float64,
    )
    assert backend.mesh is mesh
    assert sharded.solve() == ExitStatus.SUCCESS
    np.testing.assert_allclose(
        sharded.X().value(), ref.X().value(), atol=1e-6
    )
