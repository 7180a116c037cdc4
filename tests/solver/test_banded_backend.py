"""BandedBackend vs DenseBackend equivalence on a real OCP.

The banded backend (colored-probe derivatives + block-tridiagonal LDLᵀ) is
what large direct-transcription OCPs use — and on the real TPU it runs the
block-cyclic-reduction factorization. These tests pin it step-for-step to
the dense backend on a small cart-pole problem so any structural bug is
caught on CPU before touching hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import sleipnir_tpu as slp
from sleipnir_tpu.models.cart_pole import cart_pole_problem
from sleipnir_tpu.optimization.solver import kkt_banded
from sleipnir_tpu.optimization.solver.funcs import ScalingArrays, bind
from sleipnir_tpu.optimization.solver.kkt_backend import DenseBackend
from sleipnir_tpu.optimization.solver.kkt_banded import BandedBackend
from sleipnir_tpu.optimization.solver.options import Options


@pytest.fixture(scope="module")
def small_ocp():
    problem, X, U = cart_pole_problem(N=8, total_time=1.0)
    comp, cached = problem.prepare_ipm(Options())
    backend = cached[-1]
    assert isinstance(backend, BandedBackend), type(backend)
    funcs = cached[3]
    return problem, comp, funcs, backend


def _bound(comp, funcs):
    params = comp["compiled"].gather_params()
    sc = ScalingArrays(
        f=jnp.asarray(1.0),
        c_e=jnp.ones(comp["me"]),
        c_i=jnp.ones(comp["mi"]),
    )
    return bind(funcs, jnp.asarray(params), sc)


def test_banded_derivs_match_dense(small_ocp):
    problem, comp, funcs, banded = small_ocp
    n, me, mi = comp["n"], comp["me"], comp["mi"]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(n) * 0.3)
    y = jnp.asarray(rng.standard_normal(me))
    z = jnp.asarray(np.abs(rng.standard_normal(mi)) + 0.1)
    F = _bound(comp, funcs)

    dense = DenseBackend(n, me, mi, jnp.float64)
    dd = dense.eval_derivs(F, x, y, z)
    bd = banded.eval_derivs(F, x, y, z)
    Hb, Aeb, Aib = banded.dense(bd)

    np.testing.assert_allclose(Hb, np.asarray(dd.H), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(Aeb, np.asarray(dd.A_e), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(Aib, np.asarray(dd.A_i), rtol=1e-9, atol=1e-9)

    # matvec parity
    ve = jnp.asarray(rng.standard_normal(me))
    vi = jnp.asarray(rng.standard_normal(mi))
    u = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(
        np.asarray(banded.AeT(bd, ve)), np.asarray(dense.AeT(dd, ve)),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(banded.Ae(bd, u)), np.asarray(dense.Ae(dd, u)),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(banded.AiT(bd, vi)), np.asarray(dense.AiT(dd, vi)),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(banded.Ai(bd, u)), np.asarray(dense.Ai(dd, u)),
        rtol=1e-9, atol=1e-9,
    )


def test_banded_factor_solve_matches_dense(small_ocp):
    problem, comp, funcs, banded = small_ocp
    n, me, mi = comp["n"], comp["me"], comp["mi"]
    rng = np.random.default_rng(11)
    # Interior-ish point: x near guess, positive slacks/duals
    x = jnp.asarray(rng.standard_normal(n) * 0.1)
    y = jnp.asarray(rng.standard_normal(me) * 0.1)
    z = jnp.asarray(np.abs(rng.standard_normal(mi)) + 0.5)
    s = jnp.asarray(np.abs(rng.standard_normal(mi)) + 0.5)
    sigma = z / s
    F = _bound(comp, funcs)

    dense = DenseBackend(n, me, mi, jnp.float64)
    dd = dense.eval_derivs(F, x, y, z)
    bd = banded.eval_derivs(F, x, y, z)

    rhs_top = jnp.asarray(rng.standard_normal(n))
    rhs_bottom = jnp.asarray(rng.standard_normal(me))

    fd = dense.factor(dd, sigma, jnp.asarray(0.0), 1e-10)
    fb = banded.factor(bd, sigma, jnp.asarray(0.0), 1e-10)
    assert bool(fd.ok) and bool(fb.ok)
    # Same regularization chosen (same inertia signals)
    np.testing.assert_allclose(float(fb.delta), float(fd.delta))
    np.testing.assert_allclose(float(fb.gamma), float(fd.gamma))

    # Both refined solves must satisfy the REGULARIZED KKT system they
    # actually factored (comparing the two solutions to each other would
    # only pin two roundoff paths together; on this deliberately
    # ill-conditioned random point the meaningful property is a small
    # backward residual for each).
    delta, gamma = np.asarray(fd.delta), np.asarray(fd.gamma)
    H = np.asarray(dd.H)
    Ae = np.asarray(dd.A_e)
    Ai = np.asarray(dd.A_i)
    TL = (
        H
        + Ai.T @ (np.asarray(sigma)[:, None] * Ai)
        + delta * np.eye(n)
    )
    KKT = np.zeros((n + me, n + me))
    KKT[:n, :n] = TL
    KKT[:n, n:] = Ae.T
    KKT[n:, :n] = Ae
    KKT[n:, n:] = -gamma * np.eye(me)
    rhs = np.concatenate([np.asarray(rhs_top), np.asarray(rhs_bottom)])
    rhs_norm = np.linalg.norm(rhs)

    for backend_name, (px, py) in {
        "dense": dense.solve_refined(dd, sigma, fd, rhs_top, rhs_bottom),
        "banded": banded.solve_refined(bd, sigma, fb, rhs_top, rhs_bottom),
    }.items():
        sol = np.concatenate([np.asarray(px), -np.asarray(py)])
        resid = np.linalg.norm(KKT @ sol - rhs) / rhs_norm
        assert resid < 1e-8, (backend_name, resid)


def test_bcr_full_solve_matches_thomas(monkeypatch):
    """Force the TPU factorization (BCR) on CPU: the complete cart-pole
    solve must converge to the same optimum as the default scan path."""
    problem_a, Xa, Ua = cart_pole_problem(N=24, total_time=5.0)
    status_a = problem_a.solve()
    assert status_a == slp.ExitStatus.SUCCESS

    monkeypatch.setattr(kkt_banded, "_use_bcr", lambda num_stages: True)
    problem_b, Xb, Ub = cart_pole_problem(N=24, total_time=5.0)
    backend = problem_b.prepare_ipm(Options())[1][-1]
    assert backend.use_bcr
    status_b = problem_b.solve()
    assert status_b == slp.ExitStatus.SUCCESS

    np.testing.assert_allclose(
        Xb.value(), Xa.value(), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        Ub.value(), Ua.value(), rtol=1e-5, atol=1e-5
    )
