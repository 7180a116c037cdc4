"""Pallas double-float banded factor/solve kernels (interpret mode on
CPU; the same kernels compile for the TPU where they run the whole
factorization in one program — ops/pallas_banded.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sleipnir_tpu.ops import dd
from sleipnir_tpu.ops import pallas_banded as pb



def _dense(D, E):
    K, w, _ = D.shape
    M = np.zeros((K * w, K * w))
    for k in range(K):
        M[k * w:(k + 1) * w, k * w:(k + 1) * w] = D[k]
        if k + 1 < K:
            M[(k + 1) * w:(k + 2) * w, k * w:(k + 1) * w] = E[k]
            M[k * w:(k + 1) * w, (k + 1) * w:(k + 2) * w] = E[k].T
    return M


def test_dd_arithmetic_vs_f64():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000)
    b = rng.standard_normal(1000) * 10.0 ** rng.uniform(-6, 6, 1000)
    ah, al = dd.from_f64(jnp.asarray(a))
    bh, bl = dd.from_f64(jnp.asarray(b))
    for f, ref in [
        (dd.add2, a + b),
        (dd.sub2, a - b),
        (dd.mul2, a * b),
        (dd.div2, a / b),
    ]:
        out = np.asarray(dd.to_f64(*f(ah, al, bh, bl)))
        rel = np.max(np.abs(out - ref) / np.maximum(np.abs(ref), 1e-30))
        assert rel < 1e-11, rel


@pytest.mark.parametrize("K,w", [(1, 4), (7, 3), (25, 5), (40, 13)])
def test_pallas_factor_solve_and_inertia(K, w):
    rng = np.random.default_rng(42)
    D = rng.standard_normal((K, w, w))
    D = D + np.swapaxes(D, 1, 2) + 10 * np.eye(w)
    D[::3] -= 18 * np.eye(w)
    E = rng.standard_normal((max(K - 1, 0), w, w))
    b = rng.standard_normal((K, w))

    fac = pb.pallas_banded_factor(jnp.asarray(D), jnp.asarray(E))
    x = np.asarray(pb.pallas_banded_solve(fac, jnp.asarray(b)))
    M = _dense(D, E)
    xd = np.linalg.solve(M, b.reshape(-1))
    assert np.abs(x.reshape(-1) - xd).max() / np.abs(xd).max() < 1e-11

    d = np.asarray(pb.pallas_pivots(fac))
    ev = np.linalg.eigvalsh(M)
    assert int((d > 1e-12).sum()) == int((ev > 0).sum())
    assert int((d < -1e-12).sum()) == int((ev < 0).sum())


def test_pallas_backward_stability_on_ipm_like_chain():
    """Quasidefinite stage blocks with tiny Hessian diagonals and near
    rank-deficient within-stage Jacobians — the structure that broke the
    explicit-inverse path (cond(S_k) ~ 1e9). The pivoted dd chain must
    keep the residual refinement-recoverable."""
    rng = np.random.default_rng(3)
    K, m, p = 40, 5, 8
    w = m + p
    D = np.zeros((K, w, w))
    E = np.zeros((K - 1, w, w))
    for k in range(K):
        A = rng.standard_normal((p, m))
        H = 1e-4 * np.eye(m)
        D[k, :m, :m] = H
        D[k, :m, m:] = A.T
        D[k, m:, :m] = A
        D[k, m:, m:] = -1e-10 * np.eye(p)
        if k + 1 < K:
            E[k, :m, :m] = 0.01 * rng.standard_normal((m, m))
            E[k, m:, :m] = rng.standard_normal((p, m))
    b = rng.standard_normal((K, w))
    fac = pb.pallas_banded_factor(jnp.asarray(D), jnp.asarray(E))
    x = np.asarray(pb.pallas_banded_solve(fac, jnp.asarray(b)))
    r = np.einsum("kab,kb->ka", D, x)
    r[1:] += np.einsum("kab,kb->ka", E, x[:-1])
    r[:-1] += np.einsum("kba,kb->ka", E, x[1:])
    rel = np.abs(r - b).max() / np.abs(b).max()
    # The UNequilibrated synthetic chain here is harsher than anything
    # the solver feeds the kernel (callers Ruiz-equilibrate first).
    # "Refinement-recoverable" means contraction << 1: on the real
    # equilibrated cart-pole chain (pivot spread 1e-9..5e9) the measured
    # per-pass contraction is ~1e-10 (raw resid 3.35 -> 3.3e-10 ->
    # 1.1e-11 over two passes, round-5 measurement).
    assert rel < 1e-3, rel


def test_pallas_vmap_ladder():
    """The regularization ladder vmaps the factorization over candidate
    regularizations — vmap of the pallas_call must hold."""
    rng = np.random.default_rng(5)
    C, K, w = 3, 9, 4
    D = rng.standard_normal((C, K, w, w))
    D = D + np.swapaxes(D, 2, 3) + 8 * np.eye(w)
    E = rng.standard_normal((K - 1, w, w))
    b = rng.standard_normal((K, w))

    def solve_one(Dc):
        fac = pb.pallas_banded_factor(Dc, jnp.asarray(E))
        return pb.pallas_banded_solve(fac, jnp.asarray(b))

    xs = np.asarray(jax.vmap(solve_one)(jnp.asarray(D)))
    for c in range(C):
        xd = np.linalg.solve(_dense(D[c], E), b.reshape(-1))
        assert np.abs(xs[c].reshape(-1) - xd).max() < 1e-9


def test_pallas_chunked_matches_single_shot():
    """The chunked-grid kernels (scratch-carried Schur/solve recursions,
    streamed stage blocks) must agree with the single-shot path."""
    from sleipnir_tpu.ops import pallas_banded as pbm

    rng = np.random.default_rng(11)
    K, w = 150, 4
    D = rng.standard_normal((K, w, w))
    D = D + np.swapaxes(D, 1, 2) + 10 * np.eye(w)
    D[::4] -= 18 * np.eye(w)
    E = rng.standard_normal((K - 1, w, w))
    b = rng.standard_normal((K, w))

    fac = pb.pallas_banded_factor(jnp.asarray(D), jnp.asarray(E))
    x_ref = np.asarray(pb.pallas_banded_solve(fac, jnp.asarray(b)))
    d_ref = np.asarray(pb.pallas_pivots(fac))

    old_max, old_chunk = pbm._SINGLE_SHOT_MAX_BYTES, pbm._CHUNK
    pbm._SINGLE_SHOT_MAX_BYTES, pbm._CHUNK = 1, 64  # force 3 chunks, pad
    jax.clear_caches()  # the wrappers are jitted; same shapes would hit
    try:
        fac_c = pb.pallas_banded_factor(jnp.asarray(D), jnp.asarray(E))
        x_c = np.asarray(pb.pallas_banded_solve(fac_c, jnp.asarray(b)))
        d_c = np.asarray(pb.pallas_pivots(fac_c))
    finally:
        pbm._SINGLE_SHOT_MAX_BYTES, pbm._CHUNK = old_max, old_chunk
        jax.clear_caches()
    assert fac_c.LUh.shape[0] == 192  # padded to the chunk multiple
    assert d_c.shape == d_ref.shape  # padding excluded from pivots
    # The paths produce different (hi, lo) decompositions of equal
    # values, and the chain amplifies those representation differences,
    # so compare each against the dense f64 oracle rather than bitwise.
    xd = np.linalg.solve(_dense(D, E), b.reshape(-1)).reshape(K, w)
    # unrefined dd solves; the chain amplifies ~1e-14 per-op error
    assert np.abs(x_c - xd).max() / np.abs(xd).max() < 1e-7
    assert np.abs(x_ref - xd).max() / np.abs(xd).max() < 1e-7
    assert ((d_c > 0) == (d_ref > 0)).all()
    np.testing.assert_allclose(d_c, d_ref, rtol=1e-6)
