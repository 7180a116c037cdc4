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
