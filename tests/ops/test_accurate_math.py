"""Accuracy tests for the f64 trig kernels (ops/accurate_math.py).

These exist because XLA:TPU's fused f64 sin/cos can silently degrade to
~1e-8 relative accuracy; the DSL lowers trig through our Cody-Waite +
fdlibm-polynomial implementation instead, which must match libm to ~1 ulp
on the whole range optimization iterates can reach.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sleipnir_tpu.ops import accurate_math as am


RANGES = [0.8, np.pi, 20.0, 1e3, 1e6]


@pytest.mark.parametrize("scale", RANGES)
def test_sin_cos_accuracy(scale):
    rng = np.random.default_rng(int(scale) % 7919)
    x = rng.uniform(-scale, scale, size=4096)
    # include exact multiples of pi/2 neighborhoods
    x = np.concatenate([x, np.pi / 2 * np.arange(-8, 9) + 1e-13])
    s = np.asarray(am.sin(jnp.asarray(x)))
    c = np.asarray(am.cos(jnp.asarray(x)))
    np.testing.assert_allclose(s, np.sin(x), rtol=0, atol=4e-15)
    np.testing.assert_allclose(c, np.cos(x), rtol=0, atol=4e-15)


def test_tan_accuracy():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1.5, 1.5, size=2048)
    t = np.asarray(am.tan(jnp.asarray(x)))
    np.testing.assert_allclose(t, np.tan(x), rtol=5e-14, atol=1e-15)


def test_derivatives_through_custom_jvp():
    x = jnp.asarray(0.7)
    assert float(jax.grad(am.sin)(x)) == pytest.approx(np.cos(0.7), abs=1e-15)
    assert float(jax.grad(am.cos)(x)) == pytest.approx(-np.sin(0.7), abs=1e-15)
    # second derivative (reverse-over-reverse like the Hessian driver)
    assert float(jax.grad(jax.grad(am.sin))(x)) == pytest.approx(
        -np.sin(0.7), abs=1e-15
    )
    # forward-over-reverse (the HVP pattern used by the banded backend)
    g = jax.grad(lambda v: am.sin(v).sum())
    _, hvp = jax.jvp(g, (jnp.asarray(np.array([0.3, 1.9])),), (jnp.ones(2),))
    np.testing.assert_allclose(
        np.asarray(hvp), -np.sin([0.3, 1.9]), atol=1e-15
    )


def test_vmap_and_jit():
    x = np.linspace(-10, 10, 257)
    out = jax.jit(jax.vmap(am.sin))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.sin(x), atol=4e-15)


def test_float32_fallthrough():
    x = jnp.asarray(np.float32(1.3))
    assert np.asarray(am.sin(x)).dtype == np.float32
