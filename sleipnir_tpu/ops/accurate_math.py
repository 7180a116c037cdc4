"""Guaranteed-f64 transcendentals for the TPU compute path.

Measurement on the target hardware (TPU v5e, f64 emulation) shows XLA's
fused f64 `cos`/`sin` can silently drop to ~1e-8 relative accuracy in some
program contexts (rank-0 operands; sin/cos pairs inside derivative
fusions), while f64 add/mul/div stay at ~1e-15. An interior-point solve
needs ~1e-12-accurate constraint Jacobians to reach the reference's 1e-8
KKT tolerance (reference solver/options.hpp:15), so the DSL lowers sin/cos
through these implementations instead: Cody-Waite argument reduction plus
the fdlibm kernel polynomials, built only from exact-on-TPU primitives.
The same code path runs on CPU, which also makes solver trajectories
deterministic across backends.

Accuracy: ~1 ulp for |x| ≤ ~2^20 (covering any sane optimization iterate;
inputs beyond that reduce with error ~|x|·4e-28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 2/π and the Cody-Waite split of π/2 (fdlibm constants)
_INV_PIO2 = 6.36619772367581382433e-01
_PIO2_1 = 1.57079632673412561417e00  # first 33 bits of π/2
_PIO2_1T = 6.07710050650619224932e-11  # π/2 − PIO2_1
_PIO2_2T = 2.02226624879595063154e-21  # next correction term

# fdlibm __kernel_sin coefficients on [-π/4, π/4]
_S1 = -1.66666666666666324348e-01
_S2 = 8.33333333332248946124e-03
_S3 = -1.98412698298579493134e-04
_S4 = 2.75573137070700676789e-06
_S5 = -2.50507602534068634195e-08
_S6 = 1.58969099521155010221e-10

# fdlibm __kernel_cos coefficients
_C1 = 4.16666666666666019037e-02
_C2 = -1.38888888888741095749e-03
_C3 = 2.48015872894767294178e-05
_C4 = -2.75573143513906633035e-07
_C5 = 2.08757232129817482790e-09
_C6 = -1.13596475577881948265e-11


def _reduce(x):
    """x = k·(π/2) + r with |r| ≤ π/4 + ulp; returns (r, n=k mod 4)."""
    k = jnp.round(x * _INV_PIO2)
    # Three-term compensated subtraction: exact while |k| < 2^27.
    r = x - k * _PIO2_1
    r = r - k * _PIO2_1T
    r = r - k * _PIO2_2T
    n = k - 4.0 * jnp.floor(k * 0.25)
    return r, n


def _kernel_sin(r):
    z = r * r
    p = _S6
    for c in (_S5, _S4, _S3, _S2, _S1):
        p = p * z + c
    return r + r * z * p


def _kernel_cos(r):
    z = r * r
    p = _C6
    for c in (_C5, _C4, _C3, _C2, _C1):
        p = p * z + c
    return 1.0 - 0.5 * z + z * z * p


def _sin_impl(x):
    r, n = _reduce(x)
    s, c = _kernel_sin(r), _kernel_cos(r)
    return jnp.where(
        n == 0.0, s, jnp.where(n == 1.0, c, jnp.where(n == 2.0, -s, -c))
    )


def _cos_impl(x):
    r, n = _reduce(x)
    s, c = _kernel_sin(r), _kernel_cos(r)
    return jnp.where(
        n == 0.0, c, jnp.where(n == 1.0, -s, jnp.where(n == 2.0, -c, s))
    )


@jax.custom_jvp
def sin(x):
    """f64-accurate sine (falls through to jnp.sin for sub-f64 dtypes)."""
    x = jnp.asarray(x)
    if x.dtype != jnp.float64:
        return jnp.sin(x)
    return _sin_impl(x)


@jax.custom_jvp
def cos(x):
    """f64-accurate cosine (falls through to jnp.cos for sub-f64 dtypes)."""
    x = jnp.asarray(x)
    if x.dtype != jnp.float64:
        return jnp.cos(x)
    return _cos_impl(x)


@sin.defjvp
def _sin_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return sin(x), cos(x) * dx


@cos.defjvp
def _cos_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return cos(x), -sin(x) * dx


def tan(x):
    """Tangent via the accurate sin/cos pair (≤2 ulp)."""
    return sin(x) / cos(x)


def dispatch(xp, name: str, a):
    """numpy-vs-jax dispatch for the expression evaluator: plain numpy on
    the host path, the accurate kernels under jax tracing."""
    if xp is np:
        return getattr(np, name)(a)
    return {"sin": sin, "cos": cos, "tan": tan}[name](a)
