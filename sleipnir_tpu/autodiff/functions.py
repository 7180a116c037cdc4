"""Autodiff math functions (reference autodiff/variable.hpp:391-714).

Each function accepts a Variable (scalar node), a VariableMatrix/VariableBlock
(one elementwise array node — finer-grained than the reference, which loops
cwise_transform), plain numbers, numpy arrays, or JAX tracers (so dynamics
functions written against this DSL also work when called with jnp arrays).
"""

from __future__ import annotations

import math

import numpy as np

from sleipnir_tpu.autodiff import expression as ex
from sleipnir_tpu.autodiff.variable import (
    Variable,
    VariableBlock,
    VariableMatrix,
    _NUMBER_TYPES,
)


def _apply_unary(op: str, np_fn, x):
    if isinstance(x, Variable):
        return Variable(ex.unary(op, x.expr))
    if isinstance(x, VariableBlock):
        x = x._as_matrix()
    if isinstance(x, VariableMatrix):
        return VariableMatrix._from_expr(ex.unary(op, x.expr))
    if isinstance(x, _NUMBER_TYPES) or isinstance(x, np.ndarray):
        return np_fn(np, x)
    # jnp tracers / arrays
    import jax.numpy as jnp  # noqa: PLC0415

    return np_fn(jnp, x)


def _apply_binary(op: str, np_fn, a, b):
    a_sym = isinstance(a, (Variable, VariableMatrix, VariableBlock))
    b_sym = isinstance(b, (Variable, VariableMatrix, VariableBlock))
    if a_sym or b_sym:
        from sleipnir_tpu.autodiff.variable import _any_operand  # noqa: PLC0415

        ae = _any_operand(a)
        be = _any_operand(b)
        out = ex.binary_nonlinear(op, ae, be)
        if out.shape == ():
            return Variable(out)
        return VariableMatrix._from_expr(out)
    if isinstance(a, _NUMBER_TYPES) and isinstance(b, _NUMBER_TYPES):
        return np_fn(np, a, b)
    import jax.numpy as jnp  # noqa: PLC0415

    return np_fn(jnp, a, b)


def _acc(xp, name, v):
    """f64-accurate trig on the JAX path (see ops/accurate_math.py)."""
    if xp is np:
        return getattr(np, name)(v)
    from sleipnir_tpu.ops import accurate_math  # noqa: PLC0415

    return getattr(accurate_math, name)(v)


def abs(x):  # noqa: A001
    return _apply_unary("abs", lambda xp, v: xp.abs(v), x)


def acos(x):
    return _apply_unary("acos", lambda xp, v: xp.arccos(v), x)


def asin(x):
    return _apply_unary("asin", lambda xp, v: xp.arcsin(v), x)


def atan(x):
    return _apply_unary("atan", lambda xp, v: xp.arctan(v), x)


def atan2(y, x):
    return _apply_binary("atan2", lambda xp, a, b: xp.arctan2(a, b), y, x)


def cbrt(x):
    return _apply_unary("cbrt", lambda xp, v: xp.cbrt(v), x)


def cos(x):
    return _apply_unary("cos", lambda xp, v: _acc(xp, "cos", v), x)


def cosh(x):
    return _apply_unary("cosh", lambda xp, v: xp.cosh(v), x)


def erf(x):
    def np_erf(xp, v):
        if xp is np:
            return np.vectorize(math.erf)(v)
        import jax.scipy.special as jsp  # noqa: PLC0415

        return jsp.erf(v)

    return _apply_unary("erf", np_erf, x)


def exp(x):
    return _apply_unary("exp", lambda xp, v: xp.exp(v), x)


def hypot(x, y):
    return _apply_binary("hypot", lambda xp, a, b: xp.hypot(a, b), x, y)


def log(x):
    return _apply_unary("log", lambda xp, v: xp.log(v), x)


def log10(x):
    return _apply_unary("log10", lambda xp, v: xp.log10(v), x)


def pow(base, power):  # noqa: A001
    """pow() building a QUADRATIC-tagged node for pow(linear, 2)
    (reference autodiff/expression.hpp:1740-1748)."""
    if isinstance(base, (Variable, VariableMatrix, VariableBlock)) and isinstance(
        power, _NUMBER_TYPES
    ):
        return base**power
    if isinstance(base, (Variable, VariableMatrix, VariableBlock)) or isinstance(
        power, (Variable, VariableMatrix, VariableBlock)
    ):
        return _apply_binary("pow_expr", lambda xp, a, b: a**b, base, power)
    return base**power


def sign(x):
    return _apply_unary("sign", lambda xp, v: xp.sign(v), x)


def sin(x):
    return _apply_unary("sin", lambda xp, v: _acc(xp, "sin", v), x)


def sinh(x):
    return _apply_unary("sinh", lambda xp, v: xp.sinh(v), x)


def sqrt(x):
    return _apply_unary("sqrt", lambda xp, v: xp.sqrt(v), x)


def tan(x):
    return _apply_unary("tan", lambda xp, v: _acc(xp, "tan", v), x)


def tanh(x):
    return _apply_unary("tanh", lambda xp, v: xp.tanh(v), x)


def hypot3(x, y, z):
    """Three-argument hypot (reference autodiff/variable.hpp hypot overload)."""
    return sqrt(pow(x, 2) + pow(y, 2) + pow(z, 2))


def min(a, b):  # noqa: A001
    return _apply_binary("minimum", lambda xp, x, y: xp.minimum(x, y), a, b)


def max(a, b):  # noqa: A001
    return _apply_binary("maximum", lambda xp, x, y: xp.maximum(x, y), a, b)
