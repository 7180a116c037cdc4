"""Autodiff layer: expression DAG, Variable DSL, and derivative drivers.

Replaces reference include/sleipnir/autodiff/ (expression graph + reverse
sweeps) with an array-level DAG compiled into JAX functions.
"""

from sleipnir_tpu.autodiff.drivers import Gradient, Hessian, Jacobian
from sleipnir_tpu.autodiff.expression_type import ExpressionType
from sleipnir_tpu.autodiff.functions import (
    abs,  # noqa: A004
    acos,
    asin,
    atan,
    atan2,
    cbrt,
    cos,
    cosh,
    erf,
    exp,
    hypot,
    log,
    log10,
    max,  # noqa: A004
    min,  # noqa: A004
    pow,  # noqa: A004
    sign,
    sin,
    sinh,
    sqrt,
    tan,
    tanh,
)
from sleipnir_tpu.autodiff.variable import (
    EqualityConstraints,
    InequalityConstraints,
    Variable,
    VariableBlock,
    VariableMatrix,
    block,
    bounds,
    cwise_reduce,
    solve,
)

__all__ = [
    "EqualityConstraints",
    "ExpressionType",
    "Gradient",
    "Hessian",
    "InequalityConstraints",
    "Jacobian",
    "Variable",
    "VariableBlock",
    "VariableMatrix",
    "abs",
    "acos",
    "asin",
    "atan",
    "atan2",
    "block",
    "bounds",
    "cbrt",
    "cos",
    "cosh",
    "cwise_reduce",
    "erf",
    "exp",
    "hypot",
    "log",
    "log10",
    "max",
    "min",
    "pow",
    "sign",
    "sin",
    "sinh",
    "solve",
    "sqrt",
    "tan",
    "tanh",
]
