"""sleipnir_tpu — a TPU-native nonlinear-program solver framework in JAX.

A brand-new implementation of the capability set of SleipnirGroup/Sleipnir
(reference: /root/reference): a Problem DSL for posing constrained nonlinear
optimization problems in natural mathematical notation, automatic solver
dispatch by problem linearity (no-op / Newton / SQP / interior-point), a filter
line-search interior-point method with second-order corrections,
inertia-corrected regularization and feasibility restoration, and an
optimal-control (OCP) layer with direct transcription, direct collocation, and
single shooting.

Architecturally this is NOT a port: Sleipnir's reverse-mode expression-graph
autodiff (reference include/sleipnir/autodiff/expression.hpp) is replaced by
JAX tracing over an array-granularity expression DAG; Eigen sparse LDLT
(reference solver/util/sparse_regularized_ldlt.hpp) is replaced by a blocked
dense / block-tridiagonal LDLT running on the MXU; and the serial solve loop
(reference solver/interior_point.hpp:382) becomes a jitted `lax.while_loop`
over a device-resident solver-state pytree.

Double precision is enabled globally on import: the default solver tolerance
of 1e-8 (reference solver/options.hpp:15) is not reachable in float32.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from sleipnir_tpu.autodiff import (  # noqa: E402
    ExpressionType,
    Gradient,
    Hessian,
    Jacobian,
    Variable,
    VariableBlock,
    VariableMatrix,
    abs,  # noqa: A004
    acos,
    asin,
    atan,
    atan2,
    block,
    bounds,
    cbrt,
    cos,
    cosh,
    cwise_reduce,
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
    solve,
    sqrt,
    tan,
    tanh,
)
from sleipnir_tpu.optimization import (  # noqa: E402
    OCP,
    DynamicsType,
    EqualityConstraints,
    ExitStatus,
    InequalityConstraints,
    IterationInfo,
    MultistartResult,
    Options,
    Problem,
    TimestepMethod,
    TranscriptionMethod,
    multistart,
)

__version__ = "0.1.0"

__all__ = [
    "OCP",
    "DynamicsType",
    "EqualityConstraints",
    "ExitStatus",
    "ExpressionType",
    "Gradient",
    "Hessian",
    "InequalityConstraints",
    "IterationInfo",
    "Jacobian",
    "MultistartResult",
    "Options",
    "Problem",
    "TimestepMethod",
    "TranscriptionMethod",
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
    "multistart",
    "pow",
    "sign",
    "sin",
    "sinh",
    "solve",
    "sqrt",
    "tan",
    "tanh",
]
