"""Optimization layer: Problem DSL, solvers, OCP, multistart.

Replaces reference include/sleipnir/optimization/.
"""

from sleipnir_tpu.autodiff.variable import (
    EqualityConstraints,
    InequalityConstraints,
)
from sleipnir_tpu.autodiff import bounds
from sleipnir_tpu.optimization.multistart import MultistartResult, multistart
from sleipnir_tpu.optimization.ocp import (
    OCP,
    DynamicsType,
    TimestepMethod,
    TranscriptionMethod,
)
from sleipnir_tpu.optimization.problem import Problem
from sleipnir_tpu.optimization.solver.exit_status import ExitStatus
from sleipnir_tpu.optimization.solver.iteration_info import IterationInfo
from sleipnir_tpu.optimization.solver.options import Options

__all__ = [
    "OCP",
    "DynamicsType",
    "EqualityConstraints",
    "ExitStatus",
    "InequalityConstraints",
    "IterationInfo",
    "MultistartResult",
    "Options",
    "Problem",
    "TimestepMethod",
    "TranscriptionMethod",
    "bounds",
    "multistart",
]
