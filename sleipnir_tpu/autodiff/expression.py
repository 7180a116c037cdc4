"""Array-granularity expression DAG.

This replaces Sleipnir's scalar expression graph (reference
autodiff/expression.hpp:89 — one heap node per scalar operation, evaluated by
a virtual-dispatch interpreter) with an *array-valued* DAG: one node per
matrix operation. The DAG is never interpreted in the solver hot loop —
instead it is compiled once into a pure JAX function of the flat decision
vector (`make_eval`), which XLA traces and fuses. Derivatives come from
`jax.grad`/`jax.jacfwd`/`jax.hessian` on the compiled function instead of
hand-written reverse sweeps (reference autodiff/expression_graph.hpp:107).

Like the reference, every node carries its linearity class
(`ExpressionType`), and operator constructors constant-fold and prune
identities (reference autodiff/expression.hpp:155-343).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np

from sleipnir_tpu.autodiff.expression_type import (
    ExpressionType,
    add_type,
    div_type,
    mul_type,
    nonlinear_type,
    pow_type,
)

# ---------------------------------------------------------------------------
# Global decision-variable registry
#
# Every scalar decision variable has a unique integer id and a current value.
# This mirrors Sleipnir's DecisionVariableExpression nodes, whose values are
# written by Variable::set_value (reference autodiff/variable.hpp:137) and by
# Problem::solve writing back the solution (reference problem.hpp:676).
# ---------------------------------------------------------------------------


class _VariableRegistry:
    """Growable store of current values for all scalar decision variables."""

    def __init__(self) -> None:
        self._values = np.zeros(1024, dtype=np.float64)
        self._size = 0

    def new_ids(self, count: int) -> np.ndarray:
        start = self._size
        self._size += count
        while self._size > self._values.shape[0]:
            self._values = np.concatenate(
                [self._values, np.zeros_like(self._values)]
            )
        return np.arange(start, start + count, dtype=np.int64)

    def get(self, ids: np.ndarray) -> np.ndarray:
        return self._values[ids]

    def set(self, ids: np.ndarray, values) -> None:
        self._values[ids] = values


_registry = _VariableRegistry()


# ---------------------------------------------------------------------------
# Expression nodes
# ---------------------------------------------------------------------------


class Expr:
    """Base class for DAG nodes. Shape is () for scalars or (rows, cols)."""

    __slots__ = ("shape", "lin")

    shape: tuple[int, ...]
    lin: ExpressionType

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1


class ConstExpr(Expr):
    """A constant leaf (folded aggressively, like the reference's pruning)."""

    __slots__ = ("value",)

    def __init__(self, value) -> None:
        arr = np.asarray(value, dtype=np.float64)
        self.value = arr
        self.shape = arr.shape
        self.lin = ExpressionType.CONSTANT


class DecVarExpr(Expr):
    """A leaf of scalar decision variables, identified by global ids."""

    __slots__ = ("ids",)

    def __init__(self, ids: np.ndarray) -> None:
        self.ids = ids
        self.shape = ids.shape
        self.lin = ExpressionType.LINEAR


class ParamExpr(DecVarExpr):
    """A mutable constant leaf: participates in linearity classification as
    CONSTANT but is never folded, and its value feeds the compiled program
    as a runtime parameter.

    This is the clean version of the reference's "suppress constant
    pruning" workflow (reference docs/usage.md:391-410, and the
    Variable(inf)-then-set_value trick in
    examples/current_manager/current_manager.py) — re-solving after
    set_value needs no recompilation.
    """

    __slots__ = ()

    def __init__(self, ids: np.ndarray) -> None:
        super().__init__(ids)
        self.lin = ExpressionType.CONSTANT


def new_parameter(value) -> ParamExpr:
    """Create a mutable-constant (parameter) leaf holding `value`."""
    arr = np.asarray(value, dtype=np.float64)
    ids = _registry.new_ids(arr.size).reshape(arr.shape)
    _registry.set(ids, arr)
    return ParamExpr(ids)


class OpExpr(Expr):
    """An operation applied to child expressions."""

    __slots__ = ("op", "args", "static")

    def __init__(
        self,
        op: str,
        args: tuple[Expr, ...],
        static: tuple,
        shape: tuple[int, ...],
        lin: ExpressionType,
    ) -> None:
        self.op = op
        self.args = args
        self.static = static
        self.shape = shape
        self.lin = lin


def new_decision_vars(shape: tuple[int, ...]) -> DecVarExpr:
    """Create fresh decision variables registered in the global registry."""
    count = int(np.prod(shape)) if shape else 1
    ids = _registry.new_ids(count).reshape(shape)
    return DecVarExpr(ids)


def constant(value) -> ConstExpr:
    return ConstExpr(value)


# ---------------------------------------------------------------------------
# Op evaluation table
#
# Each entry maps an op name to fn(xp, static, *child_values). `xp` is numpy
# for host-side Variable.value() evaluation and jax.numpy inside jit traces.
# ---------------------------------------------------------------------------


def _erf(xp, x):
    if xp is np:
        try:
            from scipy.special import erf as _scipy_erf  # noqa: PLC0415

            return _scipy_erf(x)
        except ImportError:
            return np.vectorize(math.erf)(np.asarray(x, dtype=np.float64))
    import jax.scipy.special as jsp_special  # noqa: PLC0415

    return jsp_special.erf(x)


def _expm(xp, a):
    if xp is np:
        import jax.scipy.linalg as jsp_linalg  # noqa: PLC0415

        return np.asarray(jsp_linalg.expm(a))
    import jax.scipy.linalg as jsp_linalg  # noqa: PLC0415

    return jsp_linalg.expm(a)


def _setblock(xp, static, base, value):
    (rs, cs) = static
    key = (slice(*rs), slice(*cs))
    if xp is np:
        out = np.array(base, dtype=np.float64)
        out[key] = value
        return out
    return base.at[key].set(value)


def _ge_solve(xp, a, b):
    """Partial-pivot Gaussian elimination for small systems.

    Dtype-generic replacement for xp.linalg.solve: XLA's LuDecomposition
    only supports f32 on TPU, and the reference likewise special-cases
    small systems with adjugate inverses
    (reference variable_matrix.hpp:1516 solve()).
    """
    n = a.shape[0]
    if n > 16:
        return xp.linalg.solve(a, b)
    if b.ndim == 1:
        b = b.reshape(n, 1)
    if xp is np:
        return np.linalg.solve(a, b)
    import jax.numpy as jnp  # noqa: PLC0415

    A = jnp.concatenate([a, b], axis=1)
    for k in range(n):
        piv = jnp.argmax(jnp.abs(A[k:, k])) + k
        row_piv = A[piv]
        row_k = A[k]
        A = A.at[k].set(row_piv).at[piv].set(row_k)
        if k + 1 < n:
            factor = A[k + 1 :, k] / A[k, k]
            A = A.at[k + 1 :].add(-factor[:, None] * A[k][None, :])
    m = b.shape[1]
    x = jnp.zeros((n, m), a.dtype)
    for k in reversed(range(n)):
        x = x.at[k].set((A[k, n:] - A[k, k + 1 : n] @ x[k + 1 :]) / A[k, k])
    return x


def _getitem(xp, static, v):
    rs, cs, outshape = static
    if v.ndim == 0:
        return v.reshape(outshape)
    out = v[slice(*rs), slice(*cs)]
    return out.reshape(outshape)


def _acc_dispatch(xp, name, a):
    from sleipnir_tpu.ops import accurate_math  # noqa: PLC0415

    return accurate_math.dispatch(xp, name, a)


_EVAL: dict[str, Callable] = {
    "add": lambda xp, s, a, b: a + b,
    "sub": lambda xp, s, a, b: a - b,
    "mul": lambda xp, s, a, b: a * b,
    "div": lambda xp, s, a, b: a / b,
    "matmul": lambda xp, s, a, b: a @ b,
    "neg": lambda xp, s, a: -a,
    "pow_const": lambda xp, s, a: a ** s[0],
    "pow_expr": lambda xp, s, a, b: a**b,
    "abs": lambda xp, s, a: xp.abs(a),
    "acos": lambda xp, s, a: xp.arccos(a),
    "asin": lambda xp, s, a: xp.arcsin(a),
    "atan": lambda xp, s, a: xp.arctan(a),
    "atan2": lambda xp, s, a, b: xp.arctan2(a, b),
    "cbrt": lambda xp, s, a: xp.cbrt(a),
    "cos": lambda xp, s, a: _acc_dispatch(xp, "cos", a),
    "cosh": lambda xp, s, a: xp.cosh(a),
    "erf": lambda xp, s, a: _erf(xp, a),
    "exp": lambda xp, s, a: xp.exp(a),
    "hypot": lambda xp, s, a, b: xp.hypot(a, b),
    "log": lambda xp, s, a: xp.log(a),
    "log10": lambda xp, s, a: xp.log10(a),
    "maximum": lambda xp, s, a, b: xp.maximum(a, b),
    "minimum": lambda xp, s, a, b: xp.minimum(a, b),
    "sign": lambda xp, s, a: xp.sign(a),
    "sin": lambda xp, s, a: _acc_dispatch(xp, "sin", a),
    "sinh": lambda xp, s, a: xp.sinh(a),
    "sqrt": lambda xp, s, a: xp.sqrt(a),
    "tan": lambda xp, s, a: _acc_dispatch(xp, "tan", a),
    "tanh": lambda xp, s, a: xp.tanh(a),
    "transpose": lambda xp, s, a: a.T,
    "reshape": lambda xp, s, a: a.reshape(s[0]),
    "getitem": _getitem,
    "setblock": _setblock,
    "vstack": lambda xp, s, *args: xp.concatenate(
        [xp.atleast_2d(a) for a in args], axis=0
    ),
    "hstack": lambda xp, s, *args: xp.concatenate(
        [xp.atleast_2d(a) for a in args], axis=1
    ),
    "solve": lambda xp, s, a, b: _ge_solve(xp, a, b),
    "expm": lambda xp, s, a: _expm(xp, a),
    "sum": lambda xp, s, a: xp.sum(a),
}


# ---------------------------------------------------------------------------
# Constructors with constant folding and identity pruning
# (reference autodiff/expression.hpp:155-343 and docs/usage.md
# "Suppressing constant pruning")
# ---------------------------------------------------------------------------


def _is_const_zero(e: Expr) -> bool:
    return isinstance(e, ConstExpr) and bool(np.all(e.value == 0.0))


def _is_const_one(e: Expr) -> bool:
    return isinstance(e, ConstExpr) and bool(np.all(e.value == 1.0))


def _fold(op: str, args: tuple[Expr, ...], static: tuple) -> ConstExpr:
    vals = [a.value for a in args]  # type: ignore[attr-defined]
    return ConstExpr(_EVAL[op](np, static, *vals))


def _broadcast_shapes(a: tuple, b: tuple) -> tuple:
    return tuple(np.broadcast_shapes(a, b))


def make_op(
    op: str,
    args: Sequence[Expr],
    static: tuple = (),
    shape: tuple | None = None,
    lin: ExpressionType | None = None,
) -> Expr:
    """Build an op node, constant-folding when all children are constant."""
    args = tuple(args)
    if all(isinstance(a, ConstExpr) for a in args):
        return _fold(op, args, static)
    if shape is None:
        shape = args[0].shape
    if lin is None:
        lin = ExpressionType.NONLINEAR
    return OpExpr(op, args, static, shape, lin)


def add(a: Expr, b: Expr) -> Expr:
    if _is_const_zero(a) and a.shape in ((), b.shape):
        return b
    if _is_const_zero(b) and b.shape in ((), a.shape):
        return a
    shape = _broadcast_shapes(a.shape, b.shape)
    return make_op("add", (a, b), shape=shape, lin=add_type(a.lin, b.lin))


def sub(a: Expr, b: Expr) -> Expr:
    if _is_const_zero(b) and b.shape in ((), a.shape):
        return a
    shape = _broadcast_shapes(a.shape, b.shape)
    if _is_const_zero(a) and a.shape in ((), b.shape):
        return neg(b)
    return make_op("sub", (a, b), shape=shape, lin=add_type(a.lin, b.lin))


def neg(a: Expr) -> Expr:
    return make_op("neg", (a,), shape=a.shape, lin=a.lin)


def mul(a: Expr, b: Expr) -> Expr:
    """Elementwise / scalar-broadcast product."""
    shape = _broadcast_shapes(a.shape, b.shape)
    if _is_const_zero(a) or _is_const_zero(b):
        return ConstExpr(np.zeros(shape))
    if _is_const_one(a) and shape == b.shape:
        return b
    if _is_const_one(b) and shape == a.shape:
        return a
    return make_op("mul", (a, b), shape=shape, lin=mul_type(a.lin, b.lin))


def div(a: Expr, b: Expr) -> Expr:
    if _is_const_one(b):
        return a
    shape = _broadcast_shapes(a.shape, b.shape)
    return make_op("div", (a, b), shape=shape, lin=div_type(a.lin, b.lin))


def matmul(a: Expr, b: Expr) -> Expr:
    assert len(a.shape) == 2 and len(b.shape) == 2, (a.shape, b.shape)
    assert a.shape[1] == b.shape[0], (a.shape, b.shape)
    shape = (a.shape[0], b.shape[1])
    if _is_const_zero(a) or _is_const_zero(b):
        return ConstExpr(np.zeros(shape))
    return make_op("matmul", (a, b), shape=shape, lin=mul_type(a.lin, b.lin))


def pow_const(a: Expr, power: float) -> Expr:
    # Base pruning precedes exponent pruning, matching the reference's
    # order (expression.hpp:1722-1728): pow(0, p) = 0 — including
    # pow(0, 0) = 0, a deliberate deviation from IEEE pow — and
    # pow(1, p) = 1 (expression_test.cpp:310-312). The fold is applied
    # elementwise so mixed constants like [[0, 2]] get consistent
    # per-element semantics.
    if isinstance(a, ConstExpr):
        vals = np.asarray(a.value, dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            folded = np.where(
                vals == 0.0,
                0.0,
                np.where(vals == 1.0, 1.0, vals**power),
            )
        return ConstExpr(folded.reshape(a.shape))
    if power == 1:
        return a
    if power == 0:
        return ConstExpr(np.ones(a.shape))
    # Integral exponents use jnp's integer_pow (repeated multiplication):
    # float exponents lower to exp(p·ln x) on TPU f64, whose higher-order
    # derivatives produce exp(0·ln 0) = NaN at x = 0.
    if float(power).is_integer():
        power = int(power)
    return make_op(
        "pow_const", (a,), static=(power,), shape=a.shape, lin=pow_type(a.lin, power)
    )


def pow_expr(a: Expr, b: Expr) -> Expr:
    if isinstance(b, ConstExpr) and b.shape == ():
        return pow_const(a, float(b.value))
    shape = _broadcast_shapes(a.shape, b.shape)
    # Mirror the reference's base-first pruning for any power
    # (expression.hpp:1722-1728): a constant all-0/1 base fixes the result
    # regardless of the (possibly variable) exponent.
    if isinstance(a, ConstExpr):
        vals = np.asarray(a.value, dtype=np.float64)
        if np.all((vals == 0.0) | (vals == 1.0)):
            return ConstExpr(np.broadcast_to(vals, shape).copy())
    return make_op("pow_expr", (a, b), shape=shape, lin=ExpressionType.NONLINEAR)


def unary(op: str, a: Expr) -> Expr:
    return make_op(op, (a,), shape=a.shape, lin=nonlinear_type(a.lin))


def binary_nonlinear(op: str, a: Expr, b: Expr) -> Expr:
    shape = _broadcast_shapes(a.shape, b.shape)
    lin = (
        ExpressionType.CONSTANT
        if (a.lin == ExpressionType.CONSTANT and b.lin == ExpressionType.CONSTANT)
        else ExpressionType.NONLINEAR
    )
    return make_op(op, (a, b), shape=shape, lin=lin)


def transpose(a: Expr) -> Expr:
    assert len(a.shape) == 2
    return make_op("transpose", (a,), shape=(a.shape[1], a.shape[0]), lin=a.lin)


def reshape(a: Expr, shape: tuple[int, ...]) -> Expr:
    if a.shape == shape:
        return a
    return make_op("reshape", (a,), static=(shape,), shape=shape, lin=a.lin)


def _normalize_slice(s, n: int) -> tuple:
    start, stop, step = s.indices(n)
    return (start, stop, step)


def getitem(a: Expr, rows, cols, outshape: tuple) -> Expr:
    """Slice rows/cols of a 2-D expression; `outshape` may drop dims to ()."""
    if a.shape == ():
        return reshape(a, outshape)
    rs = _normalize_slice(rows, a.shape[0])
    cs = _normalize_slice(cols, a.shape[1])
    # Slicing a decision-variable leaf yields another leaf
    if isinstance(a, DecVarExpr):
        return DecVarExpr(a.ids[slice(*rs), slice(*cs)].reshape(outshape))
    if isinstance(a, ConstExpr):
        return ConstExpr(a.value[slice(*rs), slice(*cs)].reshape(outshape))
    return make_op(
        "getitem", (a,), static=(rs, cs, outshape), shape=outshape, lin=a.lin
    )


def setblock(base: Expr, value: Expr, rows, cols) -> Expr:
    assert len(base.shape) == 2
    rs = _normalize_slice(rows, base.shape[0])
    cs = _normalize_slice(cols, base.shape[1])
    nrow = len(range(*rs))
    ncol = len(range(*cs))
    value = reshape(value, (nrow, ncol)) if value.shape != (nrow, ncol) else value
    return make_op(
        "setblock",
        (base, value),
        static=(rs, cs),
        shape=base.shape,
        lin=add_type(base.lin, value.lin),
    )


def _as_2d(e: Expr) -> Expr:
    if e.shape == ():
        return reshape(e, (1, 1))
    return e


def vstack(parts: Sequence[Expr]) -> Expr:
    parts = [_as_2d(p) for p in parts]
    cols = parts[0].shape[1]
    rows = sum(p.shape[0] for p in parts)
    lin = ExpressionType.NONE
    for p in parts:
        lin = add_type(lin, p.lin)
    return make_op("vstack", tuple(parts), shape=(rows, cols), lin=lin)


def hstack(parts: Sequence[Expr]) -> Expr:
    parts = [_as_2d(p) for p in parts]
    rows = parts[0].shape[0]
    cols = sum(p.shape[1] for p in parts)
    lin = ExpressionType.NONE
    for p in parts:
        lin = add_type(lin, p.lin)
    return make_op("hstack", tuple(parts), shape=(rows, cols), lin=lin)


def linear_solve(a: Expr, b: Expr) -> Expr:
    lin = (
        ExpressionType.CONSTANT
        if a.lin == ExpressionType.CONSTANT and b.lin == ExpressionType.CONSTANT
        else ExpressionType.NONLINEAR
    )
    if a.lin == ExpressionType.CONSTANT:
        lin = mul_type(ExpressionType.CONSTANT, b.lin)
    return make_op("solve", (a, b), shape=(a.shape[0], b.shape[1]), lin=lin)


def expm(a: Expr) -> Expr:
    return make_op("expm", (a,), shape=a.shape, lin=nonlinear_type(a.lin))


def sum_all(a: Expr) -> Expr:
    """Sum of all elements — one reduction node (TPU-native extension; the
    reference builds Σ via O(n) binary adds in user loops)."""
    return make_op("sum", (a,), shape=(), lin=a.lin)


def grad_of(of: Expr, wrt: "DecVarExpr") -> Expr:
    """Symbolic gradient node: d(of)/d(wrt) as an expression usable in
    further costs/constraints (the analog of the reference's
    expression-valued gradient_tree, reference variable_matrix.hpp:1757,
    used e.g. by examples/frc_2024_shooter/main.py's sensitivity cost).

    Evaluates via jax.grad of the sub-DAG, so it nests (gradients of
    gradients) and differentiates (Hessians of costs containing it).
    """
    assert of.shape == (), "grad_of needs a scalar expression"
    assert isinstance(wrt, DecVarExpr)
    shape = wrt.shape if wrt.shape else ()
    return OpExpr("grad", (of, wrt), (), shape, ExpressionType.NONLINEAR)


def jac_of(of: Expr, wrt: "DecVarExpr") -> Expr:
    """Symbolic Jacobian node: rows are gradients of `of`'s elements."""
    assert isinstance(wrt, DecVarExpr)
    m = of.size
    n = wrt.ids.size
    return OpExpr("jac", (of, wrt), (), (m, n), ExpressionType.NONLINEAR)


# ---------------------------------------------------------------------------
# Evaluation and compilation
# ---------------------------------------------------------------------------


def collect_leaf_ids(exprs: Sequence[Expr]) -> np.ndarray:
    """All decision-variable ids appearing in the given DAGs, in first-visit
    order (deduplicated)."""
    seen_nodes: set[int] = set()
    out: list[np.ndarray] = []
    stack = list(exprs)
    while stack:
        e = stack.pop()
        if id(e) in seen_nodes:
            continue
        seen_nodes.add(id(e))
        if isinstance(e, DecVarExpr):
            out.append(e.ids.ravel())
        elif isinstance(e, OpExpr):
            stack.extend(e.args)
    if not out:
        return np.zeros(0, dtype=np.int64)
    flat = np.concatenate(out)
    _, first_idx = np.unique(flat, return_index=True)
    return flat[np.sort(first_idx)]


def evaluate(expr: Expr, xp=np, cache: dict | None = None):
    """Interpret the DAG, reading decision-variable values from the registry.

    Used for host-side Variable.value(); the solver path uses `make_eval`.
    """
    if cache is None:
        cache = {}

    def rec(e: Expr):
        key = id(e)
        if key in cache:
            return cache[key]
        if isinstance(e, ConstExpr):
            v = e.value
        elif isinstance(e, DecVarExpr):
            v = _registry.get(e.ids)
        elif isinstance(e, OpExpr) and e.op in ("grad", "jac"):
            v = _eval_symbolic_derivative_host(e)
        else:
            vals = [rec(a) for a in e.args]
            v = _EVAL[e.op](xp, e.static, *vals)
        cache[key] = v
        return v

    return rec(expr)


def _eval_symbolic_derivative_host(e: "OpExpr"):
    """Evaluate a grad/jac node at current registry values (host path)."""
    import jax  # noqa: PLC0415
    import jax.numpy as jnp  # noqa: PLC0415

    of, wrt = e.args
    wrt_ids = wrt.ids.ravel()
    compiled = CompiledEval([of], wrt_ids)

    def fn(x):
        (v,) = compiled(x, jnp.asarray(compiled.gather_params()))
        return jnp.reshape(v, (-1,)) if e.op == "jac" else jnp.reshape(v, ())

    x0 = jnp.asarray(_registry.get(wrt_ids))
    if e.op == "grad":
        out = jax.grad(fn)(x0)
        return np.asarray(out).reshape(e.shape)
    out = jax.jacfwd(fn)(x0)
    return np.asarray(out).reshape(e.shape)


class CompiledEval:
    """A pure function of (x, params) evaluating a set of expressions.

    `x` is the flat vector of the `wrt` decision variables; `params` is the
    flat vector of all other decision variables appearing in the DAGs,
    gathered from the registry at call time. Keeping parameters as runtime
    arguments preserves Sleipnir's re-solve-with-new-values workflow
    (reference docs/usage.md "Suppressing constant pruning") without
    recompiling.
    """

    def __init__(self, exprs: Sequence[Expr], wrt_ids: np.ndarray) -> None:
        self.exprs = list(exprs)
        self.wrt_ids = np.asarray(wrt_ids, dtype=np.int64).ravel()
        all_ids = collect_leaf_ids(self.exprs)
        wrt_set = set(self.wrt_ids.tolist())
        self.param_ids = np.array(
            [i for i in all_ids.tolist() if i not in wrt_set], dtype=np.int64
        )
        # Map global id -> position in concat([x, params])
        n = self.wrt_ids.shape[0]
        self._pos: dict[int, int] = {
            int(g): i for i, g in enumerate(self.wrt_ids)
        }
        for i, g in enumerate(self.param_ids):
            self._pos[int(g)] = n + i
        # Precompute per-leaf gather index arrays
        self._leaf_index: dict[int, np.ndarray] = {}

    def num_params(self) -> int:
        return int(self.param_ids.shape[0])

    def gather_params(self) -> np.ndarray:
        return _registry.get(self.param_ids)

    def _leaf_gather(self, e: DecVarExpr):
        """Index plan for a leaf: ('slice', start, size, shape) when the
        leaf's positions are contiguous ascending (the common case — one
        lax.slice instead of a gather, which is both faster and avoids
        gather-transpose paths in higher-order AD), else ('gather', idx)."""
        key = id(e)
        plan = self._leaf_index.get(key)
        if plan is None:
            idx = np.vectorize(self._pos.__getitem__, otypes=[np.int64])(
                e.ids
            ) if e.ids.size else np.zeros(e.ids.shape, dtype=np.int64)
            flat = idx.ravel()
            if flat.size and np.array_equal(
                flat, np.arange(flat[0], flat[0] + flat.size)
            ):
                plan = ("slice", int(flat[0]), int(flat.size), idx.shape)
            else:
                plan = ("gather", idx)
            self._leaf_index[key] = plan
        return plan

    def __call__(self, x, params, xp=None):
        """Evaluate all expressions. Traceable by JAX when x/params are
        tracers."""
        import jax.numpy as jnp  # noqa: PLC0415

        if xp is None:
            xp = jnp
        combined = xp.concatenate(
            [xp.asarray(x, dtype=xp.float64).ravel(),
             xp.asarray(params, dtype=xp.float64).ravel()]
        )
        cache: dict[int, object] = {}
        return tuple(
            self.eval_expr(e, combined, xp, cache) for e in self.exprs
        )

    def eval_expr(self, e: Expr, combined, xp, cache: dict | None = None):
        """Evaluate one expression against a combined [x, params] vector."""
        if cache is None:
            cache = {}

        def rec(e: Expr):
            key = id(e)
            if key in cache:
                return cache[key]
            if isinstance(e, ConstExpr):
                v = xp.asarray(e.value)
            elif isinstance(e, DecVarExpr):
                plan = self._leaf_gather(e)
                if plan[0] == "slice":
                    _, start, size, shape = plan
                    v = combined[start : start + size].reshape(shape)
                else:
                    v = combined[plan[1]]
            elif isinstance(e, OpExpr) and e.op in ("grad", "jac"):
                v = self._symbolic_derivative(e, combined, xp)
            else:
                vals = [rec(a) for a in e.args]
                v = _EVAL[e.op](xp, e.static, *vals)
            cache[key] = v
            return v

        return rec(e)

    def _symbolic_derivative(self, e: OpExpr, combined, xp):
        """Evaluate a grad/jac node inside a trace: differentiate the
        sub-DAG wrt the referenced *variables* (any leaf sharing those ids
        sees the overridden values), nesting and further differentiation
        included."""
        import jax  # noqa: PLC0415
        import jax.numpy as jnp  # noqa: PLC0415

        of, wrt = e.args
        wrt_ids = wrt.ids.ravel()
        wrt_pos = np.array(
            [self._pos[int(g)] for g in wrt_ids], dtype=np.int64
        )

        def inner(wvals):
            combined2 = combined.at[wrt_pos].set(wvals) if xp is not np else (
                _np_set(combined, wrt_pos, wvals)
            )
            cache2: dict[int, object] = {}

            def rec2(e2: Expr):
                key2 = id(e2)
                if key2 in cache2:
                    return cache2[key2]
                if isinstance(e2, ConstExpr):
                    v2 = xp.asarray(e2.value)
                elif isinstance(e2, DecVarExpr):
                    plan = self._leaf_gather(e2)
                    if plan[0] == "slice":
                        _, start, size, shape = plan
                        v2 = combined2[start : start + size].reshape(shape)
                    else:
                        v2 = combined2[plan[1]]
                elif isinstance(e2, OpExpr) and e2.op in ("grad", "jac"):
                    v2 = self._symbolic_derivative(e2, combined2, xp)
                else:
                    vals2 = [rec2(a) for a in e2.args]
                    v2 = _EVAL[e2.op](xp, e2.static, *vals2)
                cache2[key2] = v2
                return v2

            out = rec2(of)
            return (
                jnp.reshape(out, (-1,))
                if e.op == "jac"
                else jnp.reshape(out, ())
            )

        cur = combined[wrt_pos]
        if e.op == "grad":
            return jax.grad(inner)(cur).reshape(e.shape)
        return jax.jacfwd(inner)(cur).reshape(e.shape)


def _np_set(arr, idx, vals):
    out = np.array(arr)
    out[idx] = vals
    return out


# ---------------------------------------------------------------------------
# Structural analysis: per-element stage classification
# ---------------------------------------------------------------------------

_ELEMENTWISE_OPS = {
    "add", "sub", "mul", "div", "neg", "pow_const", "pow_expr",
    "abs", "acos", "asin", "atan", "atan2", "cbrt", "cos", "cosh", "erf",
    "exp", "hypot", "log", "log10", "maximum", "minimum", "sign", "sin",
    "sinh", "sqrt", "tan", "tanh",
}

_STRUCTURAL_OPS_ANALYSIS = {
    "getitem", "setblock", "vstack", "hstack", "transpose", "reshape",
}


def element_stages(expr: Expr, stage_of_id: dict) -> np.ndarray:
    """Classify each element of an expression by the OCP stage of the
    variables it references.

    Returns an array shaped like the expression: the stage index if every
    referenced decision variable in that element belongs to one stage, -1
    if the element references no staged variable (constants/parameters),
    -2 if it mixes stages or passes through a non-elementwise op. Used by
    the banded KKT backend to assign constraint rows to stages.
    """

    def combine(a, b):
        a, b = np.broadcast_arrays(a, b)
        return np.where(
            a == -1, b, np.where((b == -1) | (a == b), a, -2)
        )

    def rec(e: Expr) -> np.ndarray:
        if isinstance(e, ConstExpr):
            return np.full(e.shape, -1, dtype=np.int64)
        if isinstance(e, DecVarExpr):
            look = np.vectorize(
                lambda i: stage_of_id.get(int(i), -1), otypes=[np.int64]
            )
            return look(e.ids) if e.ids.size else np.full(e.shape, -1, np.int64)
        assert isinstance(e, OpExpr)
        if e.op in _STRUCTURAL_OPS_ANALYSIS:
            vals = [rec(a) for a in e.args]
            return np.asarray(_EVAL[e.op](np, e.static, *vals))
        if e.op in _ELEMENTWISE_OPS:
            out = np.full((), -1, dtype=np.int64)
            for a in e.args:
                out = combine(out, rec(a))
            return np.broadcast_to(out, e.shape).copy()
        return np.full(e.shape, -2, dtype=np.int64)

    return rec(expr)
