"""Gradient / Jacobian / Hessian drivers.

API parity with reference autodiff/gradient.hpp:25, jacobian.hpp:31,
hessian.hpp:35 — but computed by JAX program transformation of the compiled
expression instead of reverse sweeps over an expression graph
(reference autodiff/expression_graph.hpp:107) or symbolic
reverse-over-reverse (reference autodiff/hessian.hpp:33-103).

`.value()` reflects the *current* values of all involved variables, matching
the reference's set_value-then-revalue workflow; non-wrt variables enter the
compiled function as runtime parameters so no retracing occurs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sleipnir_tpu.autodiff import expression as ex
from sleipnir_tpu.autodiff.expression import CompiledEval, Expr
from sleipnir_tpu.autodiff.variable import Variable, VariableBlock, VariableMatrix

_STRUCTURAL_OPS = {
    "getitem",
    "setblock",
    "vstack",
    "hstack",
    "transpose",
    "reshape",
}


def leaf_id_array(expr: Expr) -> np.ndarray:
    """Extract the decision-variable id for every element of a structural
    expression (leaves rearranged by slicing/stacking/assignment only)."""
    def rec(e: Expr) -> np.ndarray:
        if isinstance(e, ex.DecVarExpr):
            return e.ids.astype(np.float64)
        if isinstance(e, ex.ConstExpr):
            raise TypeError("wrt contains non-decision-variable entries")
        if isinstance(e, ex.OpExpr) and e.op in _STRUCTURAL_OPS:
            vals = [rec(a) for a in e.args]
            return np.asarray(ex._EVAL[e.op](np, e.static, *vals))
        raise TypeError("wrt must be composed of pure decision variables")

    return rec(expr).astype(np.int64)


def _wrt_ids(wrt) -> np.ndarray:
    if isinstance(wrt, Variable):
        return leaf_id_array(wrt.expr).reshape(1)
    if isinstance(wrt, VariableBlock):
        wrt = wrt._as_matrix()
    if isinstance(wrt, VariableMatrix):
        return leaf_id_array(wrt.expr).ravel()
    raise TypeError(f"wrt must be Variable or VariableMatrix, got {type(wrt)}")


def _value_expr(v) -> Expr:
    if isinstance(v, Variable):
        return v.expr
    if isinstance(v, VariableBlock):
        v = v._as_matrix()
    if isinstance(v, VariableMatrix):
        return v.expr
    raise TypeError(f"expected Variable or VariableMatrix, got {type(v)}")


def _symbolic(expr, wrt_ids, kind):
    """Symbolic derivative as a VariableMatrix (reference `get()` returning
    expression-valued derivatives, jacobian.hpp:113-129) — usable in further
    costs/constraints like the reference's gradient_tree output."""
    leaf = ex.DecVarExpr(np.asarray(wrt_ids, dtype=np.int64).reshape(-1))
    if kind == "grad":
        node = ex.grad_of(expr, leaf)
        node = ex.reshape(node, (leaf.ids.size, 1))
    elif kind == "jac":
        node = ex.jac_of(expr, leaf)
    else:  # hessian: Jacobian of the symbolic gradient
        g = ex.grad_of(expr, leaf)
        node = ex.jac_of(g, leaf)
    return VariableMatrix._from_expr(node)


class Gradient:
    """∇f of a scalar wrt a variable vector (reference gradient.hpp:25).

    value() returns an (n, 1) array, matching the reference's column
    SparseVector layout.
    """

    def __init__(self, variable, wrt) -> None:
        self._wrt_ids = _wrt_ids(wrt)
        self._expr = _value_expr(variable)
        self._compiled = CompiledEval([self._expr], self._wrt_ids)

        def scalar_fn(x, params):
            (v,) = self._compiled(x, params)
            return jnp.reshape(v, ())

        self._grad = jax.jit(jax.grad(scalar_fn))

    def value(self) -> np.ndarray:
        x = ex._registry.get(self._wrt_ids)
        params = self._compiled.gather_params()
        g = np.asarray(self._grad(x, params))
        return g.reshape(-1, 1)

    def get(self) -> VariableMatrix:
        return _symbolic(
            ex.reshape(self._expr, ()), self._wrt_ids, "grad"
        )


class Jacobian:
    """∂y/∂x of a vector wrt a variable vector (reference jacobian.hpp:31)."""

    def __init__(self, variables, wrt) -> None:
        self._wrt_ids = _wrt_ids(wrt)
        expr = _value_expr(variables)
        self._expr = expr
        self._m = expr.size
        self._compiled = CompiledEval([expr], self._wrt_ids)
        n = self._wrt_ids.shape[0]

        def vec_fn(x, params):
            (v,) = self._compiled(x, params)
            return jnp.reshape(v, (-1,))

        jac = jax.jacfwd(vec_fn) if n <= self._m else jax.jacrev(vec_fn)
        self._jac = jax.jit(jac)

    def value(self) -> np.ndarray:
        x = ex._registry.get(self._wrt_ids)
        params = self._compiled.gather_params()
        return np.asarray(self._jac(x, params)).reshape(
            self._m, self._wrt_ids.shape[0]
        )

    def get(self) -> VariableMatrix:
        return _symbolic(self._expr, self._wrt_ids, "jac")


class Hessian:
    """∇²f of a scalar wrt a variable vector (reference hessian.hpp:35)."""

    def __init__(self, variable, wrt) -> None:
        self._wrt_ids = _wrt_ids(wrt)
        self._expr = _value_expr(variable)
        self._compiled = CompiledEval([self._expr], self._wrt_ids)

        def scalar_fn(x, params):
            (v,) = self._compiled(x, params)
            return jnp.reshape(v, ())

        self._hess = jax.jit(jax.hessian(scalar_fn))

    def value(self) -> np.ndarray:
        x = ex._registry.get(self._wrt_ids)
        params = self._compiled.gather_params()
        n = self._wrt_ids.shape[0]
        return np.asarray(self._hess(x, params)).reshape(n, n)

    def get(self) -> VariableMatrix:
        return _symbolic(
            ex.reshape(self._expr, ()), self._wrt_ids, "hessian"
        )
