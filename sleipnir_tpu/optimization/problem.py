"""Problem DSL (reference optimization/problem.hpp:78-822).

Holds decision variables, an optional cost, and constraint lists; `solve()`
classifies the problem by linearity and dispatches to the no-op, Newton,
SQP, or interior-point solver (reference problem.hpp:303-669).

The TPU-native difference: instead of building Gradient/Jacobian/Hessian
expression-graph drivers (reference problem.hpp:535-561), the cost and
constraints are compiled once into pure JAX functions of the flat decision
vector, and derivatives come from jax.grad / jax.jacfwd / jax.hessian.
Non-decision variables feed in as runtime parameters, so Sleipnir's
set-value-then-re-solve workflow does not retrace. Compiled solver loops are
cached per problem structure, so repeated solves (multistart, warm starts)
pay compilation once.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sleipnir_tpu.autodiff import expression as ex
from sleipnir_tpu.autodiff.expression import ConstExpr, Expr
from sleipnir_tpu.autodiff.expression_type import ExpressionType
from sleipnir_tpu.autodiff.variable import (
    EqualityConstraints,
    InequalityConstraints,
    Variable,
    VariableMatrix,
)
from sleipnir_tpu.optimization.solver import status_codes
from sleipnir_tpu.optimization.solver.exit_status import ExitStatus
from sleipnir_tpu.optimization.solver.funcs import (
    IPMFunctions,
    NewtonFunctions,
    ScalingArrays,
    SQPFunctions,
)
from sleipnir_tpu.optimization.solver.interior_point import (
    make_interior_point,
)
from sleipnir_tpu.optimization.solver.iteration_info import IterationInfo
from sleipnir_tpu.optimization.solver.newton import make_newton
from sleipnir_tpu.optimization.solver.options import Options
from sleipnir_tpu.optimization.solver.solve_driver import (
    make_runner,
    run_solver,
)
from sleipnir_tpu.optimization.solver.sqp import make_sqp
from sleipnir_tpu.optimization.solver.util.bounds import (
    get_bounds,
    get_bounds_rows,
    project_onto_bounds,
)
from sleipnir_tpu.optimization.solver.util.feasibility_restoration import (
    restore,
)
from sleipnir_tpu.optimization.solver.util.problem_scaling import (
    ProblemScaling,
)


def _setup_eval(fn, *args):
    """Evaluate a one-shot setup function on the host CPU backend.

    Setup quantities (problem scaling, bound detection — reference
    problem.hpp:597-616) are evaluated exactly once per solve at x0.
    Compiling their dense Jacobians for the accelerator wastes minutes of
    XLA compile time on a single evaluation, so they are pinned to CPU.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return np.asarray(fn(*[np.asarray(a) for a in args]))


class _FnBlock:
    """A functional constraint block: residuals given directly as a JAX
    function of the flat decision vector (the OCP fast path — one traced
    program regardless of horizon length, instead of O(N) DSL nodes).

    `row_stage` optionally assigns each residual row to an OCP stage for
    the banded KKT backend."""

    __slots__ = ("fn", "rows", "lin", "row_stage")

    def __init__(
        self,
        fn: Callable,
        rows: int,
        lin: ExpressionType,
        row_stage=None,
    ) -> None:
        self.fn = fn
        self.rows = rows
        self.lin = lin
        self.row_stage = row_stage


class _DiagProfilers:
    """Setup/solve profiler bundle printed under diagnostics=True
    (reference util/profiler.hpp + print_diagnostics.hpp:289-330; wired
    like reference problem.hpp's setup_profilers/solve_profilers)."""

    def __init__(self, enabled: bool) -> None:
        from sleipnir_tpu.util.profiler import (  # noqa: PLC0415
            SetupProfiler,
            SolveProfiler,
        )

        self.enabled = enabled
        self.setup: list = []
        self.solve: dict | None = None
        if enabled:
            total = SetupProfiler("setup")
            total.start()
            self.setup.append(total)
            self.solve = {
                "solve": SolveProfiler("solve"),
                "iterate": SolveProfiler("  ↳ iterate"),
                "restoration": SolveProfiler("  ↳ restoration"),
                "callbacks": SolveProfiler("  ↳ callbacks"),
            }

    def phase(self, name: str):
        from contextlib import contextmanager  # noqa: PLC0415

        from sleipnir_tpu.util.profiler import SetupProfiler  # noqa: PLC0415

        @contextmanager
        def cm():
            if not self.enabled:
                yield
                return
            prof = SetupProfiler("  ↳ " + name)
            prof.start()
            try:
                yield
            finally:
                prof.stop()
                self.setup.append(prof)

        return cm()

    def report(self) -> None:
        if not self.enabled:
            return
        from sleipnir_tpu.util.print_diagnostics import (  # noqa: PLC0415
            print_setup_diagnostics,
            print_solver_diagnostics,
        )

        self.setup[0].stop()
        print()
        print_setup_diagnostics(self.setup)
        profs = [self.solve["solve"]] + [
            p
            for k, p in self.solve.items()
            if k != "solve" and p.count > 0
        ]
        print_solver_diagnostics(profs)


class Problem:
    """An optimization problem (reference optimization/problem.hpp:78)."""

    def __init__(self) -> None:
        self._var_ids: list[np.ndarray] = []
        self._f: Expr | None = None
        self._equality: list = []  # Expr | _FnBlock, in subject_to order
        self._inequality: list = []
        self._callbacks: list[Callable] = []
        self._persistent_callbacks: list[Callable] = []
        self._structure_version = 0
        self._solver_cache: dict = {}
        #: Enables projection of the initial guess into detected variable
        #: bounds (reference SLEIPNIR_ENABLE_BOUND_PROJECTION,
        #: CMakeLists.txt:35-38).
        self.enable_bound_projection = False
        self._last_state = None
        self._time_mesh = None  # (Mesh, axis_name) — see set_time_axis_mesh

    def set_time_axis_mesh(self, mesh, axis_name: str = "t") -> None:
        """Shard the KKT factorization's stage (time) axis over a device
        mesh (SURVEY §7 step 5). Only takes effect on problems that run
        the banded OCP backend; the factorization becomes the SPIKE split
        in sleipnir_tpu.parallel.time_axis (per-device interior
        elimination, one all_gather + ppermute for the interface system),
        with pivots exposed so inertia-corrected regularization runs
        unchanged. Pass mesh=None to revert to single-device."""
        self._time_mesh = None if mesh is None else (mesh, axis_name)
        self._solver_cache.clear()

    # -- variable / cost / constraint registration -------------------------

    def decision_variable(self, rows: int | None = None, cols: int = 1):
        """Create decision variables (reference problem.hpp:78-130).

        With no arguments returns a scalar Variable; otherwise a
        rows x cols VariableMatrix.
        """
        self._structure_version += 1
        if rows is None:
            v = Variable()
            self._var_ids.append(v.expr.ids.reshape(1))
            return v
        m = VariableMatrix(int(rows), int(cols))
        self._var_ids.append(m.expr.ids.ravel())
        return m

    def symmetric_decision_variable(self, rows: int) -> VariableMatrix:
        """Create a symmetric matrix of decision variables where the upper
        triangle shares the lower triangle's variables
        (reference problem.hpp:132-150)."""
        self._structure_version += 1
        count = rows * (rows + 1) // 2
        flat = ex._registry.new_ids(count)
        ids = np.zeros((rows, rows), dtype=np.int64)
        k = 0
        for i in range(rows):
            for j in range(i + 1):
                ids[i, j] = flat[k]
                ids[j, i] = flat[k]
                k += 1
        self._var_ids.append(flat)
        return VariableMatrix(ex.DecVarExpr(ids))

    def minimize(self, cost) -> None:
        """Set the cost to minimize (reference problem.hpp:151-170)."""
        self._structure_version += 1
        self._f = _as_scalar_expr(cost)

    def maximize(self, objective) -> None:
        """Set the objective to maximize (reference problem.hpp:172-194)."""
        self._structure_version += 1
        self._f = ex.neg(_as_scalar_expr(objective))

    def subject_to(self, constraint) -> None:
        """Add constraints (reference problem.hpp:196-234)."""
        self._structure_version += 1
        if isinstance(constraint, EqualityConstraints):
            self._equality.extend(constraint.blocks)
        elif isinstance(constraint, InequalityConstraints):
            self._inequality.extend(constraint.blocks)
        elif isinstance(constraint, (list, tuple)):
            for c in constraint:
                self.subject_to(c)
        else:
            raise TypeError(
                f"subject_to() expects constraints, got {type(constraint)}"
            )

    def _subject_to_fn(
        self,
        fn: Callable,
        rows: int,
        lin: ExpressionType,
        *,
        equality: bool,
        row_stage=None,
    ) -> None:
        """Register a functional constraint block (OCP fast path)."""
        self._structure_version += 1
        block = _FnBlock(fn, rows, lin, row_stage)
        (self._equality if equality else self._inequality).append(block)

    def add_callback(self, callback: Callable) -> None:
        """Add a per-iteration callback; returning True stops the solve
        (reference problem.hpp:681-730)."""
        self._callbacks.append(callback)

    def add_persistent_callback(self, callback: Callable) -> None:
        """Add a per-iteration callback that survives clear_callbacks()
        (reference problem.hpp:728, used by language bindings for signal
        handling)."""
        self._persistent_callbacks.append(callback)

    def clear_callbacks(self) -> None:
        """Remove non-persistent callbacks (reference problem.hpp:735)."""
        self._callbacks.clear()

    @property
    def _all_callbacks(self) -> list:
        return self._persistent_callbacks + self._callbacks

    # -- classification ----------------------------------------------------

    def cost_function_type(self) -> ExpressionType:
        """(reference problem.hpp:239-245)"""
        return self._f.lin if self._f is not None else ExpressionType.NONE

    @staticmethod
    def _blocks_type(blocks) -> ExpressionType:
        t = ExpressionType.NONE
        for b in blocks:
            t = max(t, b.lin)
        return t

    def equality_constraint_type(self) -> ExpressionType:
        """(reference problem.hpp:250-258)"""
        return self._blocks_type(self._equality)

    def inequality_constraint_type(self) -> ExpressionType:
        """(reference problem.hpp:263-271)"""
        return self._blocks_type(self._inequality)

    # -- compilation -------------------------------------------------------

    def _all_ids(self) -> np.ndarray:
        if not self._var_ids:
            return np.zeros(0, dtype=np.int64)
        return np.concatenate(self._var_ids)

    def _compile(self):
        """Compile f, c_e, c_i into (x, params) -> value JAX functions,
        batching isomorphic loop-built blocks (see autodiff/vectorize.py)."""
        from sleipnir_tpu.autodiff.vectorize import BlockCompiler  # noqa: PLC0415

        all_ids = self._all_ids()
        f_expr = self._f if self._f is not None else ConstExpr(0.0)
        bc = BlockCompiler(
            f_expr, self._equality, self._inequality, all_ids
        )

        def rows_of(blocks) -> int:
            return sum(
                b.rows if isinstance(b, _FnBlock) else b.size for b in blocks
            )

        def row_linearity(blocks) -> np.ndarray:
            out = []
            for b in blocks:
                rows = b.rows if isinstance(b, _FnBlock) else b.size
                out.extend([b.lin] * rows)
            return np.array(
                [t == ExpressionType.LINEAR for t in out], dtype=bool
            )

        return {
            "compiled": bc,
            "all_ids": all_ids,
            "n": int(all_ids.shape[0]),
            "me": rows_of(self._equality),
            "mi": rows_of(self._inequality),
            "f": bc.f,
            "c_e": bc.c_e,
            "c_i": bc.c_i,
            "ineq_row_linear": row_linearity(self._inequality),
        }

    # -- solve -------------------------------------------------------------

    def solve(self, options: Options | None = None, spy: bool = False, **kwargs):
        """Solve the problem; the solution is written back into the original
        Variables (reference problem.hpp:281-679)."""
        if options is None:
            options = Options()
        if kwargs:
            options = Options(
                **{
                    **{
                        k: getattr(options, k)
                        for k in Options.__dataclass_fields__
                    },
                    **kwargs,
                }
            )

        f_type = self.cost_function_type()
        c_e_type = self.equality_constraint_type()
        c_i_type = self.inequality_constraint_type()

        if options.diagnostics:
            from sleipnir_tpu.util.print_diagnostics import (  # noqa: PLC0415
                print_exit_conditions,
                print_problem_analysis,
            )

            print_exit_conditions(options)
            print_problem_analysis(
                int(self._all_ids().shape[0]),
                f_type,
                sum(
                    b.rows if isinstance(b, _FnBlock) else b.size
                    for b in self._equality
                ),
                c_e_type,
                sum(
                    b.rows if isinstance(b, _FnBlock) else b.size
                    for b in self._inequality
                ),
                c_i_type,
            )

        # No-op problem (reference problem.hpp:303-313)
        if (
            f_type <= ExpressionType.CONSTANT
            and c_e_type <= ExpressionType.CONSTANT
            and c_i_type <= ExpressionType.CONSTANT
        ):
            if options.diagnostics:
                print("\nInvoking no-op solver\n")
            return ExitStatus.SUCCESS

        start_time = time.monotonic()

        comp = self._compile()
        all_ids = comp["all_ids"]
        n, me, mi = comp["n"], comp["me"], comp["mi"]
        x0 = ex._registry.get(all_ids).astype(np.float64)
        params = comp["compiled"].gather_params()

        if mi > 0:
            if options.diagnostics:
                print("\nInvoking IPM solver\n")
            status, final_x = self._solve_ipm(
                comp, x0, params, options, start_time, spy
            )
        elif me > 0:
            if options.diagnostics:
                print("\nInvoking SQP solver\n")
            status, final_x = self._solve_sqp(
                comp, x0, params, options, start_time, spy
            )
        else:
            if options.diagnostics:
                print("\nInvoking Newton solver\n")
            status, final_x = self._solve_newton(
                comp, x0, params, options, start_time, spy
            )

        if options.diagnostics:
            print(f"\nExit: {status}")

        # Write the solution back into the decision variables
        # (reference problem.hpp:676).
        ex._registry.set(all_ids, np.asarray(final_x, dtype=np.float64))
        return status

    # -- derivative construction -------------------------------------------

    def _derivatives(self, comp):
        f_raw = comp["f"]
        ce_raw = comp["c_e"]
        ci_raw = comp["c_i"]
        g_fn = jax.grad(f_raw, argnums=0)
        H_f_fn = jax.hessian(f_raw, argnums=0)
        A_e_fn = jax.jacfwd(ce_raw, argnums=0)
        A_i_fn = jax.jacfwd(ci_raw, argnums=0)

        def lag_c(x, y, z, params):
            out = jnp.asarray(0.0, x.dtype)
            if comp["me"] > 0:
                out = out - y @ ce_raw(x, params)
            if comp["mi"] > 0:
                out = out - z @ ci_raw(x, params)
            return out

        H_c_fn = jax.hessian(lag_c, argnums=0)
        return g_fn, H_f_fn, A_e_fn, A_i_fn, H_c_fn

    # -- dispatch branches -------------------------------------------------

    def _cache_key(self, kind, options: Options):
        return (
            kind,
            self._structure_version,
            options.tolerance,
            options.max_iterations,
            options.feasible_ipm,
            options.dtype,
        )

    def _make_spy_callback(self, with_inequality: bool):
        """Create the per-iteration sparsity recorder installed by
        solve(spy=True) (reference problem.hpp:569-594)."""
        comp = self._compile()
        writers = _spy_writers(
            comp["n"], comp["me"], comp["mi"], with_inequality
        )

        def cb(info: IterationInfo):
            writers["H"].add(info.H)
            writers["A_e"].add(info.A_e)
            if with_inequality:
                writers["A_i"].add(info.A_i)
            return False

        return cb

    @staticmethod
    def _diagnostics_fn(kind):
        from sleipnir_tpu.util.print_diagnostics import (  # noqa: PLC0415
            NORMAL,
            print_iteration_diagnostics,
        )
        import time as _time  # noqa: PLC0415

        last = {"t": _time.perf_counter()}

        def diag(prev, after):
            now = _time.perf_counter()
            dt_ms = (now - last["t"]) * 1e3
            last["t"] = now
            infeas = 0.0
            complem = 0.0
            mu = 0.0
            alpha_z = 1.0
            p_pr = float(getattr(after, "p_pr_inf", 0.0))
            p_du = float(getattr(after, "p_du_inf", 0.0))
            if kind == "ipm":
                s_v = np.asarray(after.s)
                z_v = np.asarray(after.z)
                infeas = float(
                    np.sum(np.abs(np.asarray(after.c_e)))
                    + np.sum(np.abs(np.asarray(after.c_i) - s_v))
                )
                complem = float(s_v @ z_v)
                mu = float(after.mu)
                alpha_z = float(after.alpha_z)
            elif kind == "sqp":
                infeas = float(np.sum(np.abs(np.asarray(after.c_e))))
                alpha_z = float(after.alpha)
            print_iteration_diagnostics(
                int(prev.iterations),
                NORMAL,
                dt_ms,
                float(after.E0),
                float(after.f),
                infeas,
                complem,
                mu,
                float(after.delta),
                float(after.gamma),
                p_pr,
                p_du,
                float(after.alpha),
                float(getattr(after, "alpha_max", 1.0)),
                0.5,
                alpha_z,
            )

        return diag

    def _solve_newton(self, comp, x0, params, options, start_time, spy=False):
        """(reference problem.hpp:335-402)"""
        key = self._cache_key("newton", options)
        prof = _DiagProfilers(options.diagnostics)
        cached = self._solver_cache.get(key)
        if cached is None:
            f_raw = comp["f"]
            g_fn = jax.jit(jax.grad(f_raw, argnums=0))
            H_f_fn = jax.hessian(f_raw, argnums=0)
            funcs = NewtonFunctions(
                num_decision_variables=comp["n"],
                f=lambda x, p, sc: sc.f * f_raw(x, p),
                g=lambda x, p, sc: sc.f * g_fn(x, p),
                H=lambda x, p, sc: sc.f * H_f_fn(x, p),
            )
            dtype = (
                jnp.float64 if options.dtype == "float64" else jnp.float32
            )
            backend = self._make_kkt_backend(comp, options, dtype)
            if backend is None:
                from sleipnir_tpu.optimization.solver.kkt_backend import (  # noqa: PLC0415
                    DenseBackend,
                )

                backend = DenseBackend(comp["n"], 0, 0, dtype)
            init, step = make_newton(funcs, options, backend=backend)
            cached = (
                jax.jit(init), step, make_runner(step), g_fn, backend
            )
            self._solver_cache[key] = cached
        init, step, runner, g_fn, backend = cached
        # Scaling at the starting point (reference problem.hpp:379-382)
        with prof.phase("problem scaling"):
            g0 = _setup_eval(g_fn, x0, params)
            scaling = ProblemScaling.for_newton(g0)
            sc = ScalingArrays(
                f=jnp.asarray(scaling.f), c_e=jnp.zeros(0), c_i=jnp.zeros(0)
            )
        with prof.phase("initial state"):
            state = init(x0, params, sc)
        state = run_solver(
            state,
            step,
            options,
            callbacks=self._all_callbacks,
            info_fn=lambda st: self._newton_info(st, backend),
            start_time=start_time,
            runner=runner,
            diagnostics_fn=self._diagnostics_fn("newton"),
            profilers=prof.solve,
        )
        prof.report()
        self._last_state = state
        return ExitStatus(int(state.status)), np.asarray(state.x)

    @staticmethod
    def _newton_info(state, backend) -> IterationInfo:
        empty = np.zeros(0)
        H, _A_e, _A_i = backend.dense(state.derivs)
        return IterationInfo(
            iteration=int(state.iterations),
            x=np.asarray(state.x),
            s=empty,
            y=empty,
            z=empty,
            g=np.asarray(state.g),
            H=np.asarray(H),
            A_e=np.zeros((0, state.x.shape[0])),
            A_i=np.zeros((0, state.x.shape[0])),
        )

    def _solve_sqp(self, comp, x0, params, options, start_time, spy=False):
        """(reference problem.hpp:403-511)"""
        key = self._cache_key("sqp", options)
        prof = _DiagProfilers(options.diagnostics)
        cached = self._solver_cache.get(key)
        xj, pj = jnp.asarray(x0), jnp.asarray(params)
        if cached is None:
            f_raw, ce_raw = comp["f"], comp["c_e"]
            g_fn, H_f_fn, A_e_fn, _A_i_fn, H_c_fn = self._derivatives(comp)
            zeros0 = jnp.zeros(0)

            funcs = SQPFunctions(
                num_decision_variables=comp["n"],
                num_equality_constraints=comp["me"],
                f=lambda x, p, sc: sc.f * f_raw(x, p),
                g=lambda x, p, sc: sc.f * g_fn(x, p),
                H=lambda x, y, p, sc: sc.f * H_f_fn(x, p)
                + H_c_fn(x, sc.c_e * y, zeros0, p),
                H_c=lambda x, y, p, sc: H_c_fn(x, sc.c_e * y, zeros0, p),
                c_e=lambda x, p, sc: sc.c_e * ce_raw(x, p),
                A_e=lambda x, p, sc: sc.c_e[:, None] * A_e_fn(x, p),
            )
            dtype = (
                jnp.float64 if options.dtype == "float64" else jnp.float32
            )
            backend = self._make_kkt_backend(comp, options, dtype)
            if backend is None:
                from sleipnir_tpu.optimization.solver.kkt_backend import (  # noqa: PLC0415
                    DenseBackend,
                )

                backend = DenseBackend(comp["n"], comp["me"], 0, dtype)
            init, step, resume = make_sqp(funcs, options, backend=backend)
            cached = (
                jax.jit(init),
                step,
                resume,
                funcs,
                make_runner(step),
                jax.jit(g_fn),
                jax.jit(A_e_fn),
                backend,
            )
            self._solver_cache[key] = cached
        init, step, resume, funcs, runner, g_fn_j, A_e_fn_j, backend = cached
        # Scaling at the starting point (reference problem.hpp:473-477)
        with prof.phase("problem scaling"):
            g0 = _setup_eval(g_fn_j, xj, pj)
            if hasattr(backend, "setup_rows"):
                cpu = jax.devices("cpu")[0]
                with jax.default_device(cpu):
                    ce_loc, ce_next, _ci_rows, _ci_cols = (
                        backend.setup_rows(np.asarray(x0), np.asarray(pj))
                    )
                ce_inf = np.maximum(
                    np.max(np.abs(ce_loc), axis=1, initial=0.0),
                    np.max(np.abs(ce_next), axis=1, initial=0.0),
                )
                scaling = ProblemScaling.from_row_norms(
                    g0, ce_inf, np.zeros(0)
                )
            else:
                A_e0 = _setup_eval(A_e_fn_j, xj, pj)
                scaling = ProblemScaling.for_sqp(g0, A_e0)
            sc = ScalingArrays(
                f=jnp.asarray(scaling.f),
                c_e=jnp.asarray(scaling.c_e),
                c_i=jnp.zeros(0),
            )

        def restoration_handler(state, st_time):
            # Wrap the SQP callbacks as a zero-inequality IPM parent
            # (reference sqp.hpp:118-325 SQP-entry restoration).
            parent = _sqp_as_ipm_parent(funcs, comp["n"], comp["me"])
            shim = _ShimState(
                x=state.x,
                s=jnp.zeros(0),
                c_e=state.c_e,
                c_i=jnp.zeros(0),
                mu=0.0,
                alpha=state.alpha,
                iterations=state.iterations,
                filt=state.filt,
                g=state.g,
                f=state.f,
                params=state.params,
                scaling=ScalingArrays(
                    f=state.scaling.f,
                    c_e=state.scaling.c_e,
                    c_i=jnp.zeros(0),
                ),
            )
            outcome, x_n, _s_n, y_n, _z_n, iters = restore(
                parent,
                shim,
                options,
                base_mu=options.tolerance / 10.0,
                start_time=st_time,
            )
            if outcome == "resume":
                return resume(state, x_n, y_n, iters)
            return state._replace(
                status=np.int32(int(outcome)), x=jnp.asarray(x_n)
            )

        callbacks = list(self._all_callbacks)
        if spy:
            callbacks.append(self._make_spy_callback(with_inequality=False))
        with prof.phase("initial state"):
            state = init(x0, pj, sc)
        state = run_solver(
            state,
            step,
            options,
            callbacks=callbacks,
            info_fn=lambda st: self._sqp_info(st, backend),
            restoration_handler=restoration_handler,
            start_time=start_time,
            runner=runner,
            diagnostics_fn=self._diagnostics_fn("sqp"),
            profilers=prof.solve,
        )
        prof.report()
        self._last_state = state
        return ExitStatus(int(state.status)), np.asarray(state.x)

    @staticmethod
    def _sqp_info(state, backend) -> IterationInfo:
        empty = np.zeros(0)
        H, A_e, _A_i = backend.dense(state.derivs)
        return IterationInfo(
            iteration=int(state.iterations),
            x=np.asarray(state.x),
            s=empty,
            y=np.asarray(state.y),
            z=empty,
            g=np.asarray(state.g),
            H=np.asarray(H),
            A_e=np.asarray(A_e),
            A_i=np.zeros((0, state.x.shape[0])),
        )

    def prepare_ipm(self, options: Options | None = None):
        """Compile (or fetch cached) the interior-point solver bundle for
        this problem: (init, step, resume, funcs, runner, jitted g/A_e/A_i/
        c_i). Used by solve() and by the batched/sharded drivers in
        sleipnir_tpu.parallel."""
        if options is None:
            options = Options()
        comp = self._compile()
        return comp, self._prepare_ipm(comp, options)

    def _prepare_ipm(self, comp, options):
        key = self._cache_key("ipm", options)
        cached = self._solver_cache.get(key)
        if cached is None:
            f_raw, ce_raw, ci_raw = comp["f"], comp["c_e"], comp["c_i"]
            g_fn, H_f_fn, A_e_fn, A_i_fn, H_c_fn = self._derivatives(comp)

            funcs = IPMFunctions(
                num_decision_variables=comp["n"],
                num_equality_constraints=comp["me"],
                num_inequality_constraints=comp["mi"],
                f=lambda x, p, sc: sc.f * f_raw(x, p),
                g=lambda x, p, sc: sc.f * g_fn(x, p),
                H=lambda x, y, z, p, sc: sc.f * H_f_fn(x, p)
                + H_c_fn(x, sc.c_e * y, sc.c_i * z, p),
                H_c=lambda x, y, z, p, sc: H_c_fn(x, sc.c_e * y, sc.c_i * z, p),
                c_e=lambda x, p, sc: sc.c_e * ce_raw(x, p),
                A_e=lambda x, p, sc: sc.c_e[:, None] * A_e_fn(x, p),
                c_i=lambda x, p, sc: sc.c_i * ci_raw(x, p),
                A_i=lambda x, p, sc: sc.c_i[:, None] * A_i_fn(x, p),
            )
            from sleipnir_tpu.optimization.solver.kkt_backend import (  # noqa: PLC0415
                DenseBackend,
            )

            dtype = (
                jnp.float64 if options.dtype == "float64" else jnp.float32
            )
            backend = self._make_kkt_backend(comp, options, dtype)
            if backend is None:
                backend = DenseBackend(
                    comp["n"], comp["me"], comp["mi"], dtype
                )
            init, step, resume = make_interior_point(
                funcs, options, backend=backend
            )
            cached = (
                jax.jit(init),
                step,
                resume,
                funcs,
                make_runner(step),
                jax.jit(g_fn),
                jax.jit(A_e_fn),
                jax.jit(A_i_fn),
                jax.jit(ci_raw),
                backend,
            )
            self._solver_cache[key] = cached
        return cached

    def _make_kkt_backend(self, comp, options, dtype):
        """Hook for structured problems (OCP overrides to return a banded
        backend when the stage structure allows it)."""
        return None

    def compute_ipm_scaling(self, comp, cached, x0, params):
        """Problem scaling at a starting point (reference problem.hpp:612-616)."""
        (_i, _s, _r, _f, _run, g_fn_j, A_e_fn_j, A_i_fn_j, _ci, backend) = cached
        g0 = _setup_eval(g_fn_j, x0, params)
        if hasattr(backend, "setup_rows"):
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                ce_loc, ce_next, ci_rows, _ci_cols = backend.setup_rows(
                    np.asarray(x0), np.asarray(params)
                )
            ce_inf = np.maximum(
                np.max(np.abs(ce_loc), axis=1, initial=0.0),
                np.max(np.abs(ce_next), axis=1, initial=0.0),
            )
            ci_inf = np.max(np.abs(ci_rows), axis=1, initial=0.0)
            return ProblemScaling.from_row_norms(g0, ce_inf, ci_inf), None
        A_e0 = _setup_eval(A_e_fn_j, x0, params)
        A_i0 = _setup_eval(A_i_fn_j, x0, params)
        scaling = ProblemScaling.for_ipm(g0, A_e0, A_i0)
        return scaling, A_i0

    def _solve_ipm(self, comp, x0, params, options, start_time, spy=False):
        """(reference problem.hpp:512-669)"""
        xj, pj = jnp.asarray(x0), jnp.asarray(params)
        prof = _DiagProfilers(options.diagnostics)
        with prof.phase("compile solver"):
            cached = self._prepare_ipm(comp, options)
        (
            init,
            step,
            resume,
            funcs,
            runner,
            g_fn_j,
            A_e_fn_j,
            A_i_fn_j,
            ci_raw_j,
            backend,
        ) = cached

        # Scaling at the starting point (reference problem.hpp:612-616).
        # Stage-structured problems use the matrix-free row-norm path
        # (O(N·w) memory); only irregular problems materialize dense
        # Jacobians.
        matrix_free = hasattr(backend, "setup_rows")
        with prof.phase("problem scaling"):
            g0 = _setup_eval(g_fn_j, xj, pj)
            if matrix_free:
                cpu = jax.devices("cpu")[0]
                with jax.default_device(cpu):
                    ce_loc, ce_next, ci_rows, ci_cols = backend.setup_rows(
                        np.asarray(x0), np.asarray(params)
                    )
                ce_inf = np.maximum(
                    np.max(np.abs(ce_loc), axis=1, initial=0.0),
                    np.max(np.abs(ce_next), axis=1, initial=0.0),
                )
                ci_inf = np.max(np.abs(ci_rows), axis=1, initial=0.0)
                scaling = ProblemScaling.from_row_norms(g0, ce_inf, ci_inf)
            else:
                A_e0 = _setup_eval(A_e_fn_j, xj, pj)
                A_i0 = _setup_eval(A_i_fn_j, xj, pj)
                scaling = ProblemScaling.for_ipm(g0, A_e0, A_i0)
            sc = ScalingArrays(
                f=jnp.asarray(scaling.f),
                c_e=jnp.asarray(scaling.c_e),
                c_i=jnp.asarray(scaling.c_i),
            )

        # Bound detection and conflict check (reference problem.hpp:597-610)
        with prof.phase("bound detection"):
            c_i0 = _setup_eval(ci_raw_j, xj, pj)
            if matrix_free:
                bounds = get_bounds_rows(
                    x0, c_i0, ci_cols, ci_rows, comp["ineq_row_linear"]
                )
            else:
                bounds = get_bounds(
                    x0, c_i0, A_i0, comp["ineq_row_linear"]
                )
        if bounds.conflicting_bound_indices:
            return ExitStatus.GLOBALLY_INFEASIBLE, x0
        if self.enable_bound_projection:
            x0 = project_onto_bounds(x0, bounds.lower, bounds.upper)

        # Default starting point (reference interior_point.hpp:74-87)
        s0 = np.ones(comp["mi"])
        if self.enable_bound_projection:
            # sʲ = cᵢʲ(x₀) for bound rows (reference interior_point.hpp:288-291)
            c_i_start = _setup_eval(ci_raw_j, x0, pj)
            mask = bounds.bound_constraint_mask
            s0[mask] = (scaling.c_i * c_i_start)[mask]
        y0 = np.zeros(comp["me"])
        z0 = np.ones(comp["mi"])
        mu0 = 0.1 * scaling.f

        def restoration_handler(state, st_time):
            # Stage-banded problems restore on a banded backend of their
            # own (the relaxation variables are stage-local), so
            # restoration scales O(N) like the parent solve; dense
            # problems restore densely.
            outcome, x_n, s_n, y_n, z_n, iters = restore(
                funcs,
                state,
                options,
                start_time=st_time,
                parent_backend=backend
                if hasattr(backend, "structure")
                else None,
            )
            if outcome == "resume":
                return resume(state, x_n, s_n, y_n, z_n, iters)
            return state._replace(
                status=np.int32(int(outcome)),
                x=jnp.asarray(x_n),
                s=jnp.asarray(s_n),
            )

        callbacks = list(self._all_callbacks)
        if spy:
            callbacks.append(self._make_spy_callback(with_inequality=True))
        with prof.phase("initial state"):
            state = init(x0, s0, y0, z0, mu0, 0, pj, sc)
        state = run_solver(
            state,
            step,
            options,
            callbacks=callbacks,
            info_fn=lambda st: self._ipm_info(st, backend),
            restoration_handler=restoration_handler,
            start_time=start_time,
            runner=runner,
            diagnostics_fn=self._diagnostics_fn("ipm"),
            profilers=prof.solve,
        )
        prof.report()
        self._last_state = state
        return ExitStatus(int(state.status)), np.asarray(state.x)

    @staticmethod
    def _ipm_info(state, backend) -> IterationInfo:
        H, A_e, A_i = backend.dense(state.derivs)
        return IterationInfo(
            iteration=int(state.iterations),
            x=np.asarray(state.x),
            s=np.asarray(state.s),
            y=np.asarray(state.y),
            z=np.asarray(state.z),
            g=np.asarray(state.g),
            H=np.asarray(H),
            A_e=np.asarray(A_e),
            A_i=np.asarray(A_i),
        )


def _spy_writers(n, me, mi, with_inequality):
    from sleipnir_tpu.util.spy import Spy  # noqa: PLC0415

    writers = {
        "H": Spy(
            "H.spy", "Hessian", "Decision variables", "Decision variables",
            n, n,
        ),
        "A_e": Spy(
            "A_e.spy", "Equality constraint Jacobian", "Constraints",
            "Decision variables", me, n,
        ),
    }
    if with_inequality:
        writers["A_i"] = Spy(
            "A_i.spy", "Inequality constraint Jacobian", "Constraints",
            "Decision variables", mi, n,
        )
    return writers


class _ShimState:
    """Duck-typed parent state for SQP-entry feasibility restoration."""

    def __init__(self, **kw) -> None:
        self.__dict__.update(kw)


def _sqp_as_ipm_parent(funcs: SQPFunctions, n: int, me: int) -> IPMFunctions:
    return IPMFunctions(
        num_decision_variables=n,
        num_equality_constraints=me,
        num_inequality_constraints=0,
        f=funcs.f,
        g=funcs.g,
        H=lambda x, y, z, p, sc: funcs.H(x, y, p, sc),
        H_c=lambda x, y, z, p, sc: funcs.H_c(x, y, p, sc),
        c_e=funcs.c_e,
        A_e=funcs.A_e,
        c_i=lambda x, p, sc: jnp.zeros(0),
        A_i=lambda x, p, sc: jnp.zeros((0, n)),
    )


def _as_scalar_expr(cost) -> Expr:
    if isinstance(cost, Variable):
        return cost.expr
    if isinstance(cost, VariableMatrix):
        assert cost.shape == (1, 1), "cost must be scalar"
        return ex.reshape(cost.expr, ())
    if isinstance(cost, (int, float, np.integer, np.floating)):
        return ConstExpr(float(cost))
    from sleipnir_tpu.autodiff.variable import VariableBlock  # noqa: PLC0415

    if isinstance(cost, VariableBlock):
        return _as_scalar_expr(cost._as_matrix())
    raise TypeError(f"cannot use {type(cost)} as cost function")
