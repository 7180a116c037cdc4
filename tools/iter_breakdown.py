"""Warm per-component timing of one IPM iteration on the current device.

Times, each as its own jitted program (best of NREP after warmup):
eval_derivs (colored probes), factor (ladder), solve_refined, the
cost/constraint evaluations, and the full step — the difference is the
XLA glue (assembly outside factor, KKT error, line search, mu update).

Env: BK_N horizon (default 100), BK_REP repeats (default 20).
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

N = int(os.environ.get("BK_N", "100"))
REP = int(os.environ.get("BK_REP", "20"))


def timeit(label, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(REP):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best * 1e3:8.2f} ms", flush=True)
    return out


def main():
    from sleipnir_tpu.autodiff import expression as ex
    from sleipnir_tpu.models.cart_pole import cart_pole_problem
    from sleipnir_tpu.optimization.solver.options import Options
    from sleipnir_tpu.optimization.solver.funcs import ScalingArrays, bind

    print(f"backend={jax.default_backend()} N={N}", flush=True)
    problem, X, U = cart_pole_problem(N=N, total_time=5.0)
    guess = np.zeros((4, N + 1))
    guess[0] = np.linspace(0.0, 1.0, N + 1)
    guess[1] = np.linspace(0.0, math.pi, N + 1)
    X.set_value(guess)
    comp, bundle = problem.prepare_ipm(Options())
    init, step = bundle[0], bundle[1]
    backend = bundle[-1]
    funcs = bundle[3]
    params = comp["compiled"].gather_params()
    x0 = ex._registry.get(comp["all_ids"]).astype(np.float64)
    scaling, _ = problem.compute_ipm_scaling(comp, bundle, x0, params)
    sc = ScalingArrays(
        f=jnp.asarray(scaling.f),
        c_e=jnp.asarray(scaling.c_e),
        c_i=jnp.asarray(scaling.c_i),
    )
    s0 = np.ones(comp["mi"])
    y0 = np.zeros(comp["me"])
    z0 = np.ones(comp["mi"])
    pj = jnp.asarray(params)
    state = jax.block_until_ready(
        init(x0, s0, y0, z0, 0.1 * scaling.f, 0, pj, sc)
    )
    # Advance a few iterations so the timed state is mid-solve (heavy
    # regularization phase), not the pristine first iterate.
    step_c = jax.jit(step)
    for _ in range(10):
        state = step_c(state)
    state = jax.block_until_ready(state)
    print(f"state at iter {int(state.iterations)}: "
          f"E0={float(state.E0):.2e} delta={float(state.delta):.1e}",
          flush=True)

    F = bind(funcs, pj, sc, jnp.float64)
    xj, yj, zj = state.x, state.y, state.z
    sj = state.s

    timeit("full step", step_c, state)
    derivs = timeit(
        "eval_derivs (probes)",
        jax.jit(lambda x, y, z: backend.eval_derivs(F, x, y, z)),
        xj, yj, zj,
    )
    sigma = zj / sj
    fac = timeit(
        "factor (ladder)",
        jax.jit(
            lambda d, s_, pd: backend.factor(d, s_, pd, 1e-10)
        ),
        derivs, sigma, state.prev_delta,
    )
    rhs_t = jnp.asarray(
        np.random.default_rng(0).standard_normal(comp["n"])
    )
    rhs_b = jnp.zeros(comp["me"])
    timeit(
        "solve_refined",
        jax.jit(
            lambda d, s_, f_, rt, rb: backend.solve_refined(
                d, s_, f_, rt, rb
            )
        ),
        derivs, sigma, fac, rhs_t, rhs_b,
    )
    timeit("c_e + c_i + f + g", jax.jit(
        lambda x: (F.c_e(x), F.c_i(x), F.f(x), F.g(x))
    ), xj)


if __name__ == "__main__":
    main()
