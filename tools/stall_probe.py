"""Probe the N=5000 stationarity stall: KKT solve accuracy vs refinement.

Drives the cart-pole N=5000 solve to the μ-floor stall (iteration 729,
cached programs), then at that state factors the KKT system and solves
for the TRUE stationarity/feasibility residual with 2/4/8 refinement
passes, reporting each solve's backward residual. Distinguishes "the
dd-chain solve loses accuracy at K=5001 and more refinement fixes it"
from "the dual subproblem is genuinely inconsistent at this point".
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

N = int(os.environ.get("NS_N", "5000"))
MAXIT = int(os.environ.get("NS_MAXIT", "729"))


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
    init, runner = bundle[0], bundle[4]
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
    state = init(
        x0, np.ones(comp["mi"]), np.zeros(comp["me"]),
        np.ones(comp["mi"]), 0.1 * scaling.f, 0, jnp.asarray(params), sc,
    )
    t0 = time.monotonic()
    state = jax.block_until_ready(runner(state, np.int32(MAXIT)))
    print(f"drove to it={int(state.iterations)} "
          f"E0={float(state.E0):.3e} ({time.monotonic()-t0:.0f}s)",
          flush=True)

    F = bind(funcs, jnp.asarray(params), sc, jnp.float64)
    x, s, y, z, mu = state.x, state.s, state.y, state.z, state.mu

    @jax.jit
    def setup(x, s, y, z):
        g = F.g(x)
        d = backend.eval_derivs(F, x, y, z)
        c_e = F.c_e(x)
        c_i = F.c_i(x)
        sigma = z / s
        fac = backend.factor(d, sigma, jnp.asarray(0.0), 1e-10)
        # Stationarity + feasibility rhs, the dual-correcting Newton rhs.
        rhs_top = -(g - backend.AeT(d, y) - backend.AiT(d, z))
        rhs_bot = -c_e
        return d, sigma, fac, rhs_top, rhs_bot

    d, sigma, fac, rhs_top, rhs_bot = jax.block_until_ready(
        setup(x, s, y, z)
    )
    print(f"factor ok={bool(fac.ok)} delta={float(fac.delta):.2e} "
          f"|rhs_top|={float(jnp.max(jnp.abs(rhs_top))):.3e}", flush=True)

    for it in (2, 4, 8):
        def solve_it(d, sigma, fac, rt, rb, _it=it):
            return backend.solve_refined(d, sigma, fac, rt, rb, _it)

        px, py = jax.block_until_ready(
            jax.jit(solve_it)(d, sigma, fac, rhs_top, rhs_bot)
        )

        @jax.jit
        def resid(d, sigma, fac, px, py, rt, rb):
            # K·[px;py] vs rhs using the unstructured definition:
            # top: (H + δI + AᵢᵀΣAᵢ) px − Aₑᵀ py ... easier matrix-free via
            # staged matvec on the staged vectors.
            b, b_b = backend._staged_rhs(rt, rb)
            # Solution staging is the inverse of _unpack_solution: the
            # equality slot holds -p_y.
            u, u_b = backend._staged_rhs(px, -py)
            Ku = backend._kkt_matvec_staged(
                d, sigma, fac.delta, fac.gamma, u
            )
            if backend.nb > 0:
                Ku = Ku + jnp.einsum("bkw,b->kw", fac.col, u_b)
                Ku_b = (
                    jnp.einsum("bkw,kw->b", fac.col, u)
                    + fac.e0 @ u_b
                    + fac.delta * u_b
                )
            else:
                Ku_b = b_b
            r = b - Ku
            r_b = b_b - Ku_b
            den = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)
            return jnp.max(jnp.abs(r)) / den, jnp.max(jnp.abs(r_b))

        rr, rb_ = resid(d, sigma, fac, px, py, rhs_top, rhs_bot)
        print(f"refine={it}: rel staged residual={float(rr):.3e} "
              f"border={float(rb_):.3e} "
              f"|py|={float(jnp.max(jnp.abs(py))):.3e}", flush=True)


if __name__ == "__main__":
    main()
