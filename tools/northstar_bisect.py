"""Bisect the cart-pole N=5000 TPU worker crash by component.

Runs, separately on the chip: (1) c_e evaluation, (2) the banded
derivative probes, (3) assembly + equilibration + the chunked Pallas
factor, (4) a refined solve — each as its own program, printing progress
so the crashing component is identified by the last line reached.
"""
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


def main():
    from sleipnir_tpu.models.cart_pole import cart_pole_problem
    from sleipnir_tpu.optimization.solver.options import Options
    from sleipnir_tpu.optimization.solver.funcs import ScalingArrays, bind

    print(f"backend={jax.default_backend()} N={N}", flush=True)
    problem, X, U = cart_pole_problem(N=N, total_time=5.0)
    comp, bundle = problem.prepare_ipm(Options())
    backend = bundle[-1]
    params = comp["compiled"].gather_params()
    x0 = np.zeros(comp["n"])
    print("computing scaling (host CPU)...", flush=True)
    scaling, _ = problem.compute_ipm_scaling(comp, bundle, x0, params)
    sc = ScalingArrays(
        f=jnp.asarray(scaling.f),
        c_e=jnp.asarray(scaling.c_e),
        c_i=jnp.asarray(scaling.c_i),
    )
    funcs = bundle[3]
    F = bind(funcs, jnp.asarray(params), sc, jnp.float64)
    xj = jnp.asarray(x0)

    t0 = time.monotonic()
    ce = jax.block_until_ready(jax.jit(F.c_e)(xj))
    print(f"1. c_e eval OK ({time.monotonic()-t0:.0f}s, "
          f"|c_e|={float(jnp.max(jnp.abs(ce))):.2e})", flush=True)

    y0 = jnp.zeros(comp["me"])
    z0 = jnp.ones(comp["mi"])
    t0 = time.monotonic()
    derivs = jax.block_until_ready(
        jax.jit(lambda x, y, z: backend.eval_derivs(F, x, y, z))(
            xj, y0, z0
        )
    )
    print(f"2. banded derivative probes OK ({time.monotonic()-t0:.0f}s)",
          flush=True)

    sigma = z0 / jnp.ones(comp["mi"])
    t0 = time.monotonic()
    fac = jax.block_until_ready(
        jax.jit(
            lambda d, s: backend.factor(
                d, s, jnp.asarray(0.0), 1e-10
            )
        )(derivs, sigma)
    )
    print(f"3. assemble+equilibrate+chunked factor OK "
          f"({time.monotonic()-t0:.0f}s, ok={bool(fac.ok)} "
          f"delta={float(fac.delta):.1e})", flush=True)

    rhs_t = jnp.asarray(np.random.default_rng(0).standard_normal(comp["n"]))
    rhs_b = jnp.zeros(comp["me"])
    t0 = time.monotonic()
    px, py = jax.block_until_ready(
        jax.jit(
            lambda d, s, f, rt, rb: backend.solve_refined(d, s, f, rt, rb)
        )(derivs, sigma, fac, rhs_t, rhs_b)
    )
    print(f"4. refined solve OK ({time.monotonic()-t0:.0f}s, "
          f"|px|={float(jnp.max(jnp.abs(px))):.2e})", flush=True)


if __name__ == "__main__":
    main()
