"""Finer-grained bisect of the cart-pole N=5000 TPU worker crash.

tools/northstar_bisect.py showed every solver *component* (c_e, probes,
assemble+factor, refined solve) runs clean on the chip at N=5000; only
the combined solve crashed the worker. This tool splits the remaining
gap into:

  5. compile jit(step)            — is it a compile-time worker crash?
  6. execute one step             — or a run-time crash in the full step?
  7. runner chunk (while_loop x4) — or only under the while_loop wrapper?

Set NS_N to change the horizon (default 5000).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import math

import numpy as np
import jax.numpy as jnp

N = int(os.environ.get("NS_N", "5000"))


def main():
    from sleipnir_tpu.models.cart_pole import cart_pole_problem
    from sleipnir_tpu.optimization.solver.options import Options
    from sleipnir_tpu.optimization.solver.funcs import ScalingArrays
    from sleipnir_tpu.optimization.solver.solve_driver import make_runner

    print(f"backend={jax.default_backend()} N={N}", flush=True)
    problem, X, U = cart_pole_problem(N=N, total_time=5.0)
    guess = np.zeros((4, N + 1))
    guess[0] = np.linspace(0.0, 1.0, N + 1)
    guess[1] = np.linspace(0.0, math.pi, N + 1)
    X.set_value(guess)
    comp, bundle = problem.prepare_ipm(Options())
    init, step = bundle[0], bundle[1]
    backend = bundle[-1]
    params = comp["compiled"].gather_params()
    from sleipnir_tpu.autodiff import expression as ex

    x0 = ex._registry.get(comp["all_ids"]).astype(np.float64)
    print("computing scaling (host CPU)...", flush=True)
    scaling, _ = problem.compute_ipm_scaling(comp, bundle, x0, params)
    sc = ScalingArrays(
        f=jnp.asarray(scaling.f),
        c_e=jnp.asarray(scaling.c_e),
        c_i=jnp.asarray(scaling.c_i),
    )
    s0 = np.ones(comp["mi"])
    y0 = np.zeros(comp["me"])
    z0 = np.ones(comp["mi"])
    mu0 = 0.1 * scaling.f
    pj = jnp.asarray(params)
    state = jax.block_until_ready(init(x0, s0, y0, z0, mu0, 0, pj, sc))
    print("init OK", flush=True)

    t0 = time.monotonic()
    step_c = jax.jit(step).lower(state).compile()
    print(f"5. jit(step) COMPILE OK ({time.monotonic()-t0:.0f}s)",
          flush=True)

    t0 = time.monotonic()
    st1 = jax.block_until_ready(step_c(state))
    print(f"6. one step EXECUTE OK ({time.monotonic()-t0:.1f}s, "
          f"E0={float(st1.E0):.3e} iters={int(st1.iterations)})",
          flush=True)

    runner = make_runner(step)
    t0 = time.monotonic()
    st4 = jax.block_until_ready(runner(state, np.int32(4)))
    print(f"7. runner chunk(4) OK ({time.monotonic()-t0:.0f}s, "
          f"iters={int(st4.iterations)} E0={float(st4.E0):.3e})",
          flush=True)

    # Timing: 8 more iterations warm through the runner.
    t0 = time.monotonic()
    st12 = jax.block_until_ready(runner(st4, np.int32(12)))
    dt = time.monotonic() - t0
    print(f"8. runner chunk(8 more) OK ({dt:.1f}s = "
          f"{dt / 8 * 1e3:.0f} ms/iter, iters={int(st12.iterations)})",
          flush=True)


if __name__ == "__main__":
    main()
