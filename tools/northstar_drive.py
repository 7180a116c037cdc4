"""Drive the cart-pole N=5000 TPU solve in small host-side chunks.

The full solve crashes the TPU worker ("kernel fault") somewhere past
iteration 12 (tools/northstar_step.py runs 12 iterations clean), so the
fault is data-dependent. This driver runs the SAME compiled chunk runner
with cap increments of CHUNK, printing the solver state after every
chunk — the last printed line brackets the crashing iteration.

Env: NS_N (default 5000), NS_CHUNK (default 8), NS_MAXIT (default 600).
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
CHUNK = int(os.environ.get("NS_CHUNK", "8"))
MAXIT = int(os.environ.get("NS_MAXIT", "600"))


def main():
    from sleipnir_tpu.autodiff import expression as ex
    from sleipnir_tpu.models.cart_pole import cart_pole_problem
    from sleipnir_tpu.optimization.solver.options import Options
    from sleipnir_tpu.optimization.solver.funcs import ScalingArrays
    from sleipnir_tpu.optimization.solver import status_codes

    print(f"backend={jax.default_backend()} N={N} chunk={CHUNK}", flush=True)
    problem, X, U = cart_pole_problem(N=N, total_time=5.0)
    guess = np.zeros((4, N + 1))
    guess[0] = np.linspace(0.0, 1.0, N + 1)
    guess[1] = np.linspace(0.0, math.pi, N + 1)
    X.set_value(guess)
    comp, bundle = problem.prepare_ipm(Options())
    init, runner = bundle[0], bundle[4]
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
    state = jax.block_until_ready(
        init(x0, s0, y0, z0, 0.1 * scaling.f, 0, jnp.asarray(params), sc)
    )
    print("init OK", flush=True)
    t_start = time.monotonic()
    while True:
        it = int(state.iterations)
        if it >= MAXIT:
            print("max iterations reached", flush=True)
            break
        t0 = time.monotonic()
        state = jax.block_until_ready(
            runner(state, np.int32(min(it + CHUNK, MAXIT)))
        )
        dt = time.monotonic() - t0
        st = int(state.status)
        print(
            f"it={int(state.iterations):4d} status={st} "
            f"E0={float(state.E0):.3e} mu={float(state.mu):.2e} "
            f"delta={float(state.delta):.1e} alpha={float(state.alpha):.2e} "
            f"({dt:.1f}s)",
            flush=True,
        )
        if st != status_codes.RUNNING:
            break
    print(f"total {time.monotonic() - t_start:.0f}s", flush=True)

    # Decompose the final unscaled KKT error into its components
    # (mirrors util/kkt_error.unscaled_kkt_error_ipm_products).
    from sleipnir_tpu.optimization.solver.funcs import bind
    from sleipnir_tpu.optimization.solver.util.kkt_error import S_MAX

    funcs = bundle[3]
    backend = bundle[-1]
    F = bind(funcs, jnp.asarray(params), sc, jnp.float64)

    @jax.jit
    def components(stt):
        x, s, y, z, mu = stt.x, stt.s, stt.y, stt.z, stt.mu
        g = F.g(x)
        d = backend.eval_derivs(F, x, y, z)
        AeT_y = backend.AeT(d, y)
        AiT_z = backend.AiT(d, z)
        c_e = F.c_e(x)
        c_i = F.c_i(x)
        inv_d_f = 1.0 / sc.f
        grad = (g - AeT_y - AiT_z) * inv_d_f
        c_e_u = c_e / sc.c_e
        c_i_u = c_i / sc.c_i
        s_u = s / sc.c_i
        y_u = sc.c_e * y * inv_d_f
        z_u = sc.c_i * z * inv_d_f
        m = c_e.shape[0] + c_i.shape[0]
        one = lambda v: jnp.sum(jnp.abs(v))  # noqa: E731
        inf = lambda v: jnp.max(jnp.abs(v))  # noqa: E731
        s_d = jnp.maximum(S_MAX, (one(y_u) + one(z_u)) / m) / S_MAX
        s_c = jnp.maximum(S_MAX, one(z_u) / c_i.shape[0]) / S_MAX
        return (
            inf(grad) / s_d,
            inf(s_u * z_u - mu * inv_d_f) / s_c,
            inf(c_e_u),
            inf(c_i_u - s_u),
            s_d,
            inf(y_u),
        )

    stat, comp, ceq, cin, s_d, y_inf = (
        float(v) for v in components(state)
    )
    print(
        f"E0 components: stationarity/s_d={stat:.3e} "
        f"complementarity={comp:.3e} |c_e|={ceq:.3e} |c_i-s|={cin:.3e} "
        f"(s_d={s_d:.3e}, |y|inf={y_inf:.3e})",
        flush=True,
    )


if __name__ == "__main__":
    main()
