"""Round-5 TPU scalability runs through the Pallas path.

Records warm solve times for flywheel N=1000/5000 and cart-pole
N=250/1000 (the round-4 worker-crash case) on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def run(name, build, n_warm=3):
    t0 = time.monotonic()
    problem, X, U, reset = build()
    st = problem.solve()
    setup = time.monotonic() - t0
    iters = int(problem._last_state.iterations)
    print(f"{name}: first={st} {setup:.0f}s iters={iters}", flush=True)
    if str(st) != "success":
        return
    times = []
    for _ in range(n_warm):
        reset()
        t0 = time.monotonic()
        st = problem.solve()
        times.append(time.monotonic() - t0)
    iters = int(problem._last_state.iterations)
    print(
        f"{name}: warm={min(times) * 1e3:.0f}ms iters={iters} "
        f"({[f'{t * 1e3:.0f}' for t in times]})",
        flush=True,
    )


def flywheel(N):
    def build():
        from sleipnir_tpu.models.flywheel import flywheel_problem

        problem, X, U = flywheel_problem(N=N, total_time=5.0)

        def reset():
            X.set_value(np.zeros((1, N + 1)))
            U.set_value(np.zeros((1, N + 1)))

        return problem, X, U, reset

    return build


def cart_pole(N):
    def build():
        import math

        from sleipnir_tpu.models.cart_pole import cart_pole_problem

        problem, X, U = cart_pole_problem(N=N, total_time=5.0)
        guess = np.zeros((4, N + 1))
        guess[0] = np.linspace(0.0, 1.0, N + 1)
        guess[1] = np.linspace(0.0, math.pi, N + 1)

        def reset():
            X.set_value(guess)
            U.set_value(np.zeros((1, N + 1)))

        return problem, X, U, reset

    return build


def north_star():
    """Cart-pole N=5000 — the BASELINE.json north-star configuration."""
    run("cart-pole N=5000", cart_pole(5000), n_warm=1)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "flywheel"):
        run("flywheel N=1000", flywheel(1000))
        run("flywheel N=5000", flywheel(5000))
    if which in ("all", "cartpole"):
        run("cart-pole N=250", cart_pole(250))
        run("cart-pole N=1000", cart_pole(1000))
    if which == "northstar":
        north_star()


if __name__ == "__main__":
    main()
