"""Benchmark: cart-pole swing-up solve time vs the reference baseline.

Headline metric per BASELINE.md: Sleipnir solves cart-pole N=100 in
278.113 ms on a Ryzen 7 7840U (reference
benchmarks/cart-pole-scalability-results-sleipnir.csv:2). This benchmark
solves the identical problem (same cost, constraints, RK4 direct
transcription, tolerance 1e-8) with the TPU-native IPM and reports the
solve wall time (setup/compile excluded, matching the reference harness's
setup/solve split in benchmarks/scalability/util.hpp:51-80).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...}
vs_baseline > 1 means faster than Sleipnir-on-CPU.
"""

import json
import math
import sys
import time

import numpy as np

N = 100
SLEIPNIR_BASELINE_MS = 278.113


def main() -> None:
    import jax

    # Persistent compilation cache: amortizes the (slow) TPU compile across
    # benchmark invocations.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sleipnir_tpu.models.cart_pole import cart_pole_problem
    from sleipnir_tpu import ExitStatus

    t_setup = time.monotonic()
    problem, X, U = cart_pole_problem(N=N, total_time=5.0)

    guess = np.zeros((4, N + 1))
    guess[0] = np.linspace(0.0, 1.0, N + 1)
    guess[1] = np.linspace(0.0, math.pi, N + 1)

    # First solve includes jit compilation (the analog of the reference's
    # autodiff setup, but paid once per problem structure).
    status = problem.solve()
    setup_s = time.monotonic() - t_setup
    assert status == ExitStatus.SUCCESS, status
    final = X.value()[:, N]
    assert np.allclose(final, [1.0, math.pi, 0.0, 0.0], atol=1e-6), final

    # Timed solves from the original initial guess
    times = []
    for _ in range(5):
        X.set_value(guess)
        U.set_value(np.zeros((1, N + 1)))
        t0 = time.monotonic()
        status = problem.solve()
        times.append(time.monotonic() - t0)
        assert status == ExitStatus.SUCCESS, status

    solve_ms = min(times) * 1e3
    print(
        f"setup+compile: {setup_s:.1f}s; solve times: "
        f"{[f'{t * 1e3:.0f}ms' for t in times]}; "
        f"iterations: {int(problem._last_state.iterations)}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"cart_pole_n{N}_solve_time",
                "value": round(solve_ms, 3),
                "unit": "ms",
                "vs_baseline": round(SLEIPNIR_BASELINE_MS / solve_ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
