"""Compile-time-vs-horizon measurement (round-2 review item: time to
first iterate at N=100 must be known and bounded).

Measures, per horizon N: problem build time, solver-bundle preparation
(trace + cache setup), and time-to-first-iterate (one runner call with a
1-iteration cap — includes the XLA compile of the fused solver loop).
Writes a markdown table.

Usage:
    python benchmarks/compile_time.py --samples 25 50 100 200 --out docs/compile_times.md
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def measure(N: int):
    import jax.numpy as jnp

    from sleipnir_tpu.models.cart_pole import cart_pole_problem
    from sleipnir_tpu.optimization.solver.funcs import ScalingArrays
    from sleipnir_tpu.optimization.solver.options import Options

    t0 = time.perf_counter()
    problem, X, U = cart_pole_problem(N=N, total_time=5.0)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    comp, bundle = problem.prepare_ipm(Options())
    t_prepare = time.perf_counter() - t0

    init, runner = bundle[0], bundle[4]
    params = comp["compiled"].gather_params()
    x0 = np.zeros(comp["n"])
    scaling, _ = problem.compute_ipm_scaling(comp, bundle, x0, params)
    sc = ScalingArrays(
        f=jnp.asarray(scaling.f),
        c_e=jnp.asarray(scaling.c_e),
        c_i=jnp.asarray(scaling.c_i),
    )
    t0 = time.perf_counter()
    state = init(
        x0,
        np.ones(comp["mi"]),
        np.zeros(comp["me"]),
        np.ones(comp["mi"]),
        0.1 * scaling.f,
        0,
        params,
        sc,
    )
    import jax

    jax.block_until_ready(state.x)
    t_init = time.perf_counter() - t0

    # First iterate: compiles the fused while-loop runner, then runs one
    # iteration. This is the dominant one-time cost.
    t0 = time.perf_counter()
    out = runner(state, np.int32(1))
    jax.block_until_ready(out.x)
    t_first = time.perf_counter() - t0

    # Steady state per-iteration cost for contrast
    t0 = time.perf_counter()
    out2 = runner(out, np.int32(2))
    jax.block_until_ready(out2.x)
    t_iter = time.perf_counter() - t0
    return t_build, t_prepare, t_init, t_first, t_iter


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--samples", type=int, nargs="+", default=[25, 50, 100, 200]
    )
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    import jax

    rows = [
        "| N | build (s) | prepare (s) | init compile (s) | "
        "first iterate (s) | warm iterate (s) |",
        "|---:|---:|---:|---:|---:|---:|",
    ]
    backend = jax.default_backend()
    for N in args.samples:
        b, p, i, f, it = measure(N)
        print(
            f"N={N}: build {b:.2f}s prepare {p:.2f}s init {i:.2f}s "
            f"first-iterate {f:.2f}s warm-iterate {it:.4f}s",
            flush=True,
        )
        rows.append(
            f"| {N} | {b:.2f} | {p:.2f} | {i:.2f} | {f:.2f} | {it:.4f} |"
        )

    if args.out:
        header = (
            f"# Cart-pole IPM compile time vs horizon ({backend} backend)\n\n"
            "Time-to-first-iterate includes the one-time XLA compile of the\n"
            "fused solver loop; the observed/diagnostics path reuses the same\n"
            "compiled program (solve_driver.py), so no second compile exists.\n\n"
        )
        pathlib.Path(args.out).write_text(header + "\n".join(rows) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
