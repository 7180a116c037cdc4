"""Scalability benchmark harness (reference benchmarks/scalability/
{flywheel,cart_pole}/main.cpp + util.hpp:51-80).

Measures setup time and solve time separately across horizon lengths and
writes the reference's CSV schema (`Samples,Setup time (ms),Solve time
(ms)`) so results are directly comparable against the committed Sleipnir /
CasADi CSVs (reference benchmarks/*.csv, reproduced in BASELINE.md).

Setup = problem construction + compilation (the analog of the reference's
autodiff setup, paid once per problem shape). Solve = wall time of a solve
from the benchmark initial guess with everything warm.

Usage:
    python benchmarks/scalability.py flywheel --samples 100 200 500 1000
    python benchmarks/scalability.py cart_pole --samples 100 200 300
"""

from __future__ import annotations

import argparse
import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def bench_flywheel(N: int):
    from sleipnir_tpu import ExitStatus
    from sleipnir_tpu.models.flywheel import flywheel_problem

    t0 = time.perf_counter()
    problem, X, U = flywheel_problem(N=N, total_time=5.0)
    status = problem.solve()
    setup_s = time.perf_counter() - t0
    assert status == ExitStatus.SUCCESS, status

    times = []
    for _ in range(3):
        X.set_value(np.zeros((1, N + 1)))
        U.set_value(np.zeros((1, N + 1)))
        t0 = time.perf_counter()
        status = problem.solve()
        times.append(time.perf_counter() - t0)
        assert status == ExitStatus.SUCCESS, status
    return setup_s * 1e3, min(times) * 1e3


def bench_cart_pole(N: int):
    from sleipnir_tpu import ExitStatus
    from sleipnir_tpu.models.cart_pole import cart_pole_problem

    t0 = time.perf_counter()
    problem, X, U = cart_pole_problem(N=N, total_time=5.0)
    status = problem.solve()
    setup_s = time.perf_counter() - t0
    assert status == ExitStatus.SUCCESS, status

    guess = np.zeros((4, N + 1))
    guess[0] = np.linspace(0.0, 1.0, N + 1)
    guess[1] = np.linspace(0.0, math.pi, N + 1)

    times = []
    for _ in range(3):
        X.set_value(guess)
        U.set_value(np.zeros((1, N + 1)))
        t0 = time.perf_counter()
        status = problem.solve()
        times.append(time.perf_counter() - t0)
        assert status == ExitStatus.SUCCESS, status
    return setup_s * 1e3, min(times) * 1e3


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("problem", choices=["flywheel", "cart_pole"])
    parser.add_argument(
        "--samples", type=int, nargs="+",
        default=[100, 200, 300, 400, 500],
    )
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    bench = bench_flywheel if args.problem == "flywheel" else bench_cart_pole
    out = args.out or (
        f"{args.problem.replace('_', '-')}-scalability-results-"
        "sleipnir-tpu.csv"
    )

    rows = ["Samples,Setup time (ms),Solve time (ms)"]
    for N in args.samples:
        setup_ms, solve_ms = bench(N)
        print(f"N={N}: setup {setup_ms:.1f} ms, solve {solve_ms:.1f} ms",
              flush=True)
        rows.append(f"{N},{setup_ms:.3f},{solve_ms:.3f}")

    pathlib.Path(out).write_text("\n".join(rows) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
