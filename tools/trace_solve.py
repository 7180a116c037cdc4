"""Per-iteration solver trace for CPU-vs-TPU divergence hunting.

Runs the flagship cart-pole swing-up problem in observed mode and records
one CSV row per IPM iteration: the KKT error, barrier parameter,
regularization, step sizes, and dual norms. Diffing the CPU and TPU traces
locates the first iteration where the backends split (VERDICT r3 task 1).

Usage:
    TRACE_CPU=1 python tools/trace_solve.py /tmp/trace_cpu.csv
    python tools/trace_solve.py /tmp/trace_tpu.csv          # default device
(Shell JAX_PLATFORMS is overridden by the axon sitecustomize; TRACE_CPU
switches the platform after import, which is the override that works.)
Env:
    TRACE_N       horizon length (default 100)
    TRACE_MAXIT   max iterations (default 5000)
"""

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIELDS = [
    "iter", "E0", "f", "mu", "delta", "gamma", "alpha", "alpha_max",
    "alpha_z", "p_pr", "p_du", "y_inf", "z_inf", "theta", "ce_norm1",
    "min_s", "min_ci", "status",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "trace.csv"
    N = int(os.environ.get("TRACE_N", "100"))
    max_it = int(os.environ.get("TRACE_MAXIT", "5000"))

    import jax

    if os.environ.get("TRACE_CPU"):
        # The environment's sitecustomize pre-imports JAX with the axon TPU
        # platform forced; JAX_PLATFORMS from the shell is overridden.
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sleipnir_tpu.models.cart_pole import cart_pole_problem
    from sleipnir_tpu.optimization.problem import Problem

    rows = []

    def recorder(kind):
        def diag(prev, after):
            s_v = np.asarray(after.s)
            ci_v = np.asarray(after.c_i)
            ce_v = np.asarray(after.c_e)
            rows.append({
                "iter": int(prev.iterations),
                "E0": float(after.E0),
                "f": float(after.f),
                "mu": float(after.mu),
                "delta": float(after.delta),
                "gamma": float(after.gamma),
                "alpha": float(after.alpha),
                "alpha_max": float(after.alpha_max),
                "alpha_z": float(after.alpha_z),
                "p_pr": float(after.p_pr_inf),
                "p_du": float(after.p_du_inf),
                "y_inf": float(np.max(np.abs(np.asarray(after.y)), initial=0.0)),
                "z_inf": float(np.max(np.abs(np.asarray(after.z)), initial=0.0)),
                "theta": float(np.sum(np.abs(ce_v)) + np.sum(np.abs(ci_v - s_v))),
                "ce_norm1": float(np.sum(np.abs(ce_v))),
                "min_s": float(np.min(s_v)) if s_v.size else 0.0,
                "min_ci": float(np.min(ci_v)) if ci_v.size else 0.0,
                "status": int(after.status),
            })
        return diag

    Problem._diagnostics_fn = staticmethod(recorder)

    problem, X, U = cart_pole_problem(N=N, total_time=5.0)
    import time
    t0 = time.monotonic()
    status = problem.solve(diagnostics=True, max_iterations=max_it)
    wall = time.monotonic() - t0

    with open(out_path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)
    print(
        f"status={status} iterations={len(rows)} wall={wall:.1f}s "
        f"backend={jax.default_backend()} -> {out_path}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
