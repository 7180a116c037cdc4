"""Measure f64 trig accuracy of XLA's sin/cos vs ops/accurate_math on the
current backend, against mpmath-free double-double reference values.

This documents the hardware behavior that motivated
sleipnir_tpu/ops/accurate_math.py (XLA:TPU's emulated-f64 sin/cos can
drop to ~1e-8 relative accuracy in some fusion contexts, capping the
attainable KKT error). Writes a markdown artifact.

Usage: python benchmarks/tpu_trig_accuracy.py [--out docs/tpu_trig_accuracy.md]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from sleipnir_tpu.ops import accurate_math

    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    xs = np.concatenate(
        [
            rng.uniform(-2 * np.pi, 2 * np.pi, 4096),
            rng.uniform(-100.0, 100.0, 4096),
        ]
    )
    # Reference values from numpy (glibc, correctly-rounded to ~0.5 ulp)
    ref_sin = np.sin(xs)
    ref_cos = np.cos(xs)

    # Evaluate inside a jitted derivative-style fusion, the context where
    # the TPU accuracy drop was observed (sin/cos pairs inside fusions).
    @jax.jit
    def pair_xla(v):
        return jnp.sin(v), jnp.cos(v)

    @jax.jit
    def pair_acc(v):
        return accurate_math.sin(v), accurate_math.cos(v)

    xj = jnp.asarray(xs)
    xla_sin, xla_cos = (np.asarray(a) for a in pair_xla(xj))
    acc_sin, acc_cos = (np.asarray(a) for a in pair_acc(xj))

    def report(name, got, ref):
        err = np.abs(got - ref)
        rel = err / np.maximum(np.abs(ref), 1e-300)
        return (
            f"| {name} | {np.max(err):.3e} | {np.max(rel):.3e} |"
        )

    rows = [
        f"# f64 trig accuracy on the `{backend}` backend",
        "",
        "Max error over 8192 points in [-2π, 2π] ∪ [-100, 100], vs numpy",
        "(correctly rounded libm).",
        "",
        "| implementation | max abs err | max rel err |",
        "|---|---:|---:|",
        report("xla sin", xla_sin, ref_sin),
        report("xla cos", xla_cos, ref_cos),
        report("accurate_math sin", acc_sin, ref_sin),
        report("accurate_math cos", acc_cos, ref_cos),
    ]
    text = "\n".join(rows) + "\n"
    print(text)
    if args.out:
        pathlib.Path(args.out).write_text(text)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
