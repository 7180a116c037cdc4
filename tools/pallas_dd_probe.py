"""Isolate which dd primitive loses precision inside Mosaic on the TPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("TRACE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sleipnir_tpu.ops import dd


def run_kernel(fn, *arrays):
    """Run fn(*values) -> tuple of values inside a trivial pallas kernel."""
    n_out = len(fn(*[jnp.zeros_like(a) for a in arrays]))

    def kernel(*refs):
        ins = refs[: len(arrays)]
        outs = refs[len(arrays):]
        res = fn(*[r[:] for r in ins])
        for o, r in zip(outs, res):
            o[:] = r

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct(arrays[0].shape, jnp.float32)
                for _ in range(n_out)
            ),
            in_specs=[spec] * len(arrays),
            out_specs=(spec,) * n_out,
            interpret=jax.default_backend() != "tpu",
        )(*arrays)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    shape = (8, 128)
    a64 = rng.standard_normal(shape)
    b64 = rng.standard_normal(shape) * 10.0 ** rng.uniform(-3, 3, shape)
    ah, al = dd.from_f64(jnp.asarray(a64))
    bh, bl = dd.from_f64(jnp.asarray(b64))

    # 1. two_sum exactness: s + err must equal a + b in f64
    s, e = run_kernel(lambda x, y: dd.two_sum(x, y), ah, bh)
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    ref = np.asarray(ah, np.float64) + np.asarray(bh, np.float64)
    print("two_sum max err:", np.abs(lhs - ref).max())

    # 2. two_prod exactness
    p, e = run_kernel(lambda x, y: dd.two_prod(x, y), ah, bh)
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    ref = np.asarray(ah, np.float64) * np.asarray(bh, np.float64)
    rel = np.abs(lhs - ref) / np.maximum(np.abs(ref), 1e-30)
    print("two_prod max rel err:", rel.max())

    # 3. full dd ops
    for name, f in [("add2", dd.add2), ("mul2", dd.mul2), ("div2", dd.div2)]:
        h, l = run_kernel(lambda xh, xl, yh, yl, f=f: f(xh, xl, yh, yl),
                          ah, al, bh, bl)
        out = np.asarray(h, np.float64) + np.asarray(l, np.float64)
        ref = {
            "add2": a64 + b64, "mul2": a64 * b64, "div2": a64 / b64
        }[name]
        rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-30)
        print(f"{name} max rel err:", rel.max())

    # 4. one-hot dot exactness
    w = 13
    P = np.zeros((w, w), np.float32)
    perm = rng.permutation(w)
    P[np.arange(w), perm] = 1.0
    M64 = rng.standard_normal((w, w))
    Mh, Ml = dd.from_f64(jnp.asarray(M64))

    def onehot(Pm, X):
        return (jnp.dot(Pm, X, preferred_element_type=jnp.float32),)

    (out,) = run_kernel(onehot, jnp.asarray(P), Mh)
    exact = P @ np.asarray(Mh, np.float64)
    print("one-hot dot max err:", np.abs(np.asarray(out, np.float64) - exact).max())


if __name__ == "__main__":
    main()
