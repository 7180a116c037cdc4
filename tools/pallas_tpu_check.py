"""On-TPU validation + timing of the Pallas dd banded kernels.

Checks (1) Mosaic compiles the kernels, (2) dd numerics survive the real
compiler (no fma/reassociation breakage of the error-free transforms),
(3) wall time per factor+solve vs the XLA paths.
"""
import os
import sys
import time

sys.setrecursionlimit(100000)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("TRACE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from sleipnir_tpu.ops import pallas_banded as pb


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.monotonic()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.monotonic() - t0) / reps)
    return best * 1e3, out


def main():
    print(f"backend: {jax.default_backend()}")
    import os as _os
    cfgs = [(101, 13), (1001, 3), (5001, 3), (1001, 9)]
    if _os.environ.get('BIG'):
        cfgs = [(5001, 13)]
    for K, w in cfgs:
        rng = np.random.default_rng(42)
        D = rng.standard_normal((K, w, w))
        D = D + np.swapaxes(D, 1, 2) + 10 * np.eye(w)
        D[::3] -= 18 * np.eye(w)
        E = rng.standard_normal((K - 1, w, w))
        b = rng.standard_normal((K, w))
        Dj, Ej, bj = jnp.asarray(D), jnp.asarray(E), jnp.asarray(b)

        t0 = time.monotonic()
        fac_fn = jax.jit(pb.pallas_banded_factor)
        fac = jax.block_until_ready(fac_fn(Dj, Ej))
        compile_s = time.monotonic() - t0
        ms_f, fac = bench(fac_fn, Dj, Ej)
        solve_fn = jax.jit(pb.pallas_banded_solve)
        ms_s, x = bench(solve_fn, fac, bj)
        x = np.asarray(x)
        # residual
        r = np.einsum("kab,kb->ka", D, x)
        r[1:] += np.einsum("kab,kb->ka", E, x[:-1])
        r[:-1] += np.einsum("kba,kb->ka", E, x[1:])
        rel = np.abs(r - b).max() / np.abs(b).max()
        d = np.asarray(pb.pallas_pivots(fac))
        print(
            f"K={K} w={w}: factor {ms_f:8.2f} ms, solve {ms_s:7.2f} ms, "
            f"resid {rel:.2e}, pivots +{int((d > 1e-12).sum())}/-"
            f"{int((d < -1e-12).sum())} (compile {compile_s:.0f}s)"
        )


if __name__ == "__main__":
    main()
